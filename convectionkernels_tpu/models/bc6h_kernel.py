"""Pallas TPU mega-kernel for the BC6H partitioned-group meta rounds.

The XLA graph path in bc6h.py evaluates each partitioned precision
group's 12 meta rounds as hundreds of fused ops over HBM-resident
[Q, R, 16, N] grids; the op-level profile (tools/bc7_tail_analysis.py
bc6hu) shows ~39 of its 45.7 ms/chunk in the six partitioned groups,
dominated by the R-axis select reduce (8.9 ms), slow-error +
subset-error accumulation (~8.3 ms) and pure copy/slice data movement
(~9.5 ms). This kernel runs one group's ENTIRE meta-round chain —
tweak-seeded endpoints, quantize/unquantize, HDR interpolant
construction, index selection (slow and fast paths), the conditional
inversion with the partition's fixup pixel, endpoint dedup across
rounds, the slow 2CL error, and the least-squares refinement — inside
VMEM for a tile of NB blocks, with the (partition, subset) axis Q = 64
on sublanes and blocks on lanes.

The meta0 x meta1 x mode combine stays in the XLA graph (bc6h.pack):
it is cheap (~2.5 ms total) and already restructured for the TPU; the
kernel only changes WHERE the per-round candidate data is produced.
Winner indexes leave the kernel packed 3 bits/pixel into two i32 words
per round, shrinking both the kernel's output traffic and the
combine's winner-index gather.

Bit-exactness: the kernel body calls the SAME helpers as the graph
path (bc6h._quantize_element/_unquantize_element/_unscale_hdr_*,
lanes.twoscl_half_to_float, ops.refine.EndpointRefiner,
ops.exact_math.exact_divide), and replaces each one-pass lexicographic
reduce with the sequential strict-less scan it is defined to equal
(first-occurrence ties). tests/test_bc6h_kernel.py pins kernel-vs-graph
byte equality; the oracle goldens cover the kernel path whenever the
suite runs on TPU.

Reference: /root/reference/ConvectionKernels_BC67.cpp:2776-2911 (the
per-group tweak x refine chain; partitions are the p loop at :2786).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import lanes
from ..ops.exact_math import exact_divide
from ..ops.refine import EndpointRefiner

# Blocks per grid step (lane tile). Q = 64 (32 partitions x 2 subsets,
# subset-major) rides the sublanes, so every candidate array is an
# exact [64, NB] VREG tiling with zero padding.
NB = 128
Q = 64


def _q_mask(flags_by_q, qi):
    """[Q, 1] bool column from a static per-q bit list, synthesized
    in-kernel (Pallas forbids captured array constants): the Q bits ride
    in four 16-bit immediates tested against the sublane iota."""
    bits = 0
    for q, f in enumerate(flags_by_q):
        if f:
            bits |= 1 << q
    pieces = [(bits >> (16 * j)) & 0xFFFF for j in range(4)]
    out = None
    for j in range(4):
        in_piece = (qi >= 16 * j) & (qi < 16 * (j + 1))
        sh = jnp.where(in_piece, qi - 16 * j, 0)  # keep shifts in-range
        hit = (((np.int32(pieces[j]) >> sh) & 1) == 1) & in_piece
        out = hit if out is None else out | hit
    return out


def _group_kernel_body(aprec, is_signed, fast_indexing, uniform, cw, cw_sq,
                       active_rounds, num_refine_rounds, index_range,
                       sub_mask_sm, fixups_sm,
                       pix_ref, b0_ref, b1_ref, b2_ref,
                       o0_ref, o1_ref, o2_ref,
                       err_out, valid_out, eps_out, idx_out):
    """One NB-block tile: all active meta rounds for one precision group.

    active_rounds: tuple of (meta_round_id, tweak, refine_pass, is_last
    refine of its tweak) in visitation order.
    sub_mask_sm: static np bool [Q, 16] subset membership (subset-major).
    fixups_sm: static np int [Q] fixup pixel per q row.
    """
    from .bc6h import (_quantize_element, _unquantize_element,
                       _unscale_hdr_signed, _unscale_hdr_unsigned)
    from ..ops.index_select import WEIGHT_RECIPROCALS

    pix = pix_ref[:]                       # [48, NB] i32 (px*3 + ch)
    base = [b0_ref[:], b1_ref[:], b2_ref[:]]    # [Q, NB] f32
    offset = [o0_ref[:], o1_ref[:], o2_ref[:]]

    # per-pixel rows [1, NB] (broadcast against [Q, NB])
    p2cl, f2cl, flinw, f2cl_unw, pw = [], [], [], [], []
    for px in range(16):
        ri, rf, rl, ru, rp = [], [], [], [], []
        for ch in range(3):
            v = pix[px * 3 + ch:px * 3 + ch + 1, :]
            tw = lanes.twoscl_half_to_float(v)
            ri.append(v)
            rf.append(lanes.to_float(v))
            rl.append(tw * cw[ch])
            ru.append(tw)
            rp.append(lanes.to_float(v) * cw[ch])
        p2cl.append(ri)
        f2cl.append(rf)
        flinw.append(rl)
        f2cl_unw.append(ru)
        pw.append(rp)

    qi = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0)
    member = [_q_mask(sub_mask_sm[:, px], qi) for px in range(16)]
    half_range_m1 = index_range // 2 - 1
    lo = np.float32(-31743.0) if is_signed else np.float32(0.0)
    recip = WEIGHT_RECIPROCALS[index_range]
    max_value = np.float32(index_range - 1)

    zero_f = jnp.zeros((Q, NB), dtype=jnp.float32)

    prev_eps = []       # per emitted round: list of 6 [Q, NB] i32
    refiner = None

    for pos, (meta_round, tweak, refine_pass, _) in enumerate(active_rounds):
        if refine_pass == 0:
            f0, f1 = lanes.compute_tweak_factors(tweak, index_range)
            eps_cs = [[], []]
            for ch in range(3):
                eps_cs[0].append(lanes.round_and_convert_to_int_nearest(
                    lanes.clamp(base[ch] + offset[ch] * f0, lo, 31743.0)))
                eps_cs[1].append(lanes.round_and_convert_to_int_nearest(
                    lanes.clamp(base[ch] + offset[ch] * f1, lo, 31743.0)))
        else:
            r0, r1 = refiner.get_refined_endpoints_hdr(is_signed,
                                                       stacked=False)
            eps_cs = [r0, r1]

        refiner = EndpointRefiner(zero_f, 3, index_range, cw)

        # quantize + unquantize all 6 endpoint elements (same helpers as
        # the graph path's stacked form, applied per element)
        q_els = [[_quantize_element(eps_cs[e][ch], aprec, is_signed)
                  for ch in range(3)] for e in range(2)]
        unq = [[None] * 3 for _ in range(2)]
        fin = [[None] * 3 for _ in range(2)]
        for e in range(2):
            for ch in range(3):
                unq[e][ch], fin[e][ch] = _unquantize_element(
                    q_els[e][ch], aprec, is_signed)

        if fast_indexing:
            # base-class Init with colorSpaceEndpoints = finished EPs
            # (IndexSelectorHDR.h:15-32 via bc6h._HDRIndexSelector)
            origin = [lanes.to_float(fin[0][ch]) for ch in range(3)]
            diff_w = [(lanes.to_float(fin[1][ch]) - origin[ch]) * cw[ch]
                      for ch in range(3)]
            len_sq = diff_w[0] * diff_w[0]
            for ch in range(1, 3):
                len_sq = len_sq + diff_w[ch] * diff_w[ch]
            len_sq = lanes.make_safe_denominator(len_sq)
            mv = exact_divide(jnp.full_like(len_sq, max_value), len_sq)
            axis = [diff_w[ch] * cw[ch] * mv for ch in range(3)]
        else:
            # interpolants per index r: the per-r weight is a static int,
            # so construction is pure elementwise int math + TwosCL
            # (IndexSelectorHDR.h:34-67 via _reconstruct_uninverted)
            interp = [[None] * index_range for _ in range(3)]
            for r in range(index_range):
                w = (recip * r + 256) >> 9
                for ch in range(3):
                    px32 = (64 - w) * unq[0][ch] + w * unq[1][ch]
                    px32 = (px32 + 32) >> 6
                    if is_signed:
                        v = _unscale_hdr_signed(px32)
                    else:
                        v = _unscale_hdr_unsigned(px32)
                    interp[ch][r] = lanes.twoscl_half_to_float(v)

        # --- per-pixel UNINVERTED selection (+ slow error) ---
        idx_unv = [None] * 16
        err_px = [None] * 16
        for px in range(16):
            if fast_indexing:
                dist = (f2cl[px][0] - origin[0]) * axis[0]
                for ch in range(1, 3):
                    dist = dist + (f2cl[px][ch] - origin[ch]) * axis[ch]
                idx_unv[px] = lanes.round_and_convert_to_int_nearest(
                    lanes.clamp(dist, 0.0, max_value))
            else:
                # sequential strict-less scan == the one-pass
                # lexicographic (value, index) reduce (first-occurrence)
                best_e = None
                best_i = None
                for r in range(index_range):
                    e_r = None
                    for ch in range(3):
                        d = flinw[px][ch] - interp[ch][r] * cw[ch]
                        t = d * d
                        e_r = t if e_r is None else e_r + t
                    if r == 0:
                        best_e = jnp.broadcast_to(e_r, (Q, NB))
                        best_i = jnp.zeros((Q, NB), dtype=jnp.int32)
                    else:
                        lt = e_r < best_e
                        best_e = jnp.where(lt, e_r, best_e)
                        best_i = jnp.where(lt, r, best_i)
                idx_unv[px] = best_i
                # ComputeErrorHDRSlow at the selected index: gather each
                # channel's interpolant with a shared where-chain
                sel = [interp[ch][0] for ch in range(3)]
                sel = [jnp.broadcast_to(s, (Q, NB)) for s in sel]
                for r in range(1, index_range):
                    mr = best_i == r
                    for ch in range(3):
                        sel[ch] = jnp.where(mr, interp[ch][r], sel[ch])
                e2 = None
                for ch in range(3):
                    d2 = sel[ch] - f2cl_unw[px][ch]
                    t2 = d2 * d2
                    if not uniform:
                        t2 = t2 * cw_sq[ch]
                    e2 = t2 if e2 is None else e2 + t2
                err_px[px] = e2

        # fixup pixel's index (static per q row) -> conditional inversion
        fix_idx = jnp.zeros((Q, NB), dtype=jnp.int32)
        for px in sorted(set(int(v) for v in fixups_sm)):
            col = _q_mask(fixups_sm == px, qi)
            fix_idx = jnp.where(col, idx_unv[px], fix_idx)
        invert = fix_idx > half_range_m1

        # swapped (stored) endpoints
        q_sw = [jnp.where(invert, q_els[1][ch], q_els[0][ch])
                for ch in range(3)] + \
               [jnp.where(invert, q_els[0][ch], q_els[1][ch])
                for ch in range(3)]

        # dedup vs previous meta rounds (BC67.cpp:2853-2877)
        valid = jnp.ones((Q, NB), dtype=jnp.bool_)
        for pe in prev_eps:
            eq = pe[0] == q_sw[0]
            for j in range(1, 6):
                eq = eq & (pe[j] == q_sw[j])
            valid = valid & ~eq
        prev_eps.append(q_sw)

        if fast_indexing:
            # error via uninverted reconstruction vs 2CL pixels
            # (bc6h.pack fast path: recon - pixels, int squares)
            err_px = [None] * 16
            for px in range(16):
                iv = idx_unv[px]
                w = (recip * iv + 256) >> 9
                e = None
                for ch in range(3):
                    px32 = (64 - w) * unq[0][ch] + w * unq[1][ch]
                    px32 = (px32 + 32) >> 6
                    if is_signed:
                        recon = _unscale_hdr_signed(px32)
                    else:
                        recon = _unscale_hdr_unsigned(px32)
                    d = recon - p2cl[px][ch]
                    t = lanes.to_float(d * d)
                    if not uniform:
                        t = t * cw_sq[ch]
                    e = t if e is None else e + t
                err_px[px] = e

        # sequential subset-error accumulation + refiner contributions
        # (reference f32 addition order; bc6h.pack:600-608)
        last_refine = refine_pass == num_refine_rounds - 1
        subset_error = zero_f
        idx_inv = [None] * 16
        for px in range(16):
            subset_error = subset_error + jnp.where(
                member[px], err_px[px], np.float32(0.0))
            idx_inv[px] = jnp.where(
                invert, (index_range - 1) - idx_unv[px], idx_unv[px])
            if not last_refine:
                refiner.contribute_unweighted_pw(
                    pw[px], idx_inv[px], mask=member[px] & valid)

        # pack 16 3-bit indexes into two i32 words
        idx_lo = idx_inv[0]
        for px in range(1, 10):
            idx_lo = idx_lo | (idx_inv[px] << (3 * px))
        idx_hi = idx_inv[10]
        for px in range(11, 16):
            idx_hi = idx_hi | (idx_inv[px] << (3 * (px - 10)))

        err_out[pos * Q:(pos + 1) * Q, :] = subset_error
        valid_out[pos * Q:(pos + 1) * Q, :] = valid.astype(jnp.int32)
        for j in range(6):
            eps_out[(pos * 6 + j) * Q:(pos * 6 + j + 1) * Q, :] = q_sw[j]
        idx_out[(pos * 2) * Q:(pos * 2 + 1) * Q, :] = idx_lo
        idx_out[(pos * 2 + 1) * Q:(pos * 2 + 2) * Q, :] = idx_hi


def partitioned_group_meta_rounds(pix_flat, base, offset, aprec, is_signed,
                                  fast_indexing, uniform, cw, cw_sq,
                                  active_rounds, num_refine_rounds,
                                  index_range, sub_mask_sm, fixups_sm,
                                  interpret=False):
    """Run one partitioned precision group's meta rounds in the kernel.

    Args:
      pix_flat: [48, N] i32 clamped 2CL pixels (row px*3 + ch).
      base/offset: lists of 3 [Q, N] f32 UFEP arrays (subset-major q).
      active_rounds: tuple of (meta_round, tweak, refine_pass, last).
      sub_mask_sm / fixups_sm: static np arrays [Q, 16] / [Q].

    Returns (err [A, Q, N] f32, valid [A, Q, N] bool,
             eps [A, 6, Q, N] i32, idx_packed [A, 2, Q, N] i32) where
    A = len(active_rounds), in active_rounds order.
    """
    n = pix_flat.shape[1]
    assert n % NB == 0, (n, NB)
    a_count = len(active_rounds)

    kernel = functools.partial(
        _group_kernel_body, aprec, is_signed, fast_indexing, uniform,
        tuple(np.float32(w) for w in cw),
        tuple(np.float32(w) for w in cw_sq),
        tuple(active_rounds), num_refine_rounds, index_range,
        sub_mask_sm, fixups_sm)

    def spec(rows):
        return pl.BlockSpec((rows, NB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    err, valid, eps, idx = pl.pallas_call(
        kernel,
        grid=(n // NB,),
        in_specs=[spec(48)] + [spec(Q)] * 6,
        out_specs=[spec(a_count * Q), spec(a_count * Q),
                   spec(a_count * 6 * Q), spec(a_count * 2 * Q)],
        out_shape=[
            jax.ShapeDtypeStruct((a_count * Q, n), jnp.float32),
            jax.ShapeDtypeStruct((a_count * Q, n), jnp.int32),
            jax.ShapeDtypeStruct((a_count * 6 * Q, n), jnp.int32),
            jax.ShapeDtypeStruct((a_count * 2 * Q, n), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(pix_flat, base[0], base[1], base[2], offset[0], offset[1], offset[2])

    return (err.reshape(a_count, Q, n),
            valid.reshape(a_count, Q, n).astype(jnp.bool_),
            eps.reshape(a_count, 6, Q, n),
            idx.reshape(a_count, 2, Q, n))
