"""BC6H HDR encoder.

TPU-native reimplementation of the reference's BC6HComputer
(/root/reference/ConvectionKernels_BC67.cpp:2447-3051), redesigned for dense
batched evaluation: partitions and subsets are array axes; the meta-round
chain (tweak x refine, BC67.cpp:2794-2911) stays sequential because the
endpoint-dedup check couples rounds in visitation order; the meta0 x meta1 x
mode legality cross-product (BC67.cpp:2914-2986) is a fully vectorized
candidate tensor resolved by lexicographic (error, visitation-rank) argmin.

All float math follows the scalar reference build (see ops/lanes.py and
ops/exact_math.py); HDR values use the internal two's-complement half
representation (2CL) with the scalar build's magnitude-only linearization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import lanes, pca
from ..ops.exact_math import exact_divide
from ..ops.refine import EndpointRefiner
from ..options import Flags
from ..tables import bc6h_layout
from ..tables import bc7_geometry as geom
from .bc7 import (INF, LexBest, _gather_cols, _gather_last, _lut,
                  _ordered_argmin, _pack_var)
from ..ops.index_select import WEIGHT_RECIPROCALS

MAX_TWEAK_ROUNDS = 4   # BC67.h:86
MAX_REFINE_ROUNDS = 3  # BC67.h:87

# g_hdrModes (BC67.cpp:151-167): (modeID, partitioned, transformed, aPrec,
# bPrec[3]) in table order — mode indexes match bc6h_layout.LAYOUTS.
HDR_MODES = (
    (0x00, True, True, 10, (5, 5, 5)),
    (0x01, True, True, 7, (6, 6, 6)),
    (0x02, True, True, 11, (5, 4, 4)),
    (0x06, True, True, 11, (4, 5, 4)),
    (0x0A, True, True, 11, (4, 4, 5)),
    (0x0E, True, True, 9, (5, 5, 5)),
    (0x12, True, True, 8, (6, 5, 5)),
    (0x16, True, True, 8, (5, 6, 5)),
    (0x1A, True, True, 8, (5, 5, 6)),
    (0x1E, True, False, 6, (6, 6, 6)),
    (0x03, False, False, 10, (10, 10, 10)),
    (0x07, False, True, 11, (9, 9, 9)),
    (0x0B, False, True, 12, (8, 8, 8)),
    (0x0F, False, True, 16, (4, 4, 4)),
)


def _unscale_hdr_signed(v):
    """UnscaleHDRValueSigned (BC67.cpp:765-781): |v|*31>>5 with 2CL sign."""
    negative = v < 0
    abs_v = jnp.where(negative, -v, v)
    scaled = (abs_v * 31) >> 5
    return jnp.where(negative, scaled | (-32768), scaled)


def _unscale_hdr_unsigned(v):
    """UnscaleHDRValueUnsigned (BC67.cpp:783-786): v*31>>6."""
    return (v * 31) >> 6


def _quantize_element(v2cl, precision: int, is_signed: bool):
    """QuantizeSingleEndpointElement{Signed,Unsigned} (BC67.cpp:2424-2445).

    Uses RoundUp (ceil) conversion; division by 31 is exactly rounded.
    """
    if is_signed:
        negative = v2cl < 0
        abs_elem = jnp.where(negative, -v2cl, v2cl)
        f = exact_divide(lanes.to_float(abs_elem) * np.float32(32.0),
                         np.float32(31.0))
        q = lanes.round_up_to_int(f) >> (16 - precision)
        return jnp.where(negative, -q, q)
    f = exact_divide(lanes.to_float(v2cl) * np.float32(64.0), np.float32(31.0))
    f = jnp.minimum(f, np.float32(65535.0))
    return lanes.round_up_to_int(f) >> (16 - precision)


def _unquantize_element(comp, precision: int, is_signed: bool):
    """UnquantizeSingleEndpointElement{Signed,Unsigned} (BC67.cpp:2447-2502).

    Returns (unquantized, finished) int32 arrays.
    """
    if is_signed:
        negative = comp < 0
        abs_comp = jnp.where(negative, -comp, comp)
        if precision >= 16:
            unq = comp
            abs_unq = abs_comp
        else:
            max_comp_m1 = (1 << (precision - 1)) - 2
            is_zero = comp == 0
            is_max = comp > max_comp_m1
            abs_unq = (abs_comp << (16 - precision)) + (0x4000
                                                        >> (precision - 1))
            abs_unq = jnp.where(is_zero, 0, abs_unq)
            abs_unq = jnp.where(is_max, 0x7FFF, abs_unq)
            unq = jnp.where(negative, -abs_unq, abs_unq)
        funq = (abs_unq * 31) >> 5
        finished = jnp.where(negative, -funq, funq)
        return unq, finished
    unq = comp
    if precision < 15:
        max_comp_m1 = (1 << precision) - 2
        is_zero = comp == 0
        is_max = comp > max_comp_m1
        unq = (comp << (16 - precision)) + (0x8000 >> precision)
        unq = jnp.where(is_zero, 0, unq)
        unq = jnp.where(is_max, 0xFFFF, unq)
    finished = (unq * 31) >> 6
    return unq, finished


class _HDRIndexSelector:
    """IndexSelectorHDR<3> (ConvectionKernels_IndexSelectorHDR.h:15-151)."""

    def __init__(self, channel_weights, unquantized_ep, finished_ep,
                 index_range: int, is_signed: bool, fast_indexing: bool):
        self.range = index_range
        self.max_value = np.float32(index_range - 1)
        self.is_signed = is_signed
        self.endpoints = unquantized_ep  # interpolation space
        cw = [np.float32(w) for w in channel_weights[:3]]

        # base-class Init with colorSpaceEndpoints = finished EPs
        self.origin = [lanes.to_float(finished_ep[0][ch]) for ch in range(3)]
        diff_w = [(lanes.to_float(finished_ep[1][ch]) - self.origin[ch])
                  * cw[ch] for ch in range(3)]
        len_sq = diff_w[0] * diff_w[0]
        for ch in range(1, 3):
            len_sq = len_sq + diff_w[ch] * diff_w[ch]
        len_sq = lanes.make_safe_denominator(len_sq)
        mv = exact_divide(jnp.full_like(len_sq, self.max_value), len_sq)
        self.axis = [diff_w[ch] * cw[ch] * mv for ch in range(3)]

        self.inverted = None  # per-lane flag, set by conditional_invert

        if not fast_indexing:
            # precompute all interpolants in linear space via
            # TwosCLHalfToFloat (InitHDR, IndexSelectorHDR.h:84-108),
            # batched over a range axis inserted at position -2 (keeping
            # the block axis minor preserves the zero-padding TPU layout;
            # R is 8 or 16, a whole sublane multiple). The unweighted
            # values also serve ComputeErrorHDRSlow (SqDiff2CL) via gather.
            idx = jnp.arange(index_range, dtype=jnp.int32)
            shape = unquantized_ep[0][0].shape
            idx = idx.reshape((1,) * (len(shape) - 1) + (index_range, 1))
            recon = self._reconstruct_uninverted(
                [unquantized_ep[e][ch][..., None, :] for e in range(2)
                 for ch in range(3)], idx)
            self.interp_unw = [lanes.twoscl_half_to_float(recon[ch])
                               for ch in range(3)]
            self.interpolators = [self.interp_unw[ch] * cw[ch]
                                  for ch in range(3)]

    def _reconstruct_uninverted(self, ep_flat, index):
        """ReconstructHDR{Signed,Unsigned}Uninverted (IndexSelectorHDR.h:34-67)."""
        recip = WEIGHT_RECIPROCALS[self.range]
        weight = (recip * index + 256) >> 9
        out = []
        for ch in range(3):
            ep0 = ep_flat[ch]
            ep1 = ep_flat[3 + ch]
            px32 = (64 - weight) * ep0 + weight * ep1
            px32 = (px32 + 32) >> 6
            if self.is_signed:
                out.append(_unscale_hdr_signed(px32))
            else:
                out.append(_unscale_hdr_unsigned(px32))
        return out

    def reconstruct(self, index):
        idx = self.invert_single(index)
        ep_flat = [self.endpoints[0][ch] for ch in range(3)] + \
            [self.endpoints[1][ch] for ch in range(3)]
        return self._reconstruct_uninverted(ep_flat, idx)

    def invert_single(self, index):
        if self.inverted is None:
            return index
        return jnp.where(self.inverted, (self.range - 1) - index, index)

    def conditional_invert(self, invert):
        self.inverted = invert

    def select_slow(self, linear_weighted_pixel):
        """SelectIndexHDRSlow (IndexSelectorHDR.h:125-139): argmin over
        interpolants (range axis at -2), first-wins ties (strict-less
        update)."""
        err = None
        for ch in range(3):
            d = linear_weighted_pixel[ch][..., None, :] \
                - self.interpolators[ch]
            e = d * d
            err = e if err is None else err + e
        # sequential strict-less == first-occurrence argmin over index order
        idx = lanes.first_argmin(err, -2).astype(jnp.int32)
        return self.invert_single(idx)

    def select_fast(self, pixel_2cl):
        """SelectIndexHDRFast = base SelectIndexLDR + inversion."""
        dist = (pixel_2cl[0] - self.origin[0]) * self.axis[0]
        for ch in range(1, 3):
            dist = dist + (pixel_2cl[ch] - self.origin[ch]) * self.axis[ch]
        idx = lanes.round_and_convert_to_int_nearest(
            lanes.clamp(dist, 0.0, self.max_value))
        return self.invert_single(idx)

    def slow_error_for_index(self, index, f2cl_unw_px, cw_sq, uniform):
        """ComputeErrorHDRSlow (BCCommon.h:66-82) via interpolator gather:
        SqDiff2CL(recon(idx), pixel) per channel, weighted. `index` is the
        already-inverted stored index; gather the uninverted interpolant."""
        un_idx = self.invert_single(index)  # inversion is an involution
        err = None
        for ch in range(3):
            # select the interpolant by index with a where-chain over the
            # R precomputed values (XLA:TPU lowers take_along_axis to a
            # serial gather; R is 8 or 16 and this runs 16 px x 3 ch per
            # meta round, which made gathers the dominant encode cost)
            interp = self.interp_unw[ch][..., 0, :]
            for r in range(1, self.range):
                interp = jnp.where(un_idx == r,
                                   self.interp_unw[ch][..., r, :], interp)
            d = interp - f2cl_unw_px[ch]
            e = d * d
            if not uniform:
                e = e * cw_sq[ch]
            err = e if err is None else err + e
        return err


def _truncate_signed(v, precision: int):
    """Scalar TruncateToPrecisionSigned (ParallelMath.h:1410-1414)."""
    shift = 32 - precision
    return (v << shift) >> shift


def pack(pixels_f16bits, flags: int, channel_weights, is_signed: bool,
         num_tweak_rounds: int, num_refine_rounds: int, *,
         _only_groups=None, _skip_combine=False):
    """BC6HComputer::Pack (BC67.cpp:2665-3051). Returns uint8 [N, 16].

    pixels_f16bits: int16-bits [N, 16, 4] (alpha ignored).
    _only_groups/_skip_combine are profiling hooks (tools/
    profile_bc6h_stages.py): restrict to a subset of the precision
    groups / stop before the meta-combine. Never set on the API path.
    """
    num_tweak_rounds = min(max(num_tweak_rounds, 1), MAX_TWEAK_ROUNDS)
    num_refine_rounds = min(max(num_refine_rounds, 1), MAX_REFINE_ROUNDS)
    fast_indexing = bool(flags & Flags.BC6H_FAST_INDEXING)
    uniform = bool(flags & Flags.UNIFORM)

    p = jnp.asarray(pixels_f16bits, dtype=jnp.int16).astype(jnp.int32)
    n = p.shape[0]
    cw = [np.float32(w) for w in channel_weights[:3]]
    cw_sq = [w * w for w in cw]

    # sign+magnitude -> 2CL, clamp (BC67.cpp:2691-2715)
    pixels = []
    f2cl = []
    flinw = []
    f2cl_unw = []  # unweighted TwosCL floats (SqDiff2CL's pixel side)
    for px in range(16):
        row, frow, lrow, urow = [], [], [], []
        for ch in range(3):
            v = p[:, px, ch]
            if is_signed:
                negative = v < 0
                magnitude = v & 32767
                v = jnp.where(negative, -magnitude, v)
                v = jnp.maximum(v, -31743)
            else:
                v = jnp.maximum(v, 0)
            v = jnp.minimum(v, 31743)
            row.append(v)
            frow.append(lanes.to_float(v))
            lrow.append(lanes.twoscl_half_to_float(v) * cw[ch])
            urow.append(lanes.twoscl_half_to_float(v))
        pixels.append(row)
        f2cl.append(frow)
        flinw.append(lrow)
        f2cl_unw.append(urow)

    pw_pixels = [[f2cl[px][ch] * cw[ch] for ch in range(3)]
                 for px in range(16)]

    # PCA over 65 pixel sets: 32 partitions x 2 subsets + full block
    # (BC67.cpp:2736-2774), batched as one [N, 65] run.
    masks = np.zeros((65, 16), dtype=bool)
    for part in range(32):
        bits = int(geom.PARTITION_MAP_2[part])
        for px in range(16):
            subset = (bits >> px) & 1
            masks[part * 2 + subset, px] = True
    masks[64, :] = True

    pw_b = [[pw_pixels[px][ch][:, None] for ch in range(3)]
            for px in range(16)]
    weights = [jnp.asarray(masks[:, px][None, :].astype(np.float32))
               for px in range(16)]
    member = [jnp.asarray(masks[:, px][None, :]) for px in range(16)]
    cen, dirn, mn_d, mx_d = pca.endpoint_selector(pw_b, weights, 3,
                                                  member_mask=member)
    ufep_base, ufep_offset = pca.get_endpoints(cen, dirn, mn_d, mx_d, cw, 3)

    # precision groups in visitation order: single modes first
    # (partitionedInt 0), aPrec descending (BC67.cpp:2776-2784)
    groups = []
    for partitioned_int in range(2):
        partitioned = partitioned_int == 1
        precs = sorted({m[3] for m in HDR_MODES if m[1] == partitioned},
                       reverse=True)
        for aprec in precs:
            modes = [i for i, m in enumerate(HDR_MODES)
                     if m[1] == partitioned and m[3] == aprec]
            groups.append((partitioned, aprec, modes))

    best = LexBest.empty((n,), {
        "mode": (), "partition": (),
        "ep": (2, 2, 3),     # [subset][epi][ch] encoded values
        "idx": (16,),
    })

    rank_base = 0
    max_meta = MAX_TWEAK_ROUNDS * MAX_REFINE_ROUNDS

    for group_idx, (partitioned, aprec, mode_list) in enumerate(groups):
        if _only_groups is not None and group_idx not in _only_groups:
            rank_base += (32 if partitioned else 1) * max_meta * max_meta
            continue
        num_parts = 32 if partitioned else 1
        num_subsets = 2 if partitioned else 1
        index_bits = 3 if partitioned else 4
        index_range = 1 << index_bits

        # Candidate layout: the (partition, subset) pairs are ONE flattened
        # axis Q = P*S with the BLOCK axis minor: arrays are [Q, N]. The
        # round-1 [N,P,S] layout put (32,2) in the minor tile dims, which
        # the TPU pads to (32,128) — a 64x HBM blowup on every candidate
        # array; [Q, N] pads nothing (N is a lane multiple, Q a sublane
        # multiple).
        q_count = num_parts * num_subsets

        # per-(partition,subset) UFEP columns
        if partitioned:
            cols = np.asarray([[2 * pp, 2 * pp + 1] for pp in range(32)],
                              dtype=np.int32)  # [P, 2]
        else:
            cols = np.asarray([[64]], dtype=np.int32)

        # subset membership per pixel: [P, S, 16]
        sub_mask = np.zeros((num_parts, num_subsets, 16), dtype=bool)
        fixups = np.zeros((num_parts, num_subsets), dtype=np.int32)
        for pp in range(num_parts):
            if partitioned:
                bits = int(geom.PARTITION_MAP_2[pp])
                for px in range(16):
                    sub_mask[pp, (bits >> px) & 1, px] = True
                fixups[pp, 1] = int(geom.FIXUP_INDEXES_2[pp])
            else:
                sub_mask[pp, 0, :] = True

        base = [jnp.take(ufep_base[ch], jnp.asarray(cols.reshape(-1)),
                         axis=1).T for ch in range(3)]          # [Q, N]
        offset = [jnp.take(ufep_offset[ch], jnp.asarray(cols.reshape(-1)),
                           axis=1).T for ch in range(3)]

        shape_q = (q_count, n)
        zero_f = jnp.zeros(shape_q, dtype=jnp.float32)

        meta_eps = []       # per metaRound: [2][3] arrays [Q,N]
        meta_indexes = []   # per metaRound: 16 arrays [Q,N]
        meta_error = []     # per metaRound: [Q,N]
        meta_valid = []     # per metaRound: [Q,N] bool

        member_ps = [jnp.asarray(
            sub_mask[:, :, px].reshape(q_count)[:, None])
            for px in range(16)]                     # [Q,1]
        fix_arr = jnp.asarray(fixups.reshape(q_count)[:, None])  # [Q,1]

        # fixup pixel values (static gather, loop-invariant)
        fix_pix_2cl = []
        fix_pix_lin = []
        sel_fix = jnp.asarray(fixups.reshape(q_count))  # [Q] static
        for ch in range(3):
            vals_2cl = jnp.stack([f2cl[px][ch] for px in range(16)], axis=0)
            vals_lin = jnp.stack([flinw[px][ch] for px in range(16)], axis=0)
            fix_pix_2cl.append(vals_2cl[sel_fix])    # [Q, N]
            fix_pix_lin.append(vals_lin[sel_fix])

        for tweak in range(MAX_TWEAK_ROUNDS):
            refiner = EndpointRefiner(zero_f, 3, index_range, cw)
            for refine_pass in range(MAX_REFINE_ROUNDS):
                meta_round = tweak * MAX_REFINE_ROUNDS + refine_pass
                if tweak >= num_tweak_rounds or refine_pass >= num_refine_rounds:
                    meta_eps.append(None)
                    meta_indexes.append(None)
                    meta_error.append(None)
                    meta_valid.append(jnp.zeros(shape_q, dtype=bool))
                    continue

                if refine_pass == 0:
                    f0, f1 = lanes.compute_tweak_factors(tweak, index_range)
                    lo = -31743.0 if is_signed else 0.0
                    eps_cs = [[], []]
                    for ch in range(3):
                        e0 = lanes.round_and_convert_to_int_nearest(
                            lanes.clamp(base[ch] + offset[ch] * f0, lo,
                                        31743.0))
                        e1 = lanes.round_and_convert_to_int_nearest(
                            lanes.clamp(base[ch] + offset[ch] * f1, lo,
                                        31743.0))
                        eps_cs[0].append(e0)
                        eps_cs[1].append(e1)
                else:
                    r0, r1 = refiner.get_refined_endpoints_hdr(is_signed)
                    eps_cs = [r0, r1]

                refiner = EndpointRefiner(zero_f, 3, index_range, cw)

                # Quantize + unquantize (QuantizeEndpoints*, BC67.cpp:2503-2595)
                # All 6 endpoint elements stacked (leading axis: keeps the
                # [Q,N] minor layout) through one exact divide.
                stacked = jnp.stack([eps_cs[e][ch] for e in range(2)
                                     for ch in range(3)], axis=0)
                q_st = _quantize_element(stacked, aprec, is_signed)
                u_st, f_st = _unquantize_element(q_st, aprec, is_signed)
                q_eps = [[q_st[e * 3 + ch] for ch in range(3)]
                         for e in range(2)]
                unq = [[u_st[e * 3 + ch] for ch in range(3)]
                       for e in range(2)]
                fin = [[f_st[e * 3 + ch] for ch in range(3)]
                       for e in range(2)]

                selector = _HDRIndexSelector(cw, unq, fin, index_range,
                                             is_signed, fast_indexing)


                if fast_indexing:
                    fix_index = selector.select_fast(fix_pix_2cl)
                else:
                    fix_index = selector.select_slow(fix_pix_lin)

                half_range_m1 = index_range // 2 - 1
                invert = fix_index > half_range_m1
                fix_index = jnp.where(invert, (index_range - 1) - fix_index,
                                      fix_index)
                selector.conditional_invert(invert)
                for ch in range(3):
                    a, b = q_eps[0][ch], q_eps[1][ch]
                    q_eps[0][ch] = jnp.where(invert, b, a)
                    q_eps[1][ch] = jnp.where(invert, a, b)

                # dedup vs previous meta rounds (BC67.cpp:2853-2877)
                valid = jnp.ones(shape_q, dtype=bool)
                for prev in range(meta_round):
                    if meta_eps[prev] is None:
                        continue
                    same = jnp.ones(shape_q, dtype=bool)
                    for epi in range(2):
                        for ch in range(3):
                            same = same & (meta_eps[prev][epi][ch]
                                           == q_eps[epi][ch])
                    valid = valid & ~same

                # index selection + error over subset pixels
                indexes = []
                subset_error = zero_f
                for px in range(16):
                    is_fix = fix_arr == px
                    if fast_indexing:
                        idx = selector.select_fast(
                            [f2cl[px][ch][None, :] for ch in range(3)])
                    else:
                        idx = selector.select_slow(
                            [flinw[px][ch][None, :] for ch in range(3)])
                    idx = jnp.where(is_fix, fix_index, idx)
                    if fast_indexing:
                        recon = selector.reconstruct(idx)
                        err = None
                        for ch in range(3):
                            d = recon[ch] - pixels[px][ch][None, :]
                            e = lanes.to_float(d * d)
                            if not uniform:
                                e = e * cw_sq[ch]
                            err = e if err is None else err + e
                    else:
                        err = selector.slow_error_for_index(
                            idx, [f2cl_unw[px][ch][None, :]
                                  for ch in range(3)], cw_sq, uniform)
                    subset_error = subset_error + jnp.where(
                        member_ps[px], err, np.float32(0.0))
                    if refine_pass != num_refine_rounds - 1:
                        refiner.contribute_unweighted_pw(
                            [pw_pixels[px][ch][None, :]
                             for ch in range(3)], idx,
                            mask=member_ps[px] & valid)
                    indexes.append(idx)

                meta_eps.append(q_eps)
                meta_indexes.append(indexes)
                meta_error.append(subset_error)
                meta_valid.append(valid)

        if _skip_combine:
            # profiling hook: keep the meta rounds live via a cheap reduce
            for m in range(max_meta):
                if meta_error[m] is not None:
                    best.error = jnp.minimum(best.error,
                                             jnp.min(meta_error[m], axis=0))
            rank_base += num_parts * max_meta * max_meta
            continue

        # --- combine meta0 x meta1 x first-legal-mode (BC67.cpp:2914-2986) ---
        # Batched over (P, M0, M1) axes; the winner's mode/encoding is
        # recomputed on [N] after selection (cheap) instead of materializing
        # encodings for every candidate.
        num_meta1 = max_meta if partitioned else 1
        valid_rounds = [m for m in range(max_meta)
                        if meta_eps[m] is not None]
        if not valid_rounds:
            rank_base += num_parts * max_meta * max_meta
            continue

        def subset_slice(arr, s):
            """[Q,N] -> the [P,N] rows of subset s."""
            return arr.reshape(num_parts, num_subsets, n)[:, s, :]

        def stack_meta(get):
            """[P,len(valid_rounds),N] from per-round [P,N] slices."""
            return jnp.stack([get(m) for m in valid_rounds], axis=1)

        err0_all = stack_meta(lambda m: subset_slice(meta_error[m], 0))
        val0_all = stack_meta(lambda m: subset_slice(meta_valid[m], 0))
        ep0_all = [[stack_meta(
            lambda m: subset_slice(meta_eps[m][e][ch], 0))
            for ch in range(3)] for e in range(2)]
        if partitioned:
            err1_all = stack_meta(lambda m: subset_slice(meta_error[m], 1))
            val1_all = stack_meta(lambda m: subset_slice(meta_valid[m], 1))
            ep1_all = [[stack_meta(
                lambda m: subset_slice(meta_eps[m][e][ch], 1))
                for ch in range(3)] for e in range(2)]
            totals = err0_all[:, :, None, :] + err1_all[:, None, :, :]
            valid_pair = val0_all[:, :, None, :] & val1_all[:, None, :, :]
        else:
            totals = err0_all[:, :, None, :]
            valid_pair = val0_all[:, :, None, :]

        m_count = len(valid_rounds)
        m1_count = m_count if partitioned else 1

        # legality per mode (EvaluatePartitioned/SingleLegality,
        # BC67.cpp:2597-2663), any-mode-legal gate for candidate validity
        a_mask = (1 << aprec) - 1
        any_legal = None
        for mode_idx in mode_list:
            _, _, transformed, _, bprec = HDR_MODES[mode_idx]
            if not transformed:
                legal = jnp.ones_like(valid_pair)
            else:
                legal = None
                ep00 = [ep0_all[0][ch][:, :, None, :] for ch in range(3)]
                for ch in range(3):
                    # subset 0 ep1 (depends on meta0 only)
                    v = ep0_all[1][ch][:, :, None, :]
                    delta = _truncate_signed(v - ep00[ch], bprec[ch])
                    ok = ((delta + ep00[ch]) & a_mask) == (v & a_mask)
                    legal = ok if legal is None else legal & ok
                    if partitioned:
                        for e in range(2):
                            v = ep1_all[e][ch][:, None, :, :]
                            delta = _truncate_signed(v - ep00[ch], bprec[ch])
                            ok = ((delta + ep00[ch]) & a_mask) \
                                == (v & a_mask)
                            legal = legal & ok
            any_legal = legal if any_legal is None else any_legal | legal

        cand_err = jnp.where(valid_pair & any_legal, totals, INF)

        # ordered argmin over (P, M0, M1) in visitation-rank order
        # (leading-axis flatten preserves p-major, then m0, then m1 order)
        flat = cand_err.reshape(-1, n)
        win = lanes.first_argmin(flat, 0)
        win_err = jnp.min(flat, axis=0)  # == flat[win], no gather

        # static decode of the flat winner index
        meta_ids = np.asarray(valid_rounds, dtype=np.int32)
        p_of = np.repeat(np.arange(num_parts, dtype=np.int32),
                         m_count * m1_count)
        m0_of = np.tile(np.repeat(meta_ids, m1_count), num_parts)
        m1_of = np.tile(meta_ids[:m1_count] if partitioned
                        else np.zeros(1, dtype=np.int32),
                        num_parts * m_count)
        m0_pos_of = np.tile(np.repeat(np.arange(m_count, dtype=np.int32),
                                      m1_count), num_parts)
        m1_pos_of = np.tile(np.arange(m1_count, dtype=np.int32),
                            num_parts * m_count)

        win_part = _lut(p_of, win)
        win_m0 = _lut(m0_of, win)
        win_m1 = _lut(m1_of, win)
        win_rank = rank_base + (win_part * (max_meta * max_meta)
                                + win_m0 * max_meta + win_m1)
        win_m0_pos = _lut(m0_pos_of, win)
        win_m1_pos = _lut(m1_pos_of, win)

        def gather_pm(arr, m_pos):
            """arr [P,M,N] -> [N] at (win_part, m_pos), as a masked sum
            over the P*M rows (take_along_axis would serial-gather)."""
            flat_arr = arr.reshape(-1, n)
            idx = win_part * arr.shape[1] + m_pos
            rows = jnp.arange(flat_arr.shape[0],
                              dtype=jnp.int32)[:, None]
            return jnp.sum(jnp.where(rows == idx[None, :], flat_arr, 0),
                           axis=0)

        # winner endpoints and first-legal mode recomputed on [N]
        w_ep = [[[gather_pm(ep0_all[e][ch], win_m0_pos) for ch in range(3)]
                 for e in range(2)],
                [[gather_pm(ep1_all[e][ch], win_m1_pos) if partitioned
                  else gather_pm(ep0_all[e][ch], win_m0_pos)
                  for ch in range(3)] for e in range(2)]]

        chosen_mode = jnp.full((n,), -1, dtype=jnp.int32)
        enc = [[[jnp.zeros((n,), dtype=jnp.int32) for _ in range(3)]
                for _ in range(2)] for _ in range(2)]
        for mode_idx in mode_list:
            _, _, transformed, _, bprec = HDR_MODES[mode_idx]
            legal = jnp.ones((n,), dtype=bool)
            cand = [[[w_ep[s][e][ch] for ch in range(3)] for e in range(2)]
                    for s in range(2)]
            if transformed:
                for ch in range(3):
                    for subset in range(num_subsets):
                        for epi in range(2):
                            if epi == 0 and subset == 0:
                                continue
                            v = cand[subset][epi][ch]
                            b_red = v & a_mask
                            delta = _truncate_signed(v - cand[0][0][ch],
                                                     bprec[ch])
                            cand[subset][epi][ch] = delta
                            recon = (delta + cand[0][0][ch]) & a_mask
                            legal = legal & (recon == b_red)
            first = (chosen_mode < 0) & legal
            chosen_mode = jnp.where(first, mode_idx, chosen_mode)
            for s in range(2):
                for e in range(2):
                    for ch in range(3):
                        enc[s][e][ch] = jnp.where(first, cand[s][e][ch],
                                                  enc[s][e][ch])

        # winner indexes: per pixel from the owning subset's meta round
        idx0_all = [stack_meta(
            lambda m, px=px: subset_slice(meta_indexes[m][px], 0))
            for px in range(16)]
        if partitioned:
            idx1_all = [stack_meta(
                lambda m, px=px: subset_slice(meta_indexes[m][px], 1))
                for px in range(16)]
        idx_px = []
        for px in range(16):
            v0 = gather_pm(idx0_all[px], win_m0_pos)
            if partitioned:
                v1 = gather_pm(idx1_all[px], win_m1_pos)
                own1 = _lut(sub_mask[:, 1, px].astype(np.int32),
                            win_part) != 0
                idx_px.append(jnp.where(own1, v1, v0))
            else:
                idx_px.append(v0)

        payload = {
            "mode": chosen_mode,
            "partition": win_part,
            "ep": jnp.stack([jnp.stack([jnp.stack(
                [enc[s][e][ch] for ch in range(3)],
                axis=-1) for e in range(2)], axis=-2)
                for s in range(2)], axis=-3),
            "idx": jnp.stack(idx_px, axis=-1),
        }
        best.update(win_err, win_rank, payload,
                    extra_valid=jnp.isfinite(win_err))

        rank_base += num_parts * max_meta * max_meta

    return _pack_bits(best, n)


def _pack_bits(best, n):
    """Final bit packing (BC67.cpp:2992-3050): per-mode header via the
    layout table + 63/64 index bits."""
    mode = best.payload["mode"]
    partition = best.payload["partition"]
    eps = best.payload["ep"]  # [N,2,2,3]
    indexes = [best.payload["idx"][:, px] for px in range(16)]

    words_final = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]

    for mode_idx, (mode_id, partitioned, _, _, _) in enumerate(HDR_MODES):
        fields = {
            "m": jnp.full((n,), mode_id, dtype=jnp.int32),
            "d": partition,
            "rw": eps[:, 0, 0, 0], "rx": eps[:, 0, 1, 0],
            "ry": eps[:, 1, 0, 0], "rz": eps[:, 1, 1, 0],
            "gw": eps[:, 0, 0, 1], "gx": eps[:, 0, 1, 1],
            "gy": eps[:, 1, 0, 1], "gz": eps[:, 1, 1, 1],
            "bw": eps[:, 0, 0, 2], "bx": eps[:, 0, 1, 2],
            "by": eps[:, 1, 0, 2], "bz": eps[:, 1, 1, 2],
        }
        words = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(3)]
        for (field, src, dst, length) in bc6h_layout.LAYOUTS[mode_idx]:
            chunk = (fields[field] >> src) & ((1 << length) - 1)
            w = dst // 32
            sh = dst % 32
            words[w] = words[w] | (chunk << sh)
            if sh + length > 32:
                words[w + 1] = words[w + 1] | (chunk >> (32 - sh))

        header_bits = 82 if partitioned else 65
        index_bits = 3 if partitioned else 4
        if partitioned:
            fix1 = _lut(geom.FIXUP_INDEXES_2, partition)
        else:
            fix1 = jnp.zeros((n,), dtype=jnp.int32)

        mode_words = [words[0], words[1], words[2],
                      jnp.zeros((n,), dtype=jnp.int32)]
        off = jnp.full((n,), header_bits, dtype=jnp.int32)
        for px in range(16):
            mode_words = _pack_var(mode_words, indexes[px], off, index_bits)
            if px == 0:
                off = off + (index_bits - 1)
            else:
                off = off + (index_bits - jnp.where(fix1 == px, 1, 0))

        sel = mode == mode_idx
        for j in range(4):
            words_final[j] = jnp.where(sel, mode_words[j], words_final[j])

    byte_cols = []
    for j in range(4):
        for b in range(4):
            byte_cols.append((words_final[j] >> (b * 8)) & 0xFF)
    return jnp.stack(byte_cols, axis=-1).astype(jnp.uint8)
