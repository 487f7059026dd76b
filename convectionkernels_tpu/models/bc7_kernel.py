"""Pallas TPU mega-kernel for the BC7 single-plane candidate search.

The XLA graph path in bc7.py evaluates each mode's candidate grid as
~2,000 separate fused ops over HBM-resident arrays; at the default chunk
size that is hundreds of GB of HBM round-trips per chunk and the encode
runs at ~0.1 Mtexels/s on a v5e (measured, tools/profile_formats.py).
This kernel runs the whole refine loop — endpoint compression, index
selection with the +-1 slow-indexing retest, error accumulation,
least-squares refinement, and the per-candidate lexicographic
(error, rank) round merge — inside VMEM for a tile of NB blocks.

Candidate packing: the K axis enumerates exactly the plan-valid
(shape, tweak, parity) triples (the reference's seed-count pruning,
BC67.cpp:1265-1279), padded to a multiple of 128 lanes — a dense
C x S grid would re-add the 1.6x (q100) to 9.5x (q5) work the plan
prunes. Per-candidate statics (parity bits, visitation rank, per-pixel
shape membership) ride in a packed [19, K] i32 input; per-shape winner
selection happens OUTSIDE the kernel with static gathers (bc7.py
_single_plane_kernel_best) since ranks make the merge order-free.

Bit-exactness: the kernel body calls the SAME elementwise helpers as
the XLA path (bc7_common.compress_endpoints / accumulate_error,
ops.index_select.IndexSelector, ops.refine.EndpointRefiner,
ops.exact_math), so both paths trace identical arithmetic;
tests/test_bc7_kernel.py pins kernel-vs-graph byte equality and the
oracle goldens cover the kernel path whenever the suite runs on TPU.

Reference: /root/reference/ConvectionKernels_BC67.cpp:1042-1662.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import lanes
from ..ops.index_select import IndexSelector
from ..ops.refine import EndpointRefiner
from . import bc7_common

BIG_RANK = np.int32(2**30)
INF = np.float32(np.inf)

# Blocks per grid step (sublane tile). The kernel's VMEM stack is ~8 MB
# per 256 candidate lanes at NB=8 (Mosaic allocates the unrolled body's
# temporaries); the vmem_limit below admits the measured worst case.
NB = 8


def _kernel_body(mode, k_len, cpow, num_refine_rounds, cfg, cw,
                 pix_ref, alpha_ref, consts_ref, tweakf_ref,
                 b0, b1, b2, b3, o0, o1, o2, o3,
                 err_out, rank_out, pk0_out, pk1_out):
    """One (NB-block, K-chunk) tile: full refine loop for the chunk's
    packed candidates. k_len here is the CHUNK width — wide modes are
    split over a second grid dimension so the unrolled body's VMEM stack
    stays bounded (~8 MB per 256 lanes; mode 3's 1952-lane single-step
    form ran a ~60 MB stack and throttled on spills).

    The tweak-seeded initial endpoints are computed IN the kernel from
    the per-shape UFEP base/offset (expanded to candidate lanes) and the
    per-candidate tweak-factor rows: same round/clamp helpers as the
    graph path (bc7.py _single_plane_grid_best tweak_ep), moved here so
    the graph neither gathers per-candidate endpoints nor materializes
    eight [N, K] arrays per mode (~2.7 ms/chunk at q50 in the op
    profile). The winning endpoints travel as TWO packed 4x8-bit words
    (compressed endpoints are u8), halving both the butterfly's roll
    traffic and the output footprint."""
    nb = pix_ref.shape[0]

    pix = pix_ref[:]                      # [NB, 64] i32 (px*4+ch)
    alpha = alpha_ref[:]                  # [NB, K] f32; +inf marks invalid

    is_rgb = cfg["num_real_channels"] == 3
    f0k = tweakf_ref[0:1, :]              # [1, K] f32 tweak factors
    f1k = tweakf_ref[1:2, :]
    base_k = [b0[:], b1[:], b2[:], b3[:]]
    offset_k = [o0[:], o1[:], o2[:], o3[:]]
    ep = [[], []]
    for ch in range(4):
        if is_rgb and ch == 3:
            e0 = jnp.full((nb, k_len), 255, dtype=jnp.int32)
            ep[0].append(e0)
            ep[1].append(e0)
        else:
            ep[0].append(lanes.round_and_convert_to_int_nearest(
                lanes.clamp(base_k[ch] + offset_k[ch] * f0k, 0.0, 255.0)))
            ep[1].append(lanes.round_and_convert_to_int_nearest(
                lanes.clamp(base_k[ch] + offset_k[ch] * f1k, 0.0, 255.0)))

    # packed static rows (see single_plane_mode_best): per-endpoint parity
    # bits, 16 per-pixel shape-membership rows, per-candidate rank
    p0k = consts_ref[0:1, :]              # [1, K] i32
    p1k = consts_ref[1:2, :]
    members = [consts_ref[2 + px:3 + px, :] != 0 for px in range(16)]
    rank_k = consts_ref[18:19, :]         # [1, K] i32

    # per-pixel values as [NB, 1] columns (broadcast against [NB, K])
    fps, ips, pwps = [], [], []
    for px in range(16):
        fp_row, ip_row, pw_row = [], [], []
        for ch in range(4):
            ip = pix[:, px * 4 + ch][:, None]
            fp = lanes.to_float(ip)
            ip_row.append(ip)
            fp_row.append(fp)
            pw_row.append(fp * np.float32(cw[ch]))
        fps.append(fp_row)
        ips.append(ip_row)
        pwps.append(pw_row)

    full255 = jnp.full((nb, k_len), 255, dtype=jnp.int32)
    zero_nk = jnp.zeros((nb, k_len), dtype=jnp.float32)

    best_err = jnp.full((nb, k_len), lanes.FLT_MAX, dtype=jnp.float32)
    best_rank = jnp.full((nb, k_len), BIG_RANK, dtype=jnp.int32)
    best_pk = [jnp.zeros((nb, k_len), dtype=jnp.int32) for _ in range(2)]

    for refine in range(num_refine_rounds):
        compressed = bc7_common.compress_endpoints(mode, ep, p0k, p1k,
                                                   full255)
        selector = IndexSelector(cw, compressed, cfg["index_range"], 4)
        refiner = (EndpointRefiner(zero_nk, 4, cfg["index_range"], cw)
                   if refine != num_refine_rounds - 1 else None)

        shape_error, _ = bc7_common.accumulate_error(
            selector, zero_nk, members, fps, ips, cfg,
            with_refiner=refiner, pwps=pwps)

        err_r = shape_error + alpha
        rank_r = rank_k * num_refine_rounds + refine
        better = (err_r < best_err) | ((err_r == best_err)
                                       & (rank_r < best_rank))
        best_err = jnp.where(better, err_r, best_err)
        best_rank = jnp.where(better, rank_r, best_rank)
        for w in range(2):
            pk = compressed[w][0]
            for ch in range(1, 4):
                pk = pk | (compressed[w][ch] << (8 * ch))
            best_pk[w] = jnp.where(better, pk, best_pk[w])

        if refiner is not None:
            r0, r1 = refiner.get_refined_endpoints_ldr(
                cfg["num_real_channels"], stacked=False)
            for ch in range(cfg["num_real_channels"]):
                ep[0][ch] = r0[ch]
                ep[1][ch] = r1[ch]

    # --- in-kernel per-shape winner (butterfly over each shape's
    # cpow-aligned slot segment): at step 2^k every lane merges with its
    # lane-index-XOR-2^k partner (two cyclic rolls selected by the iota
    # bit — partners always lie inside the same 2^(k+1)-aligned block),
    # so after log2(cpow) steps EVERY lane of a segment holds the
    # segment's lexicographic (error, rank) winner. The graph then reads
    # per-shape values at static lane s*cpow with no relayout — the
    # former [N, S, c_max] reshape (or strided-slice) reduction cost
    # ~3-4 ms/chunk of pure data movement at q50. The merge comparator
    # is associative + commutative (ranks are unique per slot), so the
    # winner equals the sequential scan's.
    if cpow > 1:
        iota = jax.lax.broadcasted_iota(jnp.int32, (nb, k_len), 1)
        step = 1
        while step < cpow:
            hi = (iota & step) != 0

            def partner(x, hi=hi, step=step):
                return jnp.where(hi, pltpu.roll(x, step, 1),
                                 pltpu.roll(x, k_len - step, 1))

            pe = partner(best_err)
            pr = partner(best_rank)
            ppk = [partner(p) for p in best_pk]
            better = (pe < best_err) | ((pe == best_err)
                                        & (pr < best_rank))
            best_err = jnp.where(better, pe, best_err)
            best_rank = jnp.where(better, pr, best_rank)
            best_pk = [jnp.where(better, p, e)
                       for p, e in zip(ppk, best_pk)]
            step *= 2

    err_out[:] = best_err
    rank_out[:] = best_rank
    pk0_out[:] = best_pk[0]
    pk1_out[:] = best_pk[1]


def _pca_kernel_body(nch, k_len, cw, uniform, with_alpha,
                     pix_ref, masks_ref, *outs):
    """Per-shape 3-pass PCA + power iteration for one NB-block tile.

    Shapes ride the K lanes; the 16 membership rows come in as a
    [16, K] i32 input. Mirrors bc7.py _shape_pca + the static alpha
    error loop (BC67.cpp:1085-1144, 1250-1263) bit-for-bit via the
    shared ops.pca functions (stacked=False avoids minor-axis padding).
    """
    from ..ops import pca

    if with_alpha:
        base_out, offset_out, alpha_out = outs
    else:
        base_out, offset_out = outs

    pix = pix_ref[:]  # [NB, 64] i32

    fps = []
    pws = []
    for px in range(16):
        fp_row, pw_row = [], []
        for ch in range(4):
            fp = lanes.to_float(pix[:, px * 4 + ch][:, None])
            fp_row.append(fp)
            pw_row.append(fp * np.float32(cw[ch]))
        fps.append(fp_row)
        pws.append(pw_row)

    member = [masks_ref[px:px + 1, :] != 0 for px in range(16)]  # [1,K]
    weights = [m.astype(jnp.float32) for m in member]

    pw = [[pws[px][ch] for ch in range(nch)] for px in range(16)]
    centroid, direction, min_d, max_d = pca.endpoint_selector(
        pw, weights, nch, member_mask=member, stacked=False)
    base, offset = pca.get_endpoints(centroid, direction, min_d, max_d,
                                     cw, nch, stacked=False)
    for ch in range(nch):
        base_out[:, ch * k_len:(ch + 1) * k_len] = base[ch]
        offset_out[:, ch * k_len:(ch + 1) * k_len] = offset[ch]

    if with_alpha:
        # static per-shape alpha error (BC67.cpp:1250-1263)
        agg = jnp.zeros(base[0].shape, dtype=jnp.int32)
        for px in range(16):
            d = 255 - pix[:, px * 4 + 3][:, None]
            agg = agg + jnp.where(member[px], d * d, 0)
        if uniform:
            alpha_out[:] = lanes.to_float(agg)
        else:
            cw3 = np.float32(cw[3])
            alpha_out[:] = lanes.to_float(agg) * (cw3 * cw3)


def shape_pca(pix_flat, masks, nch, cw, uniform, with_alpha,
              interpret=False):
    """Per-shape PCA endpoints (+ static alpha error for RGB lists).

    Args:
      pix_flat: [N, 64] i32 pixels (px*4+ch).
      masks: [S, 16] numpy bool shape membership.
      nch: 3 (RGB shapes) or 4 (RGBA shapes).
      with_alpha: also return the weighted static alpha error [N, S].

    Returns (base, offset) lists of nch [N, S] f32 arrays, and the
    alpha error array when with_alpha.
    """
    n = pix_flat.shape[0]
    s_count = masks.shape[0]
    k_len = max(-(-s_count // 128) * 128, 128)

    masks_np = np.zeros((16, k_len), dtype=np.int32)
    masks_np[:, :s_count] = masks.T

    kernel = functools.partial(_pca_kernel_body, nch, k_len, cw, uniform,
                               with_alpha)

    def spec(width):
        return pl.BlockSpec((NB, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [spec(nch * k_len), spec(nch * k_len)]
    out_shape = [jax.ShapeDtypeStruct((n, nch * k_len), jnp.float32)] * 2
    if with_alpha:
        out_specs.append(spec(k_len))
        out_shape.append(jax.ShapeDtypeStruct((n, k_len), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(n // NB,),
        in_specs=[spec(64),
                  pl.BlockSpec((16, k_len), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(pix_flat, jnp.asarray(masks_np))

    base_flat, offset_flat = outs[0], outs[1]
    base = [base_flat[:, ch * k_len:ch * k_len + s_count]
            for ch in range(nch)]
    offset = [offset_flat[:, ch * k_len:ch * k_len + s_count]
              for ch in range(nch)]
    if with_alpha:
        return base, offset, outs[2][:, :s_count]
    return base, offset


def single_plane_mode_best(mode, pix_flat, base_k, offset_k, tweakf,
                           alpha_k, consts, cpow, cfg, cw,
                           num_refine_rounds, interpret=False):
    """Run the mode's packed-candidate refine kernel.

    Args:
      pix_flat: [N, 64] i32 pixels (px*4+ch).
      base_k/offset_k: [4] lists of [N, K] f32 per-candidate UFEP rows
                (per-shape values expanded to candidate lanes; the
                tweak-seeded endpoints are computed in-kernel).
      tweakf:   [2, K] numpy f32 per-candidate tweak factors (f0, f1).
      alpha_k:  [N, K] f32 per-candidate static alpha error, +inf where
                the candidate is invalid (padding / punchthrough parity).
      consts:   [19, K] numpy i32: rows 0/1 parity bits, 2..17 per-pixel
                membership, 18 visitation rank.
      cfg: accumulate_error config.

    Returns (best_err [N, K] f32, best_rank [N, K] i32,
             best_pk0, best_pk1 [N, K] i32 packed 4x8-bit endpoints) —
    per-candidate best over refine rounds, butterfly-reduced so every
    lane of a cpow segment holds its shape's winner.
    """
    n, k_len = base_k[0].shape
    assert n % NB == 0, (n, NB)

    # lane-chunk the candidate axis: bounds the unrolled body's VMEM
    # stack for wide modes (the chunk must keep whole cpow segments,
    # which any multiple of 128 does — cpow <= 16)
    kc = next((d for d in (512, 384, 256, 128)
               if k_len % d == 0), k_len)
    assert kc % cpow == 0, (k_len, kc, cpow)

    kernel = functools.partial(_kernel_body, mode, kc, cpow,
                               num_refine_rounds, cfg, cw)

    def spec(width, chunked=True):
        if chunked:
            return pl.BlockSpec((NB, width), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((NB, width), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    consts_spec = pl.BlockSpec((19, kc), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
    tweakf_spec = pl.BlockSpec((2, kc), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)

    err, rank, pk0, pk1 = pl.pallas_call(
        kernel,
        grid=(n // NB, k_len // kc),
        in_specs=[spec(64, False), spec(kc), consts_spec, tweakf_spec]
        + [spec(kc)] * 8,
        out_specs=[spec(kc)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n, k_len), jnp.float32),
            jax.ShapeDtypeStruct((n, k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, k_len), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(pix_flat, alpha_k, jnp.asarray(consts), jnp.asarray(tweakf),
      base_k[0], base_k[1], base_k[2], base_k[3],
      offset_k[0], offset_k[1], offset_k[2], offset_k[3])
    return err, rank, pk0, pk1


# --- Dual-plane (modes 4/5) kernel -------------------------------------------

def _quantize_arr(c, bits):
    """Quantize with a per-lane bits row (BC67.cpp:827-831)."""
    return ((c << bits) - c + (127 + (1 << (7 - bits)))) >> 8


def _unquantize_arr(c, bits):
    """Unquantize with a per-lane bits row (BC67.cpp:851-859)."""
    cc = c << (8 - bits)
    return cc | (cc >> bits)


# consts_i rows
_CI_CH0_IS3, _CI_CH1_IS3, _CI_CH2_IS3 = 0, 1, 2
_CI_A_SRC0, _CI_A_SRC1, _CI_A_SRC2 = 3, 4, 5  # else source is channel 3
_CI_RANKT = 6
_CI_A_RAW = 7            # mode 5: alpha endpoints are not quantized
_CI_RGB_BITS, _CI_A_BITS = 8, 9
_CI_RGB_MAXI, _CI_A_MAXI = 10, 11
_CI_ROWS = 12
# consts_f rows
(_CF_INV, _CF_RGB_MV, _CF_RGB_RECIP, _CF_A_MV, _CF_A_RECIP,
 _CF_RGB_RCPMAX, _CF_A_RCPMAX,
 _CF_CW0, _CF_CW1, _CF_CW2,
 _CF_CWSQ0, _CF_CWSQ1, _CF_CWSQ2, _CF_A_CWSQ,
 _CF_RCW0, _CF_RCW1, _CF_RCW2,
 _CF_RF0, _CF_RF1, _CF_AF0, _CF_AF1) = range(21)
_CF_ROWS = 21


def _dual_kernel_body(k_len, num_refine_rounds, uniform, fast_indexing,
                      pix_ref, ci_ref, cf_ref,
                      rgb_err_out, rgb_rank_out, rgb_ep_out, rgb_idx_out,
                      a_err_out, a_rank_out, a_ep_out, a_idx_out):
    """TryDualPlane (BC67.cpp:1664-1965) for all (mode, rotation,
    index-selector, tweak) combos at once: per-candidate statics (ranges,
    rotated channel sources, weights, tweak factors) ride in const rows,
    so one NB-block tile evaluates every combo in VMEM."""
    from ..ops import pca

    nb = pix_ref.shape[0]
    pix = pix_ref[:]

    def ci(r):
        return ci_ref[r:r + 1, :]

    def cf(r):
        return cf_ref[r:r + 1, :]

    inv = cf(_CF_INV)
    rgb_mv, rgb_recip = cf(_CF_RGB_MV), cf(_CF_RGB_RECIP)
    a_mv, a_recip = cf(_CF_A_MV), cf(_CF_A_RECIP)
    cw_rows = [cf(_CF_CW0), cf(_CF_CW1), cf(_CF_CW2)]
    cwsq_rows = [cf(_CF_CWSQ0), cf(_CF_CWSQ1), cf(_CF_CWSQ2)]
    a_cwsq = cf(_CF_A_CWSQ)
    rcw_rows = [cf(_CF_RCW0), cf(_CF_RCW1), cf(_CF_RCW2)]
    rankt = ci(_CI_RANKT)
    a_raw = ci(_CI_A_RAW) != 0
    rgb_bits, a_bits = ci(_CI_RGB_BITS), ci(_CI_A_BITS)
    rgb_maxi, a_maxi = ci(_CI_RGB_MAXI), ci(_CI_A_MAXI)

    ch_is3 = [ci(_CI_CH0_IS3) != 0, ci(_CI_CH1_IS3) != 0,
              ci(_CI_CH2_IS3) != 0]
    a_src = [ci(_CI_A_SRC0) != 0, ci(_CI_A_SRC1) != 0, ci(_CI_A_SRC2) != 0]

    # rotated per-pixel values (channel rotation is static per lane)
    rgb_i, rgb_f, pw_rot, a_i, a_f = [], [], [], [], []
    for px in range(16):
        cols = [pix[:, px * 4 + ch][:, None] for ch in range(4)]
        ir = [jnp.where(ch_is3[ch], cols[3], cols[ch]) for ch in range(3)]
        fr = [lanes.to_float(v) for v in ir]
        rgb_i.append(ir)
        rgb_f.append(fr)
        pw_rot.append([fr[ch] * cw_rows[ch] for ch in range(3)])
        av = jnp.where(a_src[0], cols[0],
                       jnp.where(a_src[1], cols[1],
                                 jnp.where(a_src[2], cols[2], cols[3])))
        a_i.append(av)
        a_f.append(lanes.to_float(av))

    # per-rotation PCA (hoisted in the graph path; here lanes sharing a
    # rotation redundantly compute the same values - K is only 128)
    ones = jnp.ones((nb, k_len), dtype=jnp.float32)
    cen, dirn, mn_d, mx_d = pca.endpoint_selector(
        pw_rot, [ones] * 16, 3, stacked=False)
    base, offset = pca.get_endpoints(cen, dirn, mn_d, mx_d, cw_rows, 3,
                                     stacked=False)

    amin = a_i[0]
    amax = a_i[0]
    for px in range(1, 16):
        amin = jnp.minimum(a_i[px], amin)
        amax = jnp.maximum(a_i[px], amax)

    rf0, rf1, af0, af1 = (cf(_CF_RF0), cf(_CF_RF1), cf(_CF_AF0),
                          cf(_CF_AF1))
    rgb_ep = [[], []]
    for ch in range(3):
        rgb_ep[0].append(lanes.round_and_convert_to_int_nearest(
            lanes.clamp(base[ch] + offset[ch] * rf0, 0.0, 255.0)))
        rgb_ep[1].append(lanes.round_and_convert_to_int_nearest(
            lanes.clamp(base[ch] + offset[ch] * rf1, 0.0, 255.0)))
    a_base = lanes.to_float(amin)
    a_offs = lanes.to_float(amax) - a_base
    alpha_ep = [
        lanes.round_and_convert_to_int_nearest(
            lanes.clamp(a_base + a_offs * af0, 0.0, 255.0)),
        lanes.round_and_convert_to_int_nearest(
            lanes.clamp(a_base + a_offs * af1, 0.0, 255.0)),
    ]

    zero_nk = jnp.zeros((nb, k_len), dtype=jnp.float32)
    big = jnp.full((nb, k_len), BIG_RANK, dtype=jnp.int32)
    rgb_best = dict(err=jnp.full((nb, k_len), lanes.FLT_MAX), rank=big,
                    ep=[jnp.zeros((nb, k_len), jnp.int32)
                        for _ in range(6)],
                    idx=[jnp.zeros((nb, k_len), jnp.int32)
                         for _ in range(16)])
    a_best = dict(err=jnp.full((nb, k_len), lanes.FLT_MAX), rank=big,
                  ep=[jnp.zeros((nb, k_len), jnp.int32) for _ in range(2)],
                  idx=[jnp.zeros((nb, k_len), jnp.int32)
                       for _ in range(16)])

    for refine in range(num_refine_rounds):
        # CompressEndpoints4/5 (BC67.cpp:908-923) with per-lane bit counts
        rgb_ep = [[_unquantize_arr(_quantize_arr(e, rgb_bits), rgb_bits)
                   for e in row] for row in rgb_ep]
        alpha_q = [_unquantize_arr(_quantize_arr(a, jnp.where(a_raw, 6,
                                                              a_bits)),
                                   jnp.where(a_raw, 6, a_bits))
                   for a in alpha_ep]
        alpha_ep = [jnp.where(a_raw, alpha_ep[j], alpha_q[j])
                    for j in range(2)]

        rgb_sel = IndexSelector(cw_rows, rgb_ep, (rgb_mv, rgb_recip), 3)
        a_sel = IndexSelector([np.float32(1.0)],
                              [[alpha_ep[0]], [alpha_ep[1]]],
                              (a_mv, a_recip), 1)
        last = refine == num_refine_rounds - 1
        rgb_refiner = EndpointRefiner(
            zero_nk, 3, 2, cw_rows, rcp_max_index=cf(_CF_RGB_RCPMAX),
            rcp_channel_weights=rcw_rows)
        a_refiner = EndpointRefiner(
            zero_nk, 1, 2, [np.float32(1.0)],
            rcp_max_index=cf(_CF_A_RCPMAX))

        error_rgb = zero_nk
        error_a = zero_nk
        agg_rgb = [zero_nk for _ in range(3)]
        agg_a = zero_nk

        rgb_idx, a_idx = [], []
        for px in range(16):
            ri = rgb_sel.select_index_ldr(rgb_f[px])
            ai = a_sel.select_index_ldr([a_f[px]])

            if fast_indexing:
                rr = rgb_sel.reconstruct_ldr_bc7_f32(ri)
                ra = a_sel.reconstruct_ldr_bc7_f32(ai)[0]
                for ch in range(3):
                    d = rr[ch] - rgb_f[px][ch]
                    agg_rgb[ch] = agg_rgb[ch] + d * d
                da = ra - a_f[px]
                agg_a = agg_a + da * da
            else:
                def rgb_err(iv, px=px):
                    rr = rgb_sel.reconstruct_ldr_bc7_f32(iv)
                    errs = []
                    for c2 in range(3):
                        d = rr[c2] - rgb_f[px][c2]
                        errs.append(d * d)
                    if uniform:
                        t = errs[0] + errs[1]
                        t = t + errs[2]
                        return t
                    t = errs[0] * cwsq_rows[0]
                    for c2 in range(1, 3):
                        t = t + errs[c2] * cwsq_rows[c2]
                    return t

                def a_err(iv, px=px):
                    ra = a_sel.reconstruct_ldr_bc7_f32(iv)[0]
                    d = ra - a_f[px]
                    e = d * d
                    if uniform:
                        return e
                    return e * a_cwsq

                re = rgb_err(ri)
                ae = a_err(ai)
                r_alt = (jnp.maximum(ri, 1) - 1,
                         jnp.minimum(ri + 1, rgb_maxi))
                a_alt = (jnp.maximum(ai, 1) - 1,
                         jnp.minimum(ai + 1, a_maxi))
                for ii in range(2):
                    are = rgb_err(r_alt[ii])
                    aae = a_err(a_alt[ii])
                    rb = are < re
                    ab = aae < ae
                    re = jnp.minimum(are, re)
                    ae = jnp.minimum(aae, ae)
                    ri = jnp.where(rb, r_alt[ii], ri)
                    ai = jnp.where(ab, a_alt[ii], ai)
                error_rgb = error_rgb + re
                error_a = error_a + ae

            if not last:
                rgb_refiner.contribute_unweighted_pw(pw_rot[px], ri)
                a_refiner.contribute_unweighted_pw([a_f[px]], ai)
            rgb_idx.append(ri)
            a_idx.append(ai)

        if fast_indexing:
            if uniform:
                t = agg_rgb[0] + agg_rgb[1]
                t = t + agg_rgb[2]
                error_rgb = t
                error_a = agg_a
            else:
                error_rgb = agg_rgb[0] * cwsq_rows[0]
                for c2 in range(1, 3):
                    error_rgb = error_rgb + agg_rgb[c2] * cwsq_rows[c2]
                error_a = agg_a * a_cwsq

        rank_r = rankt * num_refine_rounds + refine
        for bests, err, eps, idxs in (
            (rgb_best, error_rgb + inv, rgb_ep[0] + rgb_ep[1], rgb_idx),
            (a_best, error_a + inv, alpha_ep, a_idx),
        ):
            better = (err < bests["err"]) | ((err == bests["err"])
                                             & (rank_r < bests["rank"]))
            bests["err"] = jnp.where(better, err, bests["err"])
            bests["rank"] = jnp.where(better, rank_r, bests["rank"])
            for i, e in enumerate(eps):
                bests["ep"][i] = jnp.where(better, e, bests["ep"][i])
            for i, v in enumerate(idxs):
                bests["idx"][i] = jnp.where(better, v, bests["idx"][i])

        if not last:
            r0, r1 = rgb_refiner.get_refined_endpoints_ldr(stacked=False)
            rgb_ep = [list(r0), list(r1)]
            aa0, aa1 = a_refiner.get_refined_endpoints_ldr(stacked=False)
            alpha_ep = [aa0[0], aa1[0]]

    rgb_err_out[:] = rgb_best["err"]
    rgb_rank_out[:] = rgb_best["rank"]
    for i in range(6):
        rgb_ep_out[:, i * k_len:(i + 1) * k_len] = rgb_best["ep"][i]
    for i in range(16):
        rgb_idx_out[:, i * k_len:(i + 1) * k_len] = rgb_best["idx"][i]
    a_err_out[:] = a_best["err"]
    a_rank_out[:] = a_best["rank"]
    for i in range(2):
        a_ep_out[:, i * k_len:(i + 1) * k_len] = a_best["ep"][i]
    for i in range(16):
        a_idx_out[:, i * k_len:(i + 1) * k_len] = a_best["idx"][i]


def dual_plane_best(pix_flat, combos, cw, num_refine_rounds, uniform,
                    fast_indexing, interpret=False):
    """Run the dual-plane kernel for the packed combo x tweak lanes.

    combos: list of dicts with mode/rot/isel/num_tweak/seq (plan-pruned,
    sequence order = the reference's visitation order).

    Returns dict of [N, K]-shaped outputs (K = 128; lane q*4+t holds
    combo q, tweak t): rgb_err/rgb_rank/rgb_ep(6)/rgb_idx(16) and the
    alpha equivalents.
    """
    n = pix_flat.shape[0]
    t_cap = bc7_common.MAX_TWEAK_ROUNDS
    k_len = 128
    assert len(combos) * t_cap <= k_len

    ci_rows = np.zeros((_CI_ROWS, k_len), dtype=np.int32)
    cf_rows = np.zeros((_CF_ROWS, k_len), dtype=np.float32)
    cf_rows[_CF_INV, :] = np.inf
    cf_rows[_CF_RGB_MV, :] = 1.0   # benign defaults for padding lanes
    cf_rows[_CF_A_MV, :] = 1.0
    ci_rows[_CI_RGB_BITS, :] = 5
    ci_rows[_CI_A_BITS, :] = 6

    from ..ops.index_select import WEIGHT_RECIPROCALS

    for q, cb in enumerate(combos):
        mode, rot, isel = cb["mode"], cb["rot"], cb["isel"]
        if mode == 4:
            rgb_prec = 3 if isel else 2
            alpha_prec = 2 if isel else 3
            rgb_qbits, a_qbits, raw = 5, 6, 0
        else:
            rgb_prec = alpha_prec = 2
            rgb_qbits, a_qbits, raw = 7, 8, 1
        rgb_range = 1 << rgb_prec
        alpha_range = 1 << alpha_prec
        rgb_chs = (3 if rot == 1 else 0, 3 if rot == 2 else 1,
                   3 if rot == 3 else 2)
        alpha_ch = (rot + 3) & 3
        for t in range(t_cap):
            k = q * t_cap + t
            valid = t < cb["num_tweak"]
            cf_rows[_CF_INV, k] = 0.0 if valid else np.inf
            ci_rows[_CI_CH0_IS3, k] = 1 if rgb_chs[0] == 3 else 0
            ci_rows[_CI_CH1_IS3, k] = 1 if rgb_chs[1] == 3 else 0
            ci_rows[_CI_CH2_IS3, k] = 1 if rgb_chs[2] == 3 else 0
            ci_rows[_CI_A_SRC0, k] = 1 if alpha_ch == 0 else 0
            ci_rows[_CI_A_SRC1, k] = 1 if alpha_ch == 1 else 0
            ci_rows[_CI_A_SRC2, k] = 1 if alpha_ch == 2 else 0
            ci_rows[_CI_RANKT, k] = t
            ci_rows[_CI_A_RAW, k] = raw
            ci_rows[_CI_RGB_BITS, k] = rgb_qbits
            ci_rows[_CI_A_BITS, k] = a_qbits
            ci_rows[_CI_RGB_MAXI, k] = rgb_range - 1
            ci_rows[_CI_A_MAXI, k] = alpha_range - 1
            cf_rows[_CF_RGB_MV, k] = np.float32(rgb_range - 1)
            cf_rows[_CF_RGB_RECIP, k] = np.float32(
                WEIGHT_RECIPROCALS[rgb_range])
            cf_rows[_CF_A_MV, k] = np.float32(alpha_range - 1)
            cf_rows[_CF_A_RECIP, k] = np.float32(
                WEIGHT_RECIPROCALS[alpha_range])
            cf_rows[_CF_RGB_RCPMAX, k] = (np.float32(1.0)
                                          / np.float32(rgb_range - 1))
            cf_rows[_CF_A_RCPMAX, k] = (np.float32(1.0)
                                        / np.float32(alpha_range - 1))
            for c2 in range(3):
                w = np.float32(cw[rgb_chs[c2]])
                cf_rows[_CF_CW0 + c2, k] = w
                cf_rows[_CF_CWSQ0 + c2, k] = w * w
                cf_rows[_CF_RCW0 + c2, k] = (
                    np.float32(1.0) if w == 0.0
                    else np.float32(1.0) / w)
            wa = np.float32(cw[alpha_ch])
            cf_rows[_CF_A_CWSQ, k] = wa * wa
            rf = lanes.compute_tweak_factors(t, rgb_range)
            af = lanes.compute_tweak_factors(t, alpha_range)
            cf_rows[_CF_RF0, k], cf_rows[_CF_RF1, k] = rf
            cf_rows[_CF_AF0, k], cf_rows[_CF_AF1, k] = af

    kernel = functools.partial(_dual_kernel_body, k_len,
                               num_refine_rounds, uniform, fast_indexing)

    def spec(width):
        return pl.BlockSpec((NB, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(n // NB,),
        in_specs=[spec(64),
                  pl.BlockSpec((_CI_ROWS, k_len), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_CF_ROWS, k_len), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[spec(k_len), spec(k_len), spec(6 * k_len),
                   spec(16 * k_len), spec(k_len), spec(k_len),
                   spec(2 * k_len), spec(16 * k_len)],
        out_shape=[
            jax.ShapeDtypeStruct((n, k_len), jnp.float32),
            jax.ShapeDtypeStruct((n, k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 6 * k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 16 * k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, k_len), jnp.float32),
            jax.ShapeDtypeStruct((n, k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 2 * k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 16 * k_len), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(pix_flat, jnp.asarray(ci_rows), jnp.asarray(cf_rows))
    return dict(rgb_err=outs[0], rgb_rank=outs[1], rgb_ep=outs[2],
                rgb_idx=outs[3], a_err=outs[4], a_rank=outs[5],
                a_ep=outs[6], a_idx=outs[7], k_len=k_len)
