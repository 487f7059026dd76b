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

import os

import jax
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


def _use_pallas_kernel() -> bool:
    """Whether the partitioned-group meta rounds run as the Pallas TPU
    mega-kernel (bc6h_kernel.py). Default: on for TPU backends, off for
    CPU (where the kernel would run interpreted).
    CONVECTION_BC6H_KERNEL=0/1 overrides."""
    env = os.environ.get("CONVECTION_BC6H_KERNEL")
    if env is not None:
        return env != "0"
    return jax.default_backend() in ("tpu", "axon")

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

    The reference computes ceil(f32_div(v*32or64, 31)); the quotient is
    never within an f32 half-ulp of an integer unless it IS one (integer
    gaps are multiples of 1/31 ~ 0.032 >> ulp(65535)/2 ~ 0.004), so the
    ceil of the correctly-rounded division equals the exact rational
    ceil = (v*k + 30) // 31 — verified over the full +-31743 domain.
    XLA lowers the constant-31 division to a multiply-shift, far cheaper
    than the correctly-rounded f32 divide it replaces.
    """
    if is_signed:
        negative = v2cl < 0
        abs_elem = jnp.where(negative, -v2cl, v2cl)
        q = ((abs_elem * 32 + 30) // 31) >> (16 - precision)
        return jnp.where(negative, -q, q)
    q = jnp.minimum((v2cl * 64 + 30) // 31, 65535)
    return q >> (16 - precision)


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

        if fast_indexing:
            # base-class Init with colorSpaceEndpoints = finished EPs —
            # the projection origin/axis are only read by the fast-
            # indexing select, so the exact_divide here is gated (it was
            # ~2.5 ms/chunk of dead work on the default slow path)
            self.origin = [lanes.to_float(finished_ep[0][ch])
                           for ch in range(3)]
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
            import jax as _jax

            # BARRIERED so the interpolants are materialized exactly once:
            # without it XLA re-fuses the reconstruct+TwosCL chain into
            # both consumers' [Q, R, 16, N] iteration spaces, recomputing
            # it per pixel (~6 ms/chunk in the op profile)
            self.interp_unw = _jax.lax.optimization_barrier(
                [lanes.twoscl_half_to_float(recon[ch]) for ch in range(3)])
            # the WEIGHTED interpolators (interp_unw * cw) are computed
            # inline by the selects instead of materialized: the extra
            # per-element multiply is far cheaper than another set of
            # [Q, R, N] HBM round trips per meta round
            self.cw3 = cw

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
                - self.interp_unw[ch] * self.cw3[ch]
            e = d * d
            err = e if err is None else err + e
        # sequential strict-less == first-occurrence argmin over index order
        idx = lanes.first_argmin(err, -2).astype(jnp.int32)
        return self.invert_single(idx)

    def select_slow_batch(self, pix3):
        """select_slow over a batched pixel axis: pix3 is 3 channel arrays
        [1, 16, N]; interpolators are [Q, R, N]. Returns the UNINVERTED
        index [Q, 16, N] via a one-pass (value, index) lexicographic
        reduce (identical winner to the per-pixel strict-less argmin;
        same f32 distance arithmetic)."""
        err = None
        for ch in range(3):
            d = pix3[ch][:, None, :, :] \
                - (self.interp_unw[ch] * self.cw3[ch])[:, :, None, :]
            e = d * d
            err = e if err is None else err + e          # [Q,R,16,N]
        _, idx = lanes.lex_min_with_index(err, 1)
        return idx

    def select_and_error_slow_batch(self, pix3_lin, pix3_unw, cw_sq,
                                    uniform):
        """Fused SelectIndexHDRSlow + ComputeErrorHDRSlow over the batched
        pixel axis: ONE (value, index, payload) reduce over the R axis
        carries the slow error of the winning interpolant out of the same
        pass (bit-identical to selecting first, then gathering — the
        payload is the exact per-r error element). With no other consumer
        of the interpolant arrays, XLA keeps them entirely inside this
        fusion. Returns (uninverted index [Q,16,N], slow error [Q,16,N]).
        """
        err1 = None
        err2 = None
        for ch in range(3):
            d = pix3_lin[ch][:, None, :, :] \
                - (self.interp_unw[ch] * self.cw3[ch])[:, :, None, :]
            e = d * d
            err1 = e if err1 is None else err1 + e       # [Q,R,16,N]
            d2 = self.interp_unw[ch][:, :, None, :] - pix3_unw[ch][:, None]
            e2 = d2 * d2
            if not uniform:
                e2 = e2 * cw_sq[ch]
            err2 = e2 if err2 is None else err2 + e2
        _, idx, err2_sel = lanes.lex_min_with_payload(err1, [err2], 1)
        return idx, err2_sel

    def select_fast_batch(self, pix3):
        """select_fast over a batched pixel axis (UNINVERTED [Q, 16, N])."""
        dist = None
        for ch in range(3):
            t = (pix3[ch][:, :, :] - self.origin[ch][:, None, :]) \
                * self.axis[ch][:, None, :]
            dist = t if dist is None else dist + t
        return lanes.round_and_convert_to_int_nearest(
            lanes.clamp(dist, 0.0, self.max_value))

    def slow_error_batch(self, idx_unv, pix3_unw, cw_sq, uniform):
        """ComputeErrorHDRSlow over the batched pixel axis: gather each
        channel's interpolant at the UNINVERTED index with one shared
        R-step where-chain (one compare per step for all channels),
        then the weighted squared 2CL difference."""
        sel = [self.interp_unw[ch][:, 0, None, :] for ch in range(3)]
        sel = [jnp.broadcast_to(s, idx_unv.shape) for s in sel]
        for r in range(1, self.range):
            mr = idx_unv == r
            for ch in range(3):
                sel[ch] = jnp.where(mr, self.interp_unw[ch][:, r, None, :],
                                    sel[ch])
        err = None
        for ch in range(3):
            d = sel[ch] - pix3_unw[ch]
            e = d * d
            if not uniform:
                e = e * cw_sq[ch]
            err = e if err is None else err + e
        return err                                       # [Q,16,N]

    def reconstruct_batch(self, idx_unv):
        """ReconstructHDR*Uninverted over the batched pixel axis."""
        ep_flat = [self.endpoints[0][ch][:, None, :] for ch in range(3)] + \
            [self.endpoints[1][ch][:, None, :] for ch in range(3)]
        return self._reconstruct_uninverted(ep_flat, idx_unv)

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

    # pixel-axis stacks [1, 16, N] for the batched per-round selection
    # (the per-pixel Python loop dominated the op-level profile: 16 px x
    # 12 rounds x 6 groups of small [Q, N] fusions and two-pass argmins)
    def _stack16(rows):
        return [jnp.stack([rows[px][ch] for px in range(16)],
                          axis=0)[None, :, :] for ch in range(3)]

    flinw_s = _stack16(flinw)
    f2cl_s = _stack16(f2cl)
    f2cl_unw_s = _stack16(f2cl_unw)
    pixels_s = _stack16(pixels)

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

    # Pallas kernel gate for the partitioned groups (bc6h_kernel.py):
    # the meta-round chain runs in VMEM per NB-block tile; the combine
    # below is unchanged. Kernel-vs-graph byte equality is pinned by
    # tests/test_bc6h_kernel.py.
    from . import bc6h_kernel
    kernel_ok = _use_pallas_kernel() and n % bc6h_kernel.NB == 0
    kernel_interpret = jax.default_backend() not in ("tpu", "axon")
    pix_flat48 = None
    if kernel_ok:
        pix_flat48 = jnp.stack(
            [pixels[px][ch] for px in range(16) for ch in range(3)], axis=0)

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

        # Q rows are SUBSET-MAJOR (q = s*num_parts + p): the combine's
        # per-subset slices are then contiguous [P, N] halves instead of
        # stride-2 sublane copies
        cols_sm = cols.T.reshape(-1)
        base = [jnp.take(ufep_base[ch], jnp.asarray(cols_sm),
                         axis=1).T for ch in range(3)]          # [Q, N]
        offset = [jnp.take(ufep_offset[ch], jnp.asarray(cols_sm),
                           axis=1).T for ch in range(3)]

        shape_q = (q_count, n)
        zero_f = jnp.zeros(shape_q, dtype=jnp.float32)

        meta_eps = []       # per metaRound: [6, Q, N] stacked encoded eps
        meta_indexes = []   # per metaRound: [Q,16,N] (graph path only)
        meta_idx_packed = []  # per metaRound: [2, Q, N] (kernel path only)
        meta_error = []     # per metaRound: [Q,N]
        meta_valid = []     # per metaRound: [Q,N] bool

        sub_mask_sm = sub_mask.transpose(1, 0, 2).reshape(q_count, 16)
        member_ps = [jnp.asarray(sub_mask_sm[:, px][:, None])
                     for px in range(16)]            # [Q,1]
        member3 = jnp.asarray(sub_mask_sm)[:, :, None]

        use_kernel = kernel_ok and partitioned
        if use_kernel:
            active = tuple(
                (t * MAX_REFINE_ROUNDS + r, t, r,
                 r == num_refine_rounds - 1)
                for t in range(num_tweak_rounds)
                for r in range(num_refine_rounds))
            err_k, valid_k, eps_k, idx_k = \
                bc6h_kernel.partitioned_group_meta_rounds(
                    pix_flat48, base, offset, aprec, is_signed,
                    fast_indexing, uniform, cw, cw_sq, active,
                    num_refine_rounds, index_range, sub_mask_sm,
                    fixups.T.reshape(q_count),
                    interpret=kernel_interpret)
            pos_of = {m: p for p, (m, _, _, _) in enumerate(active)}
            for m in range(max_meta):
                if m in pos_of:
                    p_ = pos_of[m]
                    meta_eps.append(eps_k[p_])
                    meta_error.append(err_k[p_])
                    meta_valid.append(valid_k[p_])
                    meta_idx_packed.append(idx_k[p_])
                else:
                    meta_eps.append(None)
                    meta_error.append(None)
                    meta_valid.append(jnp.zeros(shape_q, dtype=bool))
                    meta_idx_packed.append(None)
                meta_indexes.append(None)

        for tweak in range(MAX_TWEAK_ROUNDS if not use_kernel else 0):
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
                unq = [[u_st[e * 3 + ch] for ch in range(3)]
                       for e in range(2)]
                fin = [[f_st[e * 3 + ch] for ch in range(3)]
                       for e in range(2)]

                selector = _HDRIndexSelector(cw, unq, fin, index_range,
                                             is_signed, fast_indexing)

                # batched UNINVERTED selection for all 16 pixels at once;
                # the fixup pixel's index is one of them (static one-hot
                # over the pixel axis), so the separate fix-pixel select
                # of the scalar flow is just a masked sum here
                if fast_indexing:
                    idx_unv = selector.select_fast_batch(f2cl_s)
                else:
                    # NOTE: a fused (value, index, error-payload) variadic
                    # reduce was tried here and lowered ~2x SLOWER than
                    # the two-step select + where-chain gather (XLA:TPU
                    # handles 2-operand variadic reduces well, 3-operand
                    # ones poorly) — keep the two-step form
                    idx_unv = selector.select_slow_batch(flinw_s)
                    slow_err = selector.slow_error_batch(
                        idx_unv, f2cl_unw_s, cw_sq, uniform)

                fix_onehot = jnp.asarray(
                    (fixups.T.reshape(q_count)[:, None]
                     == np.arange(16)[None, :]))            # [Q,16] static
                fix_index_unv = jnp.sum(
                    jnp.where(fix_onehot[:, :, None], idx_unv, 0), axis=1)

                half_range_m1 = index_range // 2 - 1
                invert = fix_index_unv > half_range_m1      # [Q,N]
                idx = jnp.where(invert[:, None, :],
                                (index_range - 1) - idx_unv, idx_unv)
                selector.conditional_invert(invert)
                # endpoint swap on the stacked [6, Q, N] array (one where)
                q_st_sw = jnp.where(
                    invert[None, :, :],
                    q_st[jnp.asarray([3, 4, 5, 0, 1, 2])], q_st)

                # dedup vs previous meta rounds (BC67.cpp:2853-2877):
                # one all-6-equal reduce per previous round
                valid = jnp.ones(shape_q, dtype=bool)
                for prev in range(meta_round):
                    if meta_eps[prev] is None:
                        continue
                    valid = valid & ~jnp.all(meta_eps[prev] == q_st_sw,
                                             axis=0)

                # per-pixel error on the batched axis
                if fast_indexing:
                    recon = selector.reconstruct_batch(idx_unv)
                    err = None
                    for ch in range(3):
                        d = recon[ch] - pixels_s[ch]
                        e = lanes.to_float(d * d)
                        if not uniform:
                            e = e * cw_sq[ch]
                        err = e if err is None else err + e
                else:
                    err = slow_err

                # sequential per-pixel accumulation (reference f32 order).
                # NOTE: a batched [Q,16,N] refiner contribution was tried
                # and regressed ~8 ms/chunk — XLA materialized all six
                # masked term arrays instead of fusing them into the
                # accumulator chains; the per-pixel form fuses cleanly.
                subset_error = zero_f
                for px in range(16):
                    subset_error = subset_error + jnp.where(
                        member_ps[px], err[:, px, :], np.float32(0.0))
                    if refine_pass != num_refine_rounds - 1:
                        refiner.contribute_unweighted_pw(
                            [pw_pixels[px][ch][None, :]
                             for ch in range(3)], idx[:, px, :],
                            mask=member_ps[px] & valid)

                meta_eps.append(q_st_sw)    # [6, Q, N]
                meta_indexes.append(idx)          # [Q, 16, N]
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
            """[Q,N] -> the [P,N] rows of subset s (contiguous half)."""
            return arr.reshape(num_subsets, num_parts, n)[s]

        def stack_meta(get):
            """[len(valid_rounds),P,N] from per-round [P,N] slices —
            meta axes LEADING so the pair grids below keep (P, N) on the
            (sublane, lane) tile dims with zero padding (a [P,M,M,N]
            layout padded the 12-wide M axis to a 16-row tile)."""
            return jnp.stack([get(m) for m in valid_rounds], axis=0)

        err0_all = stack_meta(lambda m: subset_slice(meta_error[m], 0))
        val0_all = stack_meta(lambda m: subset_slice(meta_valid[m], 0))
        ep0_all = [[stack_meta(
            lambda m: subset_slice(meta_eps[m][e * 3 + ch], 0))
            for ch in range(3)] for e in range(2)]
        if partitioned:
            err1_all = stack_meta(lambda m: subset_slice(meta_error[m], 1))
            val1_all = stack_meta(lambda m: subset_slice(meta_valid[m], 1))
            ep1_all = [[stack_meta(
                lambda m: subset_slice(meta_eps[m][e * 3 + ch], 1))
                for ch in range(3)] for e in range(2)]
            totals = err0_all[:, None, :, :] + err1_all[None, :, :, :]
            valid_pair = val0_all[:, None, :, :] & val1_all[None, :, :, :]
        else:
            totals = err0_all[:, None, :, :]
            valid_pair = val0_all[:, None, :, :]

        m_count = len(valid_rounds)
        m1_count = m_count if partitioned else 1

        # legality per mode (EvaluatePartitioned/SingleLegality,
        # BC67.cpp:2597-2663), any-mode-legal gate for candidate validity
        a_mask = (1 << aprec) - 1
        # Delta-legality via one bit test per (delta, mode): the original
        # form — delta = TruncateToPrecisionSigned(v - ep00, b);
        # ((delta + ep00) & a_mask) == (v & a_mask) — is equivalent to
        # ((v - ep00 + 2^(b-1)) & ((1<<aprec) - (1<<b))) == 0
        # (bits b..aprec-1 of the half-up-biased difference must be zero;
        # brute-force verified over the signed endpoint range for every
        # (aprec, b) pair in HDR_MODES). The differences are shared
        # across modes, so the [P, M0, M1, N] grids carry 3 ops per
        # (channel, endpoint, mode) instead of ~7.
        ep00 = [ep0_all[0][ch][:, None, :, :] for ch in range(3)]
        d0 = [ep0_all[1][ch][:, None, :, :] - ep00[ch] for ch in range(3)]
        if partitioned:
            d1 = [[ep1_all[e][ch][None, :, :, :] - ep00[ch]
                   for ch in range(3)] for e in range(2)]
        any_legal = None
        for mode_idx in mode_list:
            _, _, transformed, _, bprec = HDR_MODES[mode_idx]
            if not transformed:
                legal = jnp.ones_like(valid_pair)
            else:
                legal = None
                for ch in range(3):
                    half = 1 << (bprec[ch] - 1)
                    hi_mask = (1 << aprec) - (1 << bprec[ch])
                    # subset 0 ep1 (depends on meta0 only)
                    ok = ((d0[ch] + half) & hi_mask) == 0
                    legal = ok if legal is None else legal & ok
                    if partitioned:
                        for e in range(2):
                            ok = ((d1[e][ch] + half) & hi_mask) == 0
                            legal = legal & ok
            any_legal = legal if any_legal is None else any_legal | legal

        cand_err = jnp.where(valid_pair & any_legal, totals, INF)

        # ordered argmin over the [M0, M1, P, N] grid with the flat index
        # in (P, M0, M1) visitation-rank order (axes=(2,0,1): P carries
        # the largest stride); one-pass (value, index) reduce
        win_err, win = lanes.lex_min_with_index(cand_err, (2, 0, 1))

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
            """arr [M,P,N] -> [N] at (m_pos, win_part), as a masked sum
            over the M*P rows (take_along_axis would serial-gather)."""
            flat_arr = arr.reshape(-1, n)
            idx = m_pos * num_parts + win_part
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

        # winner indexes straight off the per-round [Q, 16, N] arrays:
        # for pixel px the winner lives at row q = (win_part, owning
        # subset) of the owning subset's winning round — exactly one
        # (q, round) pair matches per (px, block), so a per-round masked
        # sum replaces the former 32 [P,M,N] stacks + 32 masked-sum
        # gathers (the dominant combine cost in the op profile)
        if use_kernel:
            # Winner indexes from the kernel's packed 3-bit words: gather
            # each subset's winning-round words at the winning partition
            # row ([P,N] masked sums), then unpack per pixel by the
            # partition map's subset bit. Exactly one (p, round) matches
            # per (subset, block), as in the unpacked form below.
            sel_p = jnp.asarray(np.arange(num_parts, dtype=np.int32)
                                )[:, None] == win_part[None, :]   # [P,N]
            words = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]
            for pos, m in enumerate(valid_rounds):
                w_lo, w_hi = meta_idx_packed[m][0], meta_idx_packed[m][1]
                hit0 = sel_p & (win_m0_pos[None, :] == pos)
                hit1 = sel_p & (win_m1_pos[None, :] == pos)
                words[0] = words[0] + jnp.sum(
                    jnp.where(hit0, w_lo[:num_parts], 0), axis=0)
                words[1] = words[1] + jnp.sum(
                    jnp.where(hit0, w_hi[:num_parts], 0), axis=0)
                words[2] = words[2] + jnp.sum(
                    jnp.where(hit1, w_lo[num_parts:], 0), axis=0)
                words[3] = words[3] + jnp.sum(
                    jnp.where(hit1, w_hi[num_parts:], 0), axis=0)
            pmap = _lut(np.asarray(geom.PARTITION_MAP_2, dtype=np.int32),
                        win_part)
            idx_px = []
            for px in range(16):
                sbit = (pmap >> px) & 1
                if px < 10:
                    w = jnp.where(sbit == 1, words[2], words[0])
                    idx_px.append((w >> (3 * px)) & 7)
                else:
                    w = jnp.where(sbit == 1, words[3], words[1])
                    idx_px.append((w >> (3 * (px - 10))) & 7)
        else:
            q_part = jnp.asarray(np.tile(
                np.arange(num_parts, dtype=np.int32), num_subsets))[:, None]
            q_sub = jnp.asarray(np.repeat(
                np.arange(num_subsets, dtype=np.int32), num_parts))[:, None]
            own_q_px = jnp.asarray(sub_mask.transpose(1, 0, 2).reshape(
                q_count, 16))[:, :, None]
            sel_part = q_part == win_part[None, :]              # [Q,N]
            if partitioned:
                msel = jnp.where(q_sub == 0, win_m0_pos[None, :],
                                 win_m1_pos[None, :])           # [Q,N]
            else:
                msel = jnp.broadcast_to(win_m0_pos[None, :], (q_count, n))
            idx16 = None
            for pos, m in enumerate(valid_rounds):
                sel_m = (sel_part & (msel == pos))[:, None, :] & own_q_px
                contrib = jnp.sum(jnp.where(sel_m, meta_indexes[m], 0),
                                  axis=0)                       # [16,N]
                idx16 = contrib if idx16 is None else idx16 + contrib
            idx_px = [idx16[px] for px in range(16)]

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

    if _skip_combine:
        # profiling hook: thread the accumulated error bits into the
        # packer's index payload so the meta-round work cannot be DCE'd
        # (the output is meaningless; only device timing is read)
        err_bits = jax.lax.bitcast_convert_type(best.error, jnp.int32)
        best.payload["idx"] = jnp.broadcast_to((err_bits & 7)[:, None],
                                               (n, 16))

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
