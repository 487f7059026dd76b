"""S3TC (BC1-BC5) encoders.

TPU-native reimplementation of the reference's S3TCComputer
(/root/reference/ConvectionKernels_S3TC.cpp). Every function operates on a
batch of N blocks at once (leading axis), the generalization of the
reference's 8 SSE2 lanes; all per-lane branching becomes masked selects.
Candidate iteration order (range x tweak x refine) and float32 operation
order mirror the reference exactly, so encoded blocks are bit-identical to
the scalar reference build.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import lanes
from ..ops import pca
from ..ops.index_select import IndexSelector, aggregated_error_finalize
from ..ops.refine import EndpointRefiner
from ..options import Flags


def quantize_to_5bits(v):
    """QuantizeTo5Bits (S3TC.cpp:58-62): multiply-shift + bit-replication."""
    reduced = (v * 249 + 1024) >> 11
    return (reduced << 3) | (reduced >> 2)


def quantize_to_6bits(v):
    """QuantizeTo6Bits (S3TC.cpp:52-56)."""
    reduced = (v * 253 + 512) >> 10
    return (reduced << 2) | (reduced >> 4)


def quantize_to_565(ep):
    """QuantizeTo565 (S3TC.cpp:64-69)."""
    return [quantize_to_5bits(ep[0]), quantize_to_6bits(ep[1]),
            quantize_to_5bits(ep[2])]


def paranoid_factor_for_span(span):
    """ParanoidFactorForSpan (S3TC.cpp:71-74)."""
    return jnp.abs(lanes.to_float(span)) * np.float32(0.03)


def paranoid_diff(a, b, d):
    """ParanoidDiff (S3TC.cpp:76-81)."""
    abs_diff = jnp.abs(lanes.to_float(a - b))
    abs_diff = abs_diff + d
    return abs_diff * abs_diff


class _Best:
    """Lane-parallel best-candidate state (endpoints, indexes, range, error)."""

    def __init__(self, zero_i, zero_f):
        self.error = jnp.full_like(zero_f, lanes.FLT_MAX)
        self.endpoints = [[zero_i] * 3 for _ in range(2)]
        self.indexes = [zero_i] * 16
        self.range = zero_i

    def update(self, better, error, endpoints, indexes, range_: int):
        self.error = jnp.where(better, error, self.error)
        for ep in range(2):
            for ch in range(3):
                self.endpoints[ep][ch] = jnp.where(
                    better, endpoints[ep][ch], self.endpoints[ep][ch])
        for px in range(16):
            self.indexes[px] = jnp.where(better, indexes[px], self.indexes[px])
        self.range = jnp.where(better, range_, self.range)


def _test_endpoints(flags, pixels, float_pixels, pw_pixels, unquantized_eps,
                    range_: int, cw, cw_sq, best: _Best, refiner):
    """TestEndpoints (S3TC.cpp:190-258)."""
    endpoints = [quantize_to_565(unquantized_eps[0]),
                 quantize_to_565(unquantized_eps[1])]

    selector = IndexSelector(cw, endpoints, range_, 3)

    paranoid = bool(flags & Flags.S3TC_PARANOID)
    uniform = bool(flags & Flags.UNIFORM)

    if paranoid:
        paranoid_factors = [
            paranoid_factor_for_span(endpoints[0][ch] - endpoints[1][ch])
            for ch in range(3)
        ]

    error = jnp.zeros_like(best.error)
    agg = [jnp.zeros_like(best.range)] * 3
    indexes = []
    for px in range(16):
        index = selector.select_index_ldr(float_pixels[px])
        indexes.append(index)

        if refiner is not None:
            refiner.contribute_unweighted_pw(pw_pixels[px], index)

        reconstructed = selector.reconstruct_ldr_precise(index)

        if paranoid:
            for ch in range(3):
                error = error + paranoid_diff(
                    reconstructed[ch], pixels[px][ch],
                    paranoid_factors[ch]) * cw_sq[ch]
        else:
            for ch in range(3):
                agg[ch] = agg[ch] + lanes.sq_diff_int(
                    reconstructed[ch], pixels[px][ch])

    if not paranoid:
        error = aggregated_error_finalize(agg, uniform, cw_sq)

    better = error < best.error
    best.update(better, error, endpoints, indexes, range_)


def _test_single_color(flags, pixels, range_: int, cw_sq, best: _Best,
                       tables):
    """TestSingleColor (S3TC.cpp:83-188). `tables` from tables.s3tc_single_color."""
    paranoid = bool(flags & Flags.S3TC_PARANOID)

    totals = [jnp.zeros_like(best.range)] * 3
    for px in range(16):
        for ch in range(3):
            totals[ch] = totals[ch] + pixels[px][ch]
    average = [(totals[ch] + 8) >> 4 for ch in range(3)]

    suffix = ("_p" if paranoid else "")
    key = f"{range_ - 1}{suffix}"
    rb_table = tables[f"5_{key}"]  # [256, 4]: min, max, actualColor, span
    g_table = tables[f"6_{key}"]

    eps = [[None] * 3, [None] * 3]
    interpolated = [None] * 3
    spans = [None] * 3
    for ch in range(3):
        table = g_table if ch == 1 else rb_table
        entry = jnp.take(table, average[ch], axis=0)
        eps[0][ch] = entry[..., 0]
        eps[1][ch] = entry[..., 1]
        interpolated[ch] = entry[..., 2]
        spans[ch] = entry[..., 3]

    error = jnp.zeros_like(best.error)
    if paranoid:
        span_factors = [paranoid_factor_for_span(spans[ch]) for ch in range(3)]
        for px in range(16):
            for ch in range(3):
                error = error + paranoid_diff(
                    interpolated[ch], pixels[px][ch],
                    span_factors[ch]) * cw_sq[ch]
    else:
        for px in range(16):
            for ch in range(3):
                error = error + lanes.to_float(lanes.sq_diff_int(
                    interpolated[ch], pixels[px][ch])) * cw_sq[ch]

    better = error < best.error
    one = jnp.ones_like(best.range)
    best.update(better, error, eps, [one] * 16, range_)


def pack_rgb(pixels_u8, flags: int, channel_weights, alpha_test: bool,
             alpha_threshold: float, exhaustive: bool, max_tweak_rounds: int,
             num_refine_rounds: int, sc_tables=None):
    """PackRGB (S3TC.cpp:717-1052). Returns uint8 [N, 8] BC1 color blocks.

    pixels_u8: uint8/int32 [N, 16, 4] RGBA blocks.
    """
    num_refine_rounds = max(num_refine_rounds, 1)
    max_tweak_rounds = max(max_tweak_rounds, 1)

    p = jnp.asarray(pixels_u8, dtype=jnp.int32)
    n = p.shape[0]
    zero_i = jnp.zeros((n,), dtype=jnp.int32)
    zero_f = jnp.zeros((n,), dtype=jnp.float32)

    cw = [np.float32(w) for w in channel_weights]
    cw_sq = [w * w for w in cw]

    pixels = [[p[:, px, ch] for ch in range(4)] for px in range(16)]

    if alpha_test:
        # threshold computed in float32 exactly as the C++ float expression
        thr = int(np.floor(np.float32(alpha_threshold) * np.float32(255.0)
                           + np.float32(0.5)))
        for px in range(16):
            below = pixels[px][3] < thr
            pixels[px][3] = jnp.where(below, 0, 255)

    float_pixels = [[lanes.to_float(pixels[px][ch]) for ch in range(4)]
                    for px in range(16)]
    pw_pixels = [[float_pixels[px][ch] * cw[ch] for ch in range(4)]
                 for px in range(16)]

    pixel_weights = []
    for px in range(16):
        w = jnp.full_like(zero_f, np.float32(1.0))
        if alpha_test:
            transparent = pixels[px][3] < 255
            w = jnp.where(transparent, np.float32(0.0), w)
        pixel_weights.append(w)

    centroid, direction, min_d, max_d = pca.endpoint_selector(
        pw_pixels, pixel_weights, 3)
    base, offset = pca.get_endpoints(centroid, direction, min_d, max_d, cw, 3)

    best = _Best(zero_i, zero_f)

    if exhaustive:
        _pack_rgb_exhaustive(flags, pixels, float_pixels, pw_pixels, base,
                             offset, cw, cw_sq, alpha_test, best, sc_tables,
                             zero_i, zero_f)
    else:
        min_range = 3 if alpha_test else 4
        for range_ in range(min_range, 5):
            tweak_rounds = min(lanes.tweak_rounds_for_range(range_),
                               max_tweak_rounds)
            for tweak in range(tweak_rounds):
                eps = pca.finish_ldr(base, offset, tweak, range_, 3)
                endpoints = [eps[0], eps[1]]
                for refine in range(num_refine_rounds):
                    refiner = EndpointRefiner(zero_f, 3, range_, cw)
                    _test_endpoints(flags, pixels, float_pixels, pw_pixels,
                                    endpoints, range_, cw, cw_sq, best,
                                    refiner)
                    if refine != num_refine_rounds - 1:
                        e0, e1 = refiner.get_refined_endpoints_ldr()
                        endpoints = [e0, e1]

    return _pack_bc1_blocks(best)


def _pack_rgb_exhaustive(flags, pixels, float_pixels, pw_pixels, base, offset,
                         cw, cw_sq, alpha_test, best, sc_tables, zero_i,
                         zero_f):
    """Exhaustive cluster-fit path (S3TC.cpp:798-935).

    Sorts pixels along an 11-bit projection and least-squares fits every
    count-partition of the sorted order.
    """
    # 11-bit sort keys with original index packed in the low 4 bits
    sort_ep = pca.finish_ldr(base, offset, 0, 11, 3)
    sort_selector = IndexSelector(cw, [sort_ep[0], sort_ep[1]], 1 << 11, 3)

    sort_bins = []
    for px in range(16):
        bin_ = sort_selector.select_index_ldr(float_pixels[px]) << 4
        if alpha_test:
            transparent = pixels[px][3] < 255
            bin_ = jnp.where(transparent, -16, bin_)
        sort_bins.append(bin_ + px)

    # insertion-sort network (S3TC.cpp:830-843): exact same comparator order
    for sort_end in range(1, 16):
        for sort_loc in range(sort_end, 0, -1):
            a = sort_bins[sort_loc]
            b = sort_bins[sort_loc - 1]
            sort_bins[sort_loc] = jnp.maximum(a, b)
            sort_bins[sort_loc - 1] = jnp.minimum(a, b)

    first_element = zero_i
    for e in range(16):
        invalid = sort_bins[e] < 0
        first_element = jnp.where(invalid, e + 1, first_element)
    num_elements = 16 - first_element

    # Scatter sorted pixels: sortedInputs[15-e] = pixels[sortBin[e] & 15]
    # for e >= firstElement; zero elsewhere (S3TC.cpp:845-878).
    px_stack = [jnp.stack([pixels[px][ch] for px in range(16)], axis=-1)
                for ch in range(4)]  # [N, 16] per channel
    sorted_inputs = [[None] * 4 for _ in range(16)]
    for e in range(16):
        valid = e >= first_element  # bool [N]
        orig = sort_bins[e] & 15
        for ch in range(4):
            gathered = jnp.take_along_axis(
                px_stack[ch], orig[:, None], axis=1)[:, 0]
            sorted_inputs[15 - e][ch] = jnp.where(valid, gathered, 0)

    float_sorted = [[lanes.to_float(sorted_inputs[e][ch]) for ch in range(4)]
                    for e in range(16)]
    pw_float_sorted = [[float_sorted[e][ch] * cw[ch] for ch in range(4)]
                       for e in range(16)]

    def test_counts_batched(counts_list, n_counts):
        """TestCounts over all count-partitions at once (S3TC.cpp:260-301).

        counts_list: static [P, n_counts] in the reference's visitation
        order. Per-lane escape semantics: a lane stops contributing once a
        count group overruns numElements; element n of group i contributes
        only while n < numElements.
        """
        counts_arr = np.asarray(counts_list, dtype=np.int32)  # [P, nc]
        p_count = counts_arr.shape[0]
        n = zero_i.shape[0]

        # element slot -> (group index, within-group position), static
        grp = np.zeros((p_count, 16), dtype=np.int32)
        pos = np.zeros((p_count, 16), dtype=np.int32)
        for p_i in range(p_count):
            e = 0
            for i in range(n_counts):
                for n_in in range(counts_arr[p_i, i]):
                    grp[p_i, e] = i
                    pos[p_i, e] = n_in
                    e += 1

        # prefix_ok[:, :, i] = all groups before i fit within numElements
        ne = num_elements[:, None]  # [N, 1]
        prefix_ok_by_group = [jnp.ones((n, p_count), dtype=bool)]
        for i in range(n_counts - 1):
            fits = jnp.asarray(counts_arr[:, i])[None, :] <= ne
            prefix_ok_by_group.append(prefix_ok_by_group[-1] & fits)

        rcp_max = np.float32(1.0) / np.float32(n_counts - 1)
        tv = [jnp.zeros((n, p_count), dtype=jnp.float32) for _ in range(3)]
        vv = [jnp.zeros((n, p_count), dtype=jnp.float32) for _ in range(3)]
        tt = jnp.zeros((n, p_count), dtype=jnp.float32)
        tsum = jnp.zeros((n, p_count), dtype=jnp.float32)
        wu = jnp.zeros((n, p_count), dtype=jnp.int32)
        grp_j = jnp.asarray(grp)
        pos_j = jnp.asarray(pos)
        for e in range(16):
            i_e = grp_j[:, e][None, :]        # [1, P] static
            n_e = pos_j[:, e][None, :]
            pref = prefix_ok_by_group[0]
            for i in range(1, n_counts):
                pref = jnp.where(i_e == i, prefix_ok_by_group[i], pref)
            mask = pref & (n_e < ne)
            t = lanes.to_float(i_e) * rcp_max
            for ch in range(3):
                v = pw_float_sorted[e][ch][:, None]
                tv[ch] = tv[ch] + jnp.where(mask, t * v, np.float32(0.0))
                vv[ch] = vv[ch] + jnp.where(mask, v, np.float32(0.0))
            tt = tt + jnp.where(mask, t * t, np.float32(0.0))
            tsum = tsum + jnp.where(mask, t, np.float32(0.0))
            wu = wu + mask.astype(jnp.int32)

        refiner = EndpointRefiner(jnp.zeros((n, p_count), jnp.float32), 3,
                                  n_counts, cw)
        refiner.tv, refiner.v, refiner.tt, refiner.t, refiner.wu = \
            tv, vv, tt, tsum, wu
        e0, e1 = refiner.get_refined_endpoints_ldr()

        err, eps_w, idx_w = _test_endpoints_batch(
            flags, pixels, float_pixels, [e0, e1], n_counts, cw, cw_sq)
        win = lanes.first_argmin(err, -1)  # first occurrence = visitation order

        def g(x):
            return jnp.take_along_axis(x, win[:, None], axis=1)[:, 0]

        better = g(err) < best.error
        best.update(better, g(err),
                    [[g(eps_w[e][ch]) for ch in range(3)] for e in range(2)],
                    [g(idx_w[px]) for px in range(16)], n_counts)

    counts4 = []
    for n0 in range(16):
        remaining_for1 = 16 - n0
        if remaining_for1 == 16:
            remaining_for1 = 15
        for n1 in range(remaining_for1 + 1):
            remaining_for2 = 16 - n1 - n0
            if remaining_for2 == 16:
                remaining_for2 = 15
            for n2 in range(remaining_for2 + 1):
                n3 = 16 - n2 - n1 - n0
                if n3 == 16:
                    continue
                counts4.append([n0, n1, n2, n3])
    test_counts_batched(counts4, 4)

    _test_single_color(flags, pixels, 4, cw_sq, best, sc_tables)

    if alpha_test:
        counts3 = []
        for n0 in range(16):
            remaining_for1 = 16 - n0
            if remaining_for1 == 16:
                remaining_for1 = 15
            for n1 in range(remaining_for1 + 1):
                n2 = 16 - n1 - n0
                if n2 == 16:
                    continue
                counts3.append([n0, n1, n2])
        test_counts_batched(counts3, 3)

        _test_single_color(flags, pixels, 3, cw_sq, best, sc_tables)


def _test_endpoints_batch(flags, pixels, float_pixels, unquantized_eps,
                          range_: int, cw, cw_sq):
    """TestEndpoints (S3TC.cpp:190-258) over a trailing candidate axis.

    unquantized_eps: [2] lists of 3 arrays [N, P]. Returns
    (error [N,P], endpoints [2][3] of [N,P], indexes 16 of [N,P])."""
    endpoints = [quantize_to_565(unquantized_eps[0]),
                 quantize_to_565(unquantized_eps[1])]
    selector = IndexSelector(cw, endpoints, range_, 3)

    paranoid = bool(flags & Flags.S3TC_PARANOID)
    uniform = bool(flags & Flags.UNIFORM)

    if paranoid:
        factors = [paranoid_factor_for_span(endpoints[0][ch]
                                            - endpoints[1][ch])
                   for ch in range(3)]

    error = jnp.zeros_like(endpoints[0][0], dtype=jnp.float32)
    agg = [jnp.zeros_like(endpoints[0][0]) for _ in range(3)]
    indexes = []
    for px in range(16):
        fpx = [float_pixels[px][ch][:, None] for ch in range(3)]
        index = selector.select_index_ldr(fpx)
        indexes.append(index)
        recon = selector.reconstruct_ldr_precise(index)
        if paranoid:
            for ch in range(3):
                error = error + paranoid_diff(
                    recon[ch], pixels[px][ch][:, None],
                    factors[ch]) * cw_sq[ch]
        else:
            for ch in range(3):
                agg[ch] = agg[ch] + lanes.sq_diff_int(
                    recon[ch], pixels[px][ch][:, None])

    if not paranoid:
        error = aggregated_error_finalize(agg, uniform, cw_sq)
    return error, endpoints, indexes


def pack_explicit_alpha(pixels_u8, channel: int):
    """PackExplicitAlpha (S3TC.cpp:303-341): BC2 4-bit alpha. -> uint8 [N, 8]."""
    p = jnp.asarray(pixels_u8, dtype=jnp.int32)
    pixels = [p[:, px, channel] for px in range(16)]
    float_pixels = [lanes.to_float(v) for v in pixels]

    zero_i = jnp.zeros_like(pixels[0])
    eps = [[zero_i], [jnp.full_like(zero_i, 255)]]
    selector = IndexSelector([1.0], eps, 16, 1)

    byte_cols = []
    for px in range(0, 16, 2):
        i0 = selector.select_index_ldr([float_pixels[px]])
        i1 = selector.select_index_ldr([float_pixels[px + 1]])
        byte_cols.append(i0 | (i1 << 4))
    return jnp.stack(byte_cols, axis=-1).astype(jnp.uint8)


def pack_interpolated_alpha(pixels_u8, channel: int, is_signed: bool,
                            max_tweak_rounds: int, num_refine_rounds: int):
    """PackInterpolatedAlpha (S3TC.cpp:343-715): BC3 alpha / BC4 / BC5 channel.

    pixels_u8: [N, 16, 4] blocks (signed inputs already biased into unsigned
    space by the caller, Util::BiasSignedInput). Returns uint8 [N, 8].
    """
    max_tweak_rounds = max(max_tweak_rounds, 1)
    num_refine_rounds = max(num_refine_rounds, 1)

    p = jnp.asarray(pixels_u8, dtype=jnp.int32)
    n = p.shape[0]
    zero_i = jnp.zeros((n,), dtype=jnp.int32)
    zero_f = jnp.zeros((n,), dtype=jnp.float32)
    one_weight = [1.0]

    high_terminal = 254 if is_signed else 255

    pixels = []
    for px in range(16):
        v = p[:, px, channel]
        if is_signed:
            v = jnp.minimum(v, high_terminal)
        pixels.append(v)
    float_pixels = [lanes.to_float(v) for v in pixels]

    # bubble sort (S3TC.cpp:372-385): exact comparator order
    sorted_pixels = list(pixels)
    for sort_end in range(15, 0, -1):
        for off in range(sort_end):
            a, b = sorted_pixels[off], sorted_pixels[off + 1]
            sorted_pixels[off] = jnp.minimum(a, b)
            sorted_pixels[off + 1] = jnp.maximum(a, b)

    best_is_full_range = zero_i
    best_error = jnp.full_like(zero_f, lanes.FLT_MAX)
    best_ep = [zero_i, zero_i]
    best_indexes = [zero_i] * 16

    def update_best(error, is_full_range, indexes, ep):
        nonlocal best_error, best_is_full_range, best_indexes, best_ep
        better = error < best_error
        best_error = jnp.minimum(error, best_error)
        best_is_full_range = jnp.where(better, is_full_range,
                                       best_is_full_range)
        best_indexes = [jnp.where(better, idx, cur)
                        for idx, cur in zip(indexes, best_indexes)]
        best_ep = [jnp.where(better, e, cur) for e, cur in zip(ep, best_ep)]

    # --- Full-precision 8-interpolant phase (S3TC.cpp:400-469) ---
    base = [lanes.to_float(sorted_pixels[0])]
    offset = [lanes.to_float(sorted_pixels[15] - sorted_pixels[0])]
    num_tweak = min(lanes.tweak_rounds_for_range(8), max_tweak_rounds)
    for tweak in range(num_tweak):
        e0, e1 = pca.finish_ldr(base, offset, tweak, 8, 1)
        ep = [e0[0], e1[0]]
        for refine in range(num_refine_rounds):
            refiner = EndpointRefiner(zero_f, 1, 8, one_weight)
            if is_signed:
                ep = [jnp.minimum(e, high_terminal) for e in ep]
            selector = IndexSelector(one_weight, [[ep[0]], [ep[1]]], 8, 1)
            indexes = []
            agg = zero_i
            for px in range(16):
                index = selector.select_index_ldr([float_pixels[px]])
                recon = selector.reconstruct_ldr_precise(index)[0]
                agg = agg + lanes.sq_diff_int(recon, pixels[px])
                if refine != num_refine_rounds - 1:
                    refiner.contribute_unweighted_pw([float_pixels[px]], index)
                indexes.append(index)
            error = lanes.to_float(agg)
            update_best(error, 1, indexes, ep)
            if refine != num_refine_rounds - 1:
                r0, r1 = refiner.get_refined_endpoints_ldr()
                ep = [r0[0], r1[0]]

    # --- Reduced-precision phase with reserved endpoints (S3TC.cpp:471-649) ---
    # Clipping heuristic: assign end indexes while clearance*10 <= range.
    best_heuristic_min = sorted_pixels[0]
    best_heuristic_max = sorted_pixels[15]

    largest_possible_range = best_heuristic_max - best_heuristic_min
    lowest_clearance = jnp.minimum(best_heuristic_min,
                                   high_terminal - best_heuristic_max)
    clearance_x10 = (lowest_clearance << 2) + (lowest_clearance << 4)
    # scalar build's LessOrEqual is actually `<` (ParallelMath.h:1589-1597)
    can_try_clipping = clearance_x10 < largest_possible_range

    low_clearances = [zero_i] + [sorted_pixels[px - 1] for px in range(1, 16)]
    high_clearances = [zero_i] + [high_terminal - sorted_pixels[16 - px]
                                  for px in range(1, 16)]

    # NOTE: the reference's bestSkipCount is never updated (S3TC.cpp:489-538),
    # so areMoreSkipped is simply numSkipped > 0 and the last passing
    # candidate in iteration order wins. Mirrored exactly.
    for first_index in range(16):
        low_clearance = low_clearances[first_index]
        for last_index in range(first_index, 16):
            num_skipped = first_index + (15 - last_index)
            if num_skipped <= 0:
                continue
            clearance = jnp.maximum(high_clearances[15 - last_index],
                                    low_clearance)
            cl_x10 = (clearance << 2) + (clearance << 4)
            range_v = sorted_pixels[last_index] - sorted_pixels[first_index]
            is_better = can_try_clipping & (cl_x10 < range_v)
            best_heuristic_min = jnp.where(is_better,
                                           sorted_pixels[first_index],
                                           best_heuristic_min)
            best_heuristic_max = jnp.where(is_better,
                                           sorted_pixels[last_index],
                                           best_heuristic_max)

    best_simple_min = jnp.ones_like(zero_i)
    best_simple_max = jnp.full_like(zero_i, high_terminal - 1)
    for px in range(16):
        best_simple_min = jnp.where(sorted_pixels[15 - px] > 0,
                                    sorted_pixels[15 - px], best_simple_min)
        best_simple_max = jnp.where(sorted_pixels[px] < high_terminal,
                                    sorted_pixels[px], best_simple_max)

    min_eps = [best_simple_min, best_heuristic_min]
    max_eps = [best_simple_max, best_heuristic_max]

    num_tweak6 = min(lanes.tweak_rounds_for_range(6), max_tweak_rounds)
    for min_i in range(2):
        for max_i in range(2):
            base_r = [lanes.to_float(min_eps[min_i])]
            offset_r = [lanes.to_float(max_eps[max_i] - min_eps[min_i])]
            for tweak in range(num_tweak6):
                # note: FinishLDR is called with range 8 here, matching the
                # reference (S3TC.cpp:567), although the selector uses range 6
                e0, e1 = pca.finish_ldr(base_r, offset_r, tweak, 8, 1)
                ep = [e0[0], e1[0]]
                for refine in range(num_refine_rounds):
                    refiner = EndpointRefiner(zero_f, 1, 6, one_weight)
                    if is_signed:
                        ep = [jnp.minimum(e, high_terminal) for e in ep]
                    selector = IndexSelector(one_weight, [[ep[0]], [ep[1]]],
                                             6, 1)
                    indexes = []
                    error = zero_f
                    for px in range(16):
                        sel_index = selector.select_index_ldr(
                            [float_pixels[px]])
                        recon = selector.reconstruct_ldr_precise(sel_index)[0]
                        zero_err = lanes.to_float(
                            lanes.sq_diff_int(zero_i, pixels[px]))
                        high_err = lanes.to_float(lanes.sq_diff_int(
                            jnp.full_like(zero_i, high_terminal), pixels[px]))
                        sel_err = lanes.to_float(
                            lanes.sq_diff_int(recon, pixels[px]))

                        best_px_err = zero_err
                        index = jnp.full_like(zero_i, 6)
                        index = jnp.where(high_err < best_px_err, 7, index)
                        best_px_err = jnp.minimum(best_px_err, high_err)

                        sel_better = sel_err < best_px_err
                        if refine != num_refine_rounds - 1:
                            refiner.contribute_unweighted_pw(
                                [float_pixels[px]], sel_index, mask=sel_better)
                        index = jnp.where(sel_better, sel_index, index)
                        best_px_err = jnp.minimum(best_px_err, sel_err)
                        error = error + best_px_err
                        indexes.append(index)

                    update_best(error, 0, indexes, ep)
                    if refine != num_refine_rounds - 1:
                        r0, r1 = refiner.get_refined_endpoints_ldr()
                        ep = [r0[0], r1[0]]

    return _pack_interpolated_alpha_blocks(best_ep, best_is_full_range,
                                           best_indexes, is_signed)


def _pack_interpolated_alpha_blocks(best_ep, best_is_full_range, best_indexes,
                                    is_signed: bool):
    """Final packing (S3TC.cpp:651-714), vectorized over blocks."""
    ep0, ep1 = best_ep
    if is_signed:
        ep0 = ep0 - 127
        ep1 = ep1 - 127

    is_full = best_is_full_range != 0
    swap = is_full != (ep0 > ep1)
    out_ep0 = jnp.where(swap, ep1, ep0)
    out_ep1 = jnp.where(swap, ep0, ep1)

    max_value = jnp.where(is_full, 7, 5)

    mapped = []
    for px in range(16):
        index = best_indexes[px]
        index = jnp.where(swap & (index <= max_value), max_value - index,
                          index)
        is_max = index == max_value
        remapped = jnp.where(index < max_value, index + 1, index)
        remapped = jnp.where(is_max, 1, remapped)
        index = jnp.where(index != 0, remapped, index)
        mapped.append(index)

    byte_cols = [out_ep0 & 0xFF, out_ep1 & 0xFF]
    # 16 x 3-bit little-endian stream into bytes 2..7
    for k in range(6):
        acc = jnp.zeros_like(out_ep0)
        for px in range(16):
            lo_bit = 3 * px
            if lo_bit + 3 <= 8 * k or lo_bit >= 8 * (k + 1):
                continue
            shift = lo_bit - 8 * k
            part = mapped[px] << shift if shift >= 0 else mapped[px] >> -shift
            acc = acc | (part & 0xFF)
        byte_cols.append(acc)

    return jnp.stack(byte_cols, axis=-1).astype(jnp.uint8)


def bias_signed_input(pixels_s8):
    """Util::BiasSignedInput (ConvectionKernels_Util.cpp:47-60)."""
    p = jnp.asarray(pixels_s8, dtype=jnp.int32)
    return jnp.maximum(p, -127) + 127


# indexOrder tables for the final BC1 pack (S3TC.cpp:980-1030), indexed by
# case: 0 = range4 equal-eps, 1 = range4 swapped, 2 = range4 unswapped,
# 3 = range3 swapped, 4 = range3 unswapped.
_INDEX_ORDER = np.array([
    [0, 0, 0, 0],
    [1, 3, 2, 0],
    [0, 2, 3, 1],
    [1, 2, 0, 3],
    [0, 2, 1, 3],
], dtype=np.int32)


def _pack_bc1_blocks(best: _Best):
    """Final scalar packing (S3TC.cpp:966-1051), vectorized over blocks."""
    cep = []
    for ep in range(2):
        e = best.endpoints[ep]
        compressed = ((e[0] & 0xF8) << 8) | ((e[1] & 0xFC) << 3) \
            | ((e[2] & 0xF8) >> 3)
        cep.append(compressed)

    is4 = best.range == 4
    eq = cep[0] == cep[1]
    lt = cep[0] < cep[1]
    gt = cep[0] > cep[1]

    case = jnp.where(is4,
                     jnp.where(eq, 0, jnp.where(lt, 1, 2)),
                     jnp.where(gt, 3, 4))
    swap = (case == 1) | (case == 3)
    ep_a = jnp.where(swap, cep[1], cep[0])
    ep_b = jnp.where(swap, cep[0], cep[1])

    order_flat = jnp.asarray(_INDEX_ORDER.reshape(-1))
    byte_cols = [
        (ep_a & 0xFF), (ep_a >> 8) & 0xFF,
        (ep_b & 0xFF), (ep_b >> 8) & 0xFF,
    ]
    for i in range(0, 16, 4):
        packed = jnp.zeros_like(case)
        for subi in range(4):
            index = best.indexes[i + subi]
            mapped = jnp.take(order_flat, case * 4 + index)
            packed = packed | (mapped << (subi * 2))
        byte_cols.append(packed)

    return jnp.stack(byte_cols, axis=-1).astype(jnp.uint8)
