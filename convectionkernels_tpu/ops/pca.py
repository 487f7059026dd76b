"""PCA endpoint estimation.

TPU-native reformulation of the reference's EndpointSelector /
PackedCovarianceMatrix pipeline (/root/reference/ConvectionKernels_EndpointSelector.h:13-149,
ConvectionKernels_PackedCovarianceMatrix.h:10-64): three passes over the 16
pixels of each block — centroid, covariance accumulation, min/max projection —
followed by power iteration with max-component normalization.

All arrays carry a leading block axis of arbitrary size N (the generalization
of the reference's 8 SIMD lanes). Float32 accumulation order matches the
reference exactly: pixels accumulate sequentially (unrolled Python loop) and
cross-channel reductions accumulate in channel order, so results are
bit-identical to the scalar reference build.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import lanes
from .exact_math import exact_divide, exact_sqrt


def pyramid_add(cov, diff, weight, nch: int):
    """PackedCovarianceMatrix::Add — cov is a list of N(N+1)/2 [N] arrays."""
    out = []
    index = 0
    for row in range(nch):
        for col in range(row + 1):
            out.append(cov[index] + diff[row] * diff[col] * weight)
            index += 1
    return out


def pyramid_product(cov, vec, nch: int):
    """PackedCovarianceMatrix::Product — exact column accumulation order."""
    out = []
    for row in range(nch):
        total = None
        index = (row * (row + 1)) >> 1
        for col in range(nch):
            term = vec[col] * cov[index]
            total = term if total is None else total + term
            if col >= row:
                index += col + 1
            else:
                index += 1
        out.append(total)
    return out


def _div_each(num_list, denom):
    """exact_divide per channel. The graph path stacks channels into one
    trailing axis to cut op count; inside a Pallas kernel a [.., nch]
    minor axis would pad to 128 lanes, so per-channel calls are used
    there instead. Elementwise arithmetic is identical either way."""
    return [exact_divide(v, denom) for v in num_list]


def endpoint_selector(pw_pixels, pixel_weights, nch: int, iterations: int = 8,
                      member_mask=None, stacked: bool = True):
    """EndpointSelector<nch, iterations> over all three passes.

    Args:
      pw_pixels: list of 16 per-pixel lists of `nch` float32 [N] arrays
        (pre-weighted pixel values, BCCommon::PreWeightPixelsLDR).
      pixel_weights: list of 16 float32 [N] arrays (contribution weights).
      nch: channel count (TVectorSize).
      iterations: power iteration count (TIterationCount, always 8).
      member_mask: optional list of 16 bool arrays. When given, pass 2's
        min/max projection only sees member pixels (the reference's per-shape
        loops, BC67.cpp:1096-1103); passes 0/1 are already weight-masked.
        Note the reference's ContributeMinMax ignores the *weight* (so BC1's
        zero-weight transparent pixels DO contribute to min/max) — the mask
        is only for shape membership, a separate concept.

    Returns:
      (centroid, direction, min_dist, max_dist): lists/arrays for GetEndpoints.
    """
    zero = jnp.zeros_like(pixel_weights[0])

    # Pass 0: centroid (EndpointSelector.h:73-87)
    centroid = [zero] * nch
    weight_total = zero
    for px in range(16):
        w = pixel_weights[px]
        for ch in range(nch):
            centroid[ch] = centroid[ch] + pw_pixels[px][ch] * w
        weight_total = weight_total + w
    denom = lanes.make_safe_denominator(weight_total)
    if stacked:
        centroid_all = exact_divide(jnp.stack(centroid, axis=-1),
                                    denom[..., None])
        centroid = [centroid_all[..., ch] for ch in range(nch)]
    else:
        centroid = _div_each(centroid, denom)

    # Pass 1: covariance (EndpointSelector.h:89-96)
    cov = [zero] * ((nch * (nch + 1)) // 2)
    for px in range(16):
        diff = [pw_pixels[px][ch] - centroid[ch] for ch in range(nch)]
        cov = pyramid_add(cov, diff, pixel_weights[px], nch)

    # FinishDirection: power iteration (EndpointSelector.h:98-130)
    approx = [jnp.full_like(zero, np.float32(1.0))] * nch
    for _ in range(iterations):
        product = pyramid_product(cov, approx, nch)
        largest = product[0]
        for ch in range(1, nch):
            largest = jnp.maximum(largest, product[ch])
        largest = lanes.make_safe_denominator(largest)
        if stacked:
            approx_all = exact_divide(jnp.stack(product, axis=-1),
                                      largest[..., None])
            approx = [approx_all[..., ch] for ch in range(nch)]
        else:
            approx = _div_each(product, largest)

    approx_len = None
    for ch in range(nch):
        term = approx[ch] * approx[ch]
        approx_len = term if approx_len is None else approx_len + term
    approx_len = exact_sqrt(approx_len)
    approx_len = lanes.make_safe_denominator(approx_len)
    if stacked:
        dir_all = exact_divide(jnp.stack(approx, axis=-1),
                               approx_len[..., None])
        direction = [dir_all[..., ch] for ch in range(nch)]
    else:
        direction = _div_each(approx, approx_len)

    # Pass 2: min/max projection (EndpointSelector.h:132-141)
    min_dist = jnp.full_like(zero, lanes.FLT_MAX)
    max_dist = jnp.full_like(zero, -lanes.FLT_MAX)
    for px in range(16):
        dist = None
        for ch in range(nch):
            term = direction[ch] * (pw_pixels[px][ch] - centroid[ch])
            dist = term if dist is None else dist + term
        if member_mask is not None:
            min_dist = jnp.minimum(
                min_dist, jnp.where(member_mask[px], dist, lanes.FLT_MAX))
            max_dist = jnp.maximum(
                max_dist, jnp.where(member_mask[px], dist, -lanes.FLT_MAX))
        else:
            min_dist = jnp.minimum(min_dist, dist)
            max_dist = jnp.maximum(max_dist, dist)

    return centroid, direction, min_dist, max_dist


def get_endpoints(centroid, direction, min_dist, max_dist, channel_weights,
                  nch: int, stacked: bool = True):
    """EndpointSelector::GetEndpoints (EndpointSelector.h:51-71).

    Returns (base, offset) per channel — the UnfinishedEndpoints line.
    Mirrors the reference exactly, including dividing by the *raw* channel
    weight (the computed safeWeight is unused in the reference).
    """
    mns, mxs = [], []
    for ch in range(nch):
        mns.append(centroid[ch] + direction[ch] * min_dist)
        mxs.append(centroid[ch] + direction[ch] * max_dist)
    if stacked:
        cw = jnp.asarray(np.asarray(channel_weights[:nch],
                                    dtype=np.float32))
        base_all = exact_divide(jnp.stack(mns, axis=-1), cw)
        offset_all = exact_divide(
            jnp.stack([mxs[ch] - mns[ch] for ch in range(nch)], axis=-1),
            cw)
        return ([base_all[..., ch] for ch in range(nch)],
                [offset_all[..., ch] for ch in range(nch)])
    def cw_arr(ch):
        w = channel_weights[ch]
        if isinstance(w, jnp.ndarray):
            return jnp.broadcast_to(w, mns[ch].shape)
        return jnp.full_like(mns[ch], np.float32(w))

    base = [exact_divide(mns[ch], cw_arr(ch)) for ch in range(nch)]
    offset = [exact_divide(mxs[ch] - mns[ch], cw_arr(ch))
              for ch in range(nch)]
    return base, offset


def finish_ldr(base, offset, tweak: int, range_: int, nch: int):
    """UnfinishedEndpoints::FinishLDR (ConvectionKernels_UnfinishedEndpoints.h:84-99).

    Quantizes the PCA line to integer endpoints with tweak factors.
    Returns (ep0, ep1): lists of int32 [N] arrays.
    """
    f0, f1 = lanes.compute_tweak_factors(tweak, range_)
    ep0, ep1 = [], []
    for ch in range(nch):
        e0f = lanes.clamp(base[ch] + offset[ch] * f0, 0.0, 255.0)
        e1f = lanes.clamp(base[ch] + offset[ch] * f1, 0.0, 255.0)
        ep0.append(lanes.round_and_convert_to_int_nearest(e0f))
        ep1.append(lanes.round_and_convert_to_int_nearest(e1f))
    return ep0, ep1


def finish_hdr(base, offset, tweak: int, range_: int, nch: int, signed: bool):
    """UnfinishedEndpoints::FinishHDR{Signed,Unsigned} (UnfinishedEndpoints.h:44-82)."""
    f0, f1 = lanes.compute_tweak_factors(tweak, range_)
    lo = -31743.0 if signed else 0.0
    ep0, ep1 = [], []
    for ch in range(nch):
        e0f = lanes.clamp(base[ch] + offset[ch] * f0, lo, 31743.0)
        e1f = lanes.clamp(base[ch] + offset[ch] * f1, lo, 31743.0)
        ep0.append(lanes.round_and_convert_to_int_nearest(e0f))
        ep1.append(lanes.round_and_convert_to_int_nearest(e1f))
    return ep0, ep1
