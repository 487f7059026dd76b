"""Index quantization by projection.

TPU-native equivalent of the reference's IndexSelector
(/root/reference/ConvectionKernels_IndexSelector.h:13-142,
ConvectionKernels_IndexSelector.cpp:43-62): precompute origin and axis from
the endpoints, select each pixel's index by dot product, and reconstruct
palette entries with the fixed-point weight-reciprocal table.

All integer arithmetic is int32 (matching the scalar reference build); the
fixed-point products stay below 2^31 by construction so no wraparound
emulation is needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import lanes
from .exact_math import exact_divide

# g_weightReciprocals (ConvectionKernels_IndexSelector.cpp:43-62), indexed by
# range; entry r is the fixed-point reciprocal of (r - 1) scaled by 2^15.
WEIGHT_RECIPROCALS = (
    0, 0, 32768, 16384, 10923, 8192, 6554, 5461, 4681, 4096, 3641, 3277,
    2979, 2731, 2521, 2341, 2185,
)


class IndexSelector:
    """Mirror of IndexSelector<nch>.

    `range_` may be a Python int (the usual case) or, for the dual-plane
    Pallas kernel where the index range varies per candidate lane, the
    pair (`max_value_row`, `recip_row`) of broadcastable arrays
    (f32 range-1, f32 weight reciprocal). Channel weights may likewise be
    scalars or broadcastable f32 arrays; the arithmetic is elementwise
    either way, so results are bit-identical per lane.
    """

    def __init__(self, channel_weights, endpoints, range_, nch: int,
                 color_space_endpoints=None):
        """Init (IndexSelector.h:39-77).

        endpoints: (ep0, ep1) lists of int32 [N] arrays (interpolation space).
        color_space_endpoints: same, defaults to `endpoints` (LDR path).
        """
        self.nch = nch
        if isinstance(range_, int):
            self.range = range_
            self.max_value = np.float32(range_ - 1)
            self.recip_f = None
        else:
            self.range = None
            self.max_value, self.recip_f = range_
        self.endpoints = endpoints
        self._ep_f = None  # lazy f32 view for reconstruct_ldr_bc7_f32
        cse = endpoints if color_space_endpoints is None else color_space_endpoints

        def w(ch):
            cwv = channel_weights[ch]
            return cwv if isinstance(cwv, jnp.ndarray) else np.float32(cwv)

        self.origin = [lanes.to_float(cse[0][ch]) for ch in range(nch)]
        ep_diff_weighted = []
        for ch in range(nch):
            opposing = lanes.to_float(cse[1][ch])
            ep_diff_weighted.append(
                (opposing - self.origin[ch]) * w(ch))

        len_sq = ep_diff_weighted[0] * ep_diff_weighted[0]
        for ch in range(1, nch):
            len_sq = len_sq + ep_diff_weighted[ch] * ep_diff_weighted[ch]
        len_sq = lanes.make_safe_denominator(len_sq)

        mv = jnp.broadcast_to(jnp.asarray(self.max_value), len_sq.shape)
        mv_div_lensq = exact_divide(mv, len_sq)
        self.axis = [
            ep_diff_weighted[ch] * w(ch) * mv_div_lensq
            for ch in range(nch)
        ]

    def select_index_ldr(self, float_pixel):
        """SelectIndexLDR (IndexSelector.h:124-131): project + clamp + round."""
        dist = (float_pixel[0] - self.origin[0]) * self.axis[0]
        for ch in range(1, self.nch):
            dist = dist + (float_pixel[ch] - self.origin[ch]) * self.axis[ch]
        clamped = jnp.maximum(jnp.minimum(dist, self.max_value),
                              np.float32(0.0))
        return lanes.round_and_convert_to_int_nearest(clamped)

    def reconstruct_ldr_bc7(self, index, num_real_channels=None):
        """ReconstructLDR_BC7 (IndexSelector.h:90-100): 64ths weights."""
        nrc = self.nch if num_real_channels is None else num_real_channels
        recip = WEIGHT_RECIPROCALS[self.range]
        weight = (recip * index + 256) >> 9
        out = []
        for ch in range(nrc):
            ep0f = (64 - weight) * self.endpoints[0][ch]
            ep1f = weight * self.endpoints[1][ch]
            out.append((ep0f + ep1f + 32) >> 6)
        return out

    def reconstruct_ldr_bc7_f32(self, index, num_real_channels=None):
        """ReconstructLDR_BC7 computed in f32, bit-identical to the int
        path: every intermediate is a non-negative integer below 2^24
        (recip*index+256 <= 491776; (64-w)*ep0 + w*ep1 + 32 <= 32672), so
        f32 multiply/add is exact and >>k is floor(x * 2^-k). The VPU runs
        f32 multiplies at full rate where i32 multiplies are slower, which
        matters in the Pallas kernels' 3x-per-pixel retest loop. Returns
        f32 arrays (integer-valued)."""
        nrc = self.nch if num_real_channels is None else num_real_channels
        recip = (np.float32(WEIGHT_RECIPROCALS[self.range])
                 if self.recip_f is None else self.recip_f)
        w = jnp.floor((lanes.to_float(index) * recip + np.float32(256.0))
                      * np.float32(1.0 / 512.0))
        if self._ep_f is None:
            self._ep_f = [[lanes.to_float(e) for e in eps]
                          for eps in self.endpoints]
        out = []
        for ch in range(nrc):
            t = ((np.float32(64.0) - w) * self._ep_f[0][ch]
                 + w * self._ep_f[1][ch] + np.float32(32.0))
            out.append(jnp.floor(t * np.float32(1.0 / 64.0)))
        return out

    def reconstruct_ldr_precise(self, index, num_real_channels=None):
        """ReconstructLDRPrecise (IndexSelector.h:102-112): 255ths weights."""
        nrc = self.nch if num_real_channels is None else num_real_channels
        recip = WEIGHT_RECIPROCALS[self.range]
        weight = (recip * index + 64) >> 7
        out = []
        for ch in range(nrc):
            ep0f = (256 - weight) * self.endpoints[0][ch]
            ep1f = weight * self.endpoints[1][ch]
            out.append((ep0f + ep1f + 128) >> 8)
        return out


def aggregated_error_finalize(err_channels, flags_uniform: bool,
                              channel_weights_sq):
    """AggregatedError::Finalize (ConvectionKernels_AggregatedError.h:30-46).

    err_channels: list of int32 [N] unweighted squared-error sums per channel.
    """
    if flags_uniform:
        total = err_channels[0]
        for ch in range(1, len(err_channels)):
            total = total + err_channels[ch]
        return lanes.to_float(total)
    total = lanes.to_float(err_channels[0]) * np.float32(channel_weights_sq[0])
    for ch in range(1, len(err_channels)):
        total = total + lanes.to_float(err_channels[ch]) * np.float32(
            channel_weights_sq[ch])
    return total
