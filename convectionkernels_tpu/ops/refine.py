"""Least-squares endpoint refinement.

TPU-native equivalent of the reference's EndpointRefiner
(/root/reference/ConvectionKernels_EndpointRefiner.h:16-176): accumulates
weighted totals (tv, v, tt, t, w) over per-pixel index assignments and solves
v = a*t + b for refined endpoints. The block axis is the leading axis of every
array; masked contributions reproduce the reference's per-lane control flow.

Float32 semantics match the scalar reference build exactly (Reciprocal is an
exact division there; ParallelMath.h:1456).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lanes
from .exact_math import exact_divide, exact_reciprocal


def _pin(x, enable=True):
    """Pin a product against XLA:TPU fused-multiply-add contraction.

    XLA:TPU may duplicate an elementwise expression into several fusions
    and contract `v - a*t` into an FMA in some of them — observed on the
    BC1 quality corpus as two bit-different evaluations of the SAME
    refined-endpoint solve inside one program, flipping a floor(x+0.5)
    boundary vs the scalar reference (94 -> 95). A barrier around each
    product forces the separate rounding step the scalar build performs.
    Cost: negligible ([N]-sized values, a handful per refiner solve).

    enable=False skips the barrier: Pallas/Mosaic cannot lower
    optimization_barrier, and Mosaic compiles the kernel body op-for-op
    without XLA's fusion/contraction passes (the TPU oracle goldens
    cover the kernel path at scale).
    """
    if not enable:
        return x
    return jax.lax.optimization_barrier(x)


class EndpointRefiner:
    """Mirror of EndpointRefiner<nch>. Mutable accumulator of jnp arrays."""

    def __init__(self, zero, nch: int, index_range, channel_weights,
                 rcp_max_index=None, rcp_channel_weights=None):
        """Init (EndpointRefiner.h:38-60).

        For the dual-plane Pallas kernel, where the index range and
        channel weights vary per candidate lane, `index_range` may be
        ignored by passing precomputed broadcastable `rcp_max_index` /
        `rcp_channel_weights` rows (host-computed with the same f32
        divisions as the scalar path, so per-lane values are identical).
        """
        self.nch = nch
        self.tv = [zero] * nch
        self.v = [zero] * nch
        self.tt = zero
        self.t = zero
        self.w = zero
        self.wu = jnp.zeros_like(zero).astype(jnp.int32)
        if rcp_max_index is None:
            rcp_max_index = np.float32(1.0) / np.float32(index_range - 1)
        self.rcp_max_index = rcp_max_index
        self.channel_weights = [
            w if isinstance(w, jnp.ndarray) else np.float32(w)
            for w in channel_weights[:nch]]
        if rcp_channel_weights is None:
            rcp_channel_weights = [
                np.float32(1.0) if w == 0.0
                else np.float32(1.0) / np.float32(w)
                for w in self.channel_weights]
        self.rcp_channel_weights = rcp_channel_weights

    def contribute_unweighted_pw(self, pw_pixel, index, num_real_channels=None,
                                 mask=None):
        """ContributeUnweightedPW (EndpointRefiner.h:79-93).

        `mask` (bool [N]) reproduces per-lane skipping: masked-off lanes
        contribute nothing (terms replaced by +0.0, which is an exact no-op on
        the non-negative accumulators involved).
        """
        nrc = self.nch if num_real_channels is None else num_real_channels
        t = lanes.to_float(index) * self.rcp_max_index

        def m(x):
            return x if mask is None else jnp.where(mask, x, np.float32(0.0))

        for ch in range(nrc):
            val = pw_pixel[ch]
            self.tv[ch] = self.tv[ch] + m(t * val)
            self.v[ch] = self.v[ch] + m(val)
        self.tt = self.tt + m(t * t)
        self.t = self.t + m(t)
        if mask is None:
            self.wu = self.wu + 1
        else:
            self.wu = self.wu + mask.astype(jnp.int32)

    def contribute_pw(self, pw_pixel, index, weight):
        """ContributePW (EndpointRefiner.h:62-77)."""
        t = lanes.to_float(index) * self.rcp_max_index
        for ch in range(self.nch):
            val = pw_pixel[ch] * weight
            self.tv[ch] = self.tv[ch] + t * val
            self.v[ch] = self.v[ch] + val
        self.tt = self.tt + weight * t * t
        self.t = self.t + weight * t
        self.w = self.w + weight

    def get_refined_endpoints(self, stacked: bool = True):
        """GetRefinedEndpoints (EndpointRefiner.h:100-145). Returns float eps.

        stacked=False runs the channel divides separately (identical
        elementwise arithmetic) — used inside Pallas kernels where a
        [., nch] minor axis would pad to 128 lanes. It also disables the
        FMA-contraction pin (see _pin): Mosaic cannot lower the barrier
        and does not contract."""
        pin = stacked
        w = self.w + self.wu.astype(jnp.float32)
        w = lanes.make_safe_denominator(w)
        w_rcp = exact_reciprocal(w)  # scalar Reciprocal == exact division

        adenom = (_pin(self.tt * w, pin) - _pin(self.t * self.t, pin)) * w_rcp
        adenom_zero = adenom == np.float32(0.0)
        adenom = jnp.where(adenom_zero, np.float32(1.0), adenom)

        a_numer_list = [self.tv[ch] - _pin(self.t * self.v[ch] * w_rcp, pin)
                        for ch in range(self.nch)]
        if stacked:
            a_all = exact_divide(jnp.stack(a_numer_list, axis=-1),
                                 adenom[..., None])
            a_list = [a_all[..., ch] for ch in range(self.nch)]
        else:
            a_list = [exact_divide(a_numer_list[ch], adenom)
                      for ch in range(self.nch)]

        ep0, ep1 = [], []
        for ch in range(self.nch):
            a = a_list[ch]
            b = (self.v[ch] - _pin(a * self.t, pin)) * w_rcp
            p1 = b
            p2 = a + b
            p1 = jnp.where(adenom_zero, self.v[ch] * w_rcp, p1)
            p2 = jnp.where(adenom_zero, p1, p2)
            inv_w = self.rcp_channel_weights[ch]
            ep0.append(p1 * inv_w)
            ep1.append(p2 * inv_w)
        return ep0, ep1

    def get_refined_endpoints_ldr(self, num_real_channels=None,
                                  stacked: bool = True):
        """GetRefinedEndpointsLDR (EndpointRefiner.h:147-157) -> int32 eps."""
        nrc = self.nch if num_real_channels is None else num_real_channels
        f0, f1 = self.get_refined_endpoints(stacked=stacked)
        ep0 = [lanes.round_and_convert_to_int_nearest(
            lanes.clamp(f0[ch], 0.0, 255.0)) for ch in range(nrc)]
        ep1 = [lanes.round_and_convert_to_int_nearest(
            lanes.clamp(f1[ch], 0.0, 255.0)) for ch in range(nrc)]
        return ep0, ep1

    def get_refined_endpoints_hdr(self, signed: bool, stacked: bool = True):
        """GetRefinedEndpointsHDR (EndpointRefiner.h:159-175) -> int32 eps."""
        f0, f1 = self.get_refined_endpoints(stacked=stacked)
        lo = -31743.0 if signed else 0.0
        ep0 = [lanes.round_and_convert_to_int_nearest(
            lanes.clamp(f, lo, 31743.0)) for f in f0]
        ep1 = [lanes.round_and_convert_to_int_nearest(
            lanes.clamp(f, lo, 31743.0)) for f in f1]
        return ep0, ep1
