"""Feasibility probe: can Pallas/Mosaic on this TPU stack run the exact-math
building blocks the BC7 kernel needs (bitcast view, int32 mul/shift chains,
exact_divide/exact_sqrt, where/floor/min) bit-identically to the jnp path?

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/pallas_feasibility.py
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convectionkernels_tpu.ops import lanes
from convectionkernels_tpu.ops.exact_math import exact_divide, exact_sqrt


def kernel(a_ref, b_ref, out_div_ref, out_sqrt_ref, out_mix_ref):
    a = a_ref[:]
    b = b_ref[:]
    out_div_ref[:] = exact_divide(a, b)
    out_sqrt_ref[:] = exact_sqrt(jnp.abs(a))
    # the codec's staple int ops: round-nearest, clamp, sqdiff, shifts
    ia = lanes.round_and_convert_to_int_nearest(lanes.clamp(a, 0.0, 255.0))
    ib = lanes.round_and_convert_to_int_nearest(lanes.clamp(b, 0.0, 255.0))
    recon = ((64 - ia) * ib + ia * ib + 32) >> 6
    out_mix_ref[:] = lanes.to_float(lanes.sq_diff_int(recon, ia))


def main():
    rng = np.random.default_rng(0)
    shape = (16, 512)
    a = (rng.standard_normal(shape) * 300).astype(np.float32)
    b = (rng.standard_normal(shape) * 7 + 0.5).astype(np.float32)
    b[b == 0] = 1.0

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 3,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        )(a, b)

    div_k, sqrt_k, mix_k = [np.asarray(x) for x in run(a, b)]

    @jax.jit
    def ref(a, b):
        ia = lanes.round_and_convert_to_int_nearest(lanes.clamp(a, 0.0, 255.0))
        ib = lanes.round_and_convert_to_int_nearest(lanes.clamp(b, 0.0, 255.0))
        recon = ((64 - ia) * ib + ia * ib + 32) >> 6
        return (exact_divide(a, b), exact_sqrt(jnp.abs(a)),
                lanes.to_float(lanes.sq_diff_int(recon, ia)))

    div_r, sqrt_r, mix_r = [np.asarray(x) for x in ref(a, b)]

    ok = True
    for name, k, r in [("div", div_k, div_r), ("sqrt", sqrt_k, sqrt_r),
                       ("mix", mix_k, mix_r)]:
        same = np.array_equal(k.view(np.int32), r.view(np.int32))
        print(f"{name}: bitwise {'OK' if same else 'MISMATCH'}")
        ok &= same
    # also vs IEEE numpy
    print("div vs numpy:",
          np.array_equal(div_k.view(np.int32), (a / b).view(np.int32)))
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
