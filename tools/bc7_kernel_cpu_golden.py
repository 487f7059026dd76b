"""Write CPU graph-path BC7 goldens for tools/bc7_kernel_tpu_check.py."""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/build/jax_cache")
os.environ["XLA_FLAGS"] = (
    "--xla_cpu_enable_fast_math=false --xla_cpu_max_isa=AVX "
    "--xla_force_host_platform_device_count=8")
os.environ["CONVECTION_BC7_KERNEL"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import _bc7_fn
    from convectionkernels_tpu.bc7_plan import (BC7EncodingPlan,
                                                plan_from_quality)
    from bench import blockify_test_image

    qs = [int(x) for x in (sys.argv[1:] or ["5", "50"])]
    opt = Options()
    for q in qs:
        plan = (BC7EncodingPlan() if q >= 100 else plan_from_quality(q))
        fn = _bc7_fn(opt, plan)
        px = blockify_test_image(256, seed=77)
        rng = np.random.default_rng(5)
        px = px.copy()
        px[128:, ..., 3] = rng.integers(0, 256, (128, 16))
        out = np.asarray(fn(px))
        np.save(f"/tmp/bc7_golden_q{q}.npy", out)
        print(f"q{q}: wrote /tmp/bc7_golden_q{q}.npy")


if __name__ == "__main__":
    main()
