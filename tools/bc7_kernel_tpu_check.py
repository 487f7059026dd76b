"""TPU check for the BC7 Pallas kernel path: byte-equality vs the CPU
graph path, plus on-device timing at the bench chunk size.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bc7_kernel_tpu_check.py [q...]
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/build/jax_cache")

from convectionkernels_tpu.utils import cache as _cache

_cache.enable()


def main():
    import jax

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import _bc7_fn
    from convectionkernels_tpu.bc7_plan import (BC7EncodingPlan,
                                                plan_from_quality)
    from bench import blockify_test_image
    from tools.profile_formats import profile_fn

    qs = [int(x) for x in (sys.argv[1:] or ["5", "50"])]
    opt = Options()

    for q in qs:
        plan = (BC7EncodingPlan() if q >= 100 else plan_from_quality(q))
        fn = _bc7_fn(opt, plan)

        # correctness on a mixed 256-block slice vs the golden .npy the CPU
        # run wrote (tools/bc7_kernel_cpu_golden.py), if present
        px = blockify_test_image(256, seed=77)
        rng = np.random.default_rng(5)
        px = px.copy()
        px[128:, ..., 3] = rng.integers(0, 256, (128, 16))
        ours = np.asarray(fn(px))
        golden_path = f"/tmp/bc7_golden_q{q}.npy"
        if os.path.exists(golden_path):
            golden = np.load(golden_path)
            eq = np.array_equal(ours, golden)
            print(f"q{q}: TPU kernel vs CPU graph byte-equal: {eq}")
            if not eq:
                bad = np.nonzero((ours != golden).any(axis=1))[0]
                print("  mismatching blocks:", bad[:20])
        else:
            print(f"q{q}: no CPU golden at {golden_path}; skipping equality")

        # timing at chunk size
        x = blockify_test_image(fn.chunk)
        profile_fn(fn.jitted_body, x, f"bc7_q{q}_kernel", top_k=8)


if __name__ == "__main__":
    main()
