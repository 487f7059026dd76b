"""Top device ops by time for one encoder program execution.

Aggregates the jax.profiler chrome trace's device-lane XLA op events
(the rows BELOW the jit_ program row) and prints the top-N by total
duration, so optimization targets the actual dominant fusions.

Usage: python tools/profile_device_ops.py [etc2|bc6h|bc7|hmode] [N]
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

from bench import blockify_test_image, hdr_test_blocks  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.models import etc

    which = sys.argv[1] if len(sys.argv) > 1 else "etc2"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    opt = Options()

    if which == "etc2":
        px = blockify_test_image(n)
        fn = lambda x: etc.compress_etc2(x, opt, False)  # noqa: E731
    elif which == "hmode":
        px = blockify_test_image(n)

        def fn(pixels_u8):
            pixels, pw = etc.extract_blocks(pixels_u8, opt)
            stage = etc.StageBest(pixels[0][0].shape[0])
            is_t = [jnp.zeros((n,), dtype=bool) for _ in range(16)]
            sectors = etc._sector_assignments(
                pixels, pw, opt, is_t, jnp.full((n,), 16, jnp.int32), False)
            etc.encode_hmode(stage, 3, [~x for x in sectors], pixels, pw,
                             opt)
            return stage.error, stage.hi, stage.lo
    elif which == "bc6h":
        from convectionkernels_tpu.models import bc6h
        px = hdr_test_blocks(n)
        cw = opt.channel_weights()
        fn = lambda x: bc6h.pack(x, opt.flags, cw, False,  # noqa: E731
                                 opt.seed_points, opt.refine_rounds_bc6h)
    elif which == "bc7":
        from convectionkernels_tpu.api import _bc7_fn
        from convectionkernels_tpu.bc7_plan import plan_from_quality
        px = blockify_test_image(n)
        fn = _bc7_fn(opt, plan_from_quality(50)).body
    else:
        raise SystemExit(f"unknown target {which}")

    jitted = jax.jit(fn)
    x0 = jnp.asarray(px)
    np.asarray(jax.tree_util.tree_leaves(jitted(x0))[0])

    salt = np.int32(time.time_ns() & 0x3F)
    x = jnp.asarray(px ^ px.dtype.type(salt))
    tmp = tempfile.mkdtemp(prefix="opprof")
    try:
        with jax.profiler.trace(tmp):
            np.asarray(jax.tree_util.tree_leaves(jitted(x))[0])
        by_op = defaultdict(float)
        by_src = defaultdict(float)
        by_src_n = defaultdict(int)
        total_prog = 0.0
        for path in glob.glob(tmp + "/**/*.trace.json.gz", recursive=True):
            with gzip.open(path) as f:
                trace = json.load(f)
            evs = trace.get("traceEvents", [])
            device_pids = {
                e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device" in str(e.get("args", {}).get("name", "")).lower()
            }
            for e in evs:
                if e.get("ph") != "X" or e.get("pid") not in device_pids:
                    continue
                nm = str(e.get("name", ""))
                dur = e.get("dur", 0) / 1e3  # ms
                if nm.startswith("jit_"):
                    total_prog += dur
                else:
                    by_op[nm] += dur
                    src = str(e.get("args", {}).get("source", "?"))
                    src = src.replace("/root/repo/convectionkernels_tpu/",
                                      "")
                    by_src[src] += dur
                    by_src_n[src] += 1
        print(f"program total: {total_prog:.2f} ms "
              f"({n} blocks = {n * 16 / total_prog / 1e3:.1f} Mtexels/s)")
        print("-- by source line --")
        ranked = sorted(by_src.items(), key=lambda kv: -kv[1])
        for src, dur in ranked[:25]:
            print(f"  {dur:8.3f} ms  x{by_src_n[src]:<4d} {src[:100]}")
        rest = sum(d for _, d in ranked[25:])
        print(f"  {rest:8.3f} ms  (+{len(ranked) - 25} more sites)")
        print("-- by op --")
        ranked = sorted(by_op.items(), key=lambda kv: -kv[1])
        for nm, dur in ranked[:10]:
            print(f"  {dur:8.3f} ms  {nm[:110]}")
        rest = sum(d for _, d in ranked[10:])
        print(f"  {rest:8.3f} ms  (+{len(ranked) - 10} more ops)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
