"""Per-stage device profile of the BC6H encode path.

Uses models/bc6h.pack's profiling hooks to time each precision group
(partitioned x aPrec) and the meta-round vs combine split, so kernel
work targets the dominant stage (VERDICT r3 #2).

Usage: python tools/profile_bc6h_stages.py [N]
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

from bench import hdr_test_blocks  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.models import bc6h

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    opt = Options()
    cw = opt.channel_weights()
    px = hdr_test_blocks(n)

    def run_stage(name, fn):
        x0 = jnp.asarray(px)
        jitted = jax.jit(fn)
        np.asarray(jax.tree_util.tree_leaves(jitted(x0))[0])

        salt = np.int16(time.time_ns() & 0x3F)
        x = jnp.asarray(px ^ salt)
        tmp = tempfile.mkdtemp(prefix="bc6hstage")
        try:
            with jax.profiler.trace(tmp):
                np.asarray(jax.tree_util.tree_leaves(jitted(x))[0])
            total = 0.0
            for path in glob.glob(tmp + "/**/*.trace.json.gz",
                                  recursive=True):
                with gzip.open(path) as f:
                    trace = json.load(f)
                evs = trace.get("traceEvents", [])
                device_pids = {
                    e["pid"] for e in evs
                    if e.get("ph") == "M"
                    and e.get("name") == "process_name"
                    and "device" in str(
                        e.get("args", {}).get("name", "")).lower()
                }
                for e in evs:
                    if (e.get("ph") == "X" and e.get("pid") in device_pids
                            and str(e.get("name", "")).startswith("jit_")):
                        total += e.get("dur", 0) / 1e6
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"{name:32s} {total * 1e3:8.2f} ms device", flush=True)
        return total

    def packer(**kw):
        return lambda x: bc6h.pack(x, opt.flags, cw, False, opt.seed_points,
                                   opt.refine_rounds_bc6h, **kw)

    # group list mirrors pack(): single modes first, aPrec descending
    groups = []
    for partitioned_int in range(2):
        partitioned = partitioned_int == 1
        precs = sorted({m[3] for m in bc6h.HDR_MODES if m[1] == partitioned},
                       reverse=True)
        for aprec in precs:
            groups.append((partitioned, aprec))

    t_full = run_stage("full pack", packer())
    for gi, (partitioned, aprec) in enumerate(groups):
        run_stage(f"group {gi} (part={int(partitioned)} aprec={aprec})",
                  packer(_only_groups=(gi,)))
    run_stage("all groups, skip combine", packer(_skip_combine=True))


if __name__ == "__main__":
    main()
