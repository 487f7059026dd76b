"""Per-stage device profile of the ETC2 opaque encode path.

Jits each stage of compress_etc2 (planar, T-mode x2, H-mode, ETC1
differential scan, and the ETC1 pair resolution in isolation) and
measures one fresh salted run of each on the attached chip, so kernel
work targets the stage that actually dominates rather than the
whole-program op soup (profile_formats.py shows 4k+ fused ops).

Usage: python tools/profile_etc_stages.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

from bench import blockify_test_image  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.models import etc

    opt = Options()
    n = 4096
    px = blockify_test_image(n)

    def run_stage(name, fn):
        x0 = jnp.asarray(px)
        jitted = jax.jit(fn)
        np.asarray(jax.tree_util.tree_leaves(jitted(x0))[0])  # compile

        salt = np.int32(time.time_ns() & 0x3F)
        x = jnp.asarray(px ^ np.uint8(salt))
        import glob
        import gzip
        import json as _json
        import shutil
        import tempfile
        tmp = tempfile.mkdtemp(prefix="etcstage")
        try:
            t0 = time.perf_counter()
            with jax.profiler.trace(tmp):
                np.asarray(jax.tree_util.tree_leaves(jitted(x))[0])
            wall = time.perf_counter() - t0
            total = 0.0
            nops = 0
            for path in glob.glob(tmp + "/**/*.trace.json.gz",
                                  recursive=True):
                with gzip.open(path) as f:
                    trace = _json.load(f)
                evs = trace.get("traceEvents", [])
                device_pids = {
                    e["pid"] for e in evs
                    if e.get("ph") == "M"
                    and e.get("name") == "process_name"
                    and "device" in str(
                        e.get("args", {}).get("name", "")).lower()
                }
                for e in evs:
                    if e.get("ph") != "X" or e.get("pid") not in device_pids:
                        continue
                    nm = str(e.get("name", ""))
                    if nm.startswith("jit_"):
                        total += e.get("dur", 0) / 1e6
                    elif nm:
                        nops += 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"{name:24s} {total * 1e3:8.2f} ms device  "
              f"({nops} ops, wall {wall:.1f}s)", flush=True)
        return total

    def with_stage(body):
        def fn(pixels_u8):
            pixels, pw = etc.extract_blocks(pixels_u8, opt)
            stage = etc.StageBest(pixels[0][0].shape[0])
            body(stage, pixels, pw)
            return stage.error, stage.hi, stage.lo
        return fn

    nblk = n

    def sectors_of(pixels, pw):
        is_t = [jnp.zeros((nblk,), dtype=bool) for _ in range(16)]
        num_opaque = jnp.full((nblk,), 16, jnp.int32)
        return etc._sector_assignments(pixels, pw, opt, is_t, num_opaque,
                                       False)

    run_stage("planar", with_stage(
        lambda s, p, w: etc.encode_planar(s, 0, p, w, opt)))
    run_stage("sector_assign", lambda x: tuple(
        sectors_of(*etc.extract_blocks(x, opt))))
    run_stage("tmode", with_stage(
        lambda s, p, w: etc.encode_tmode(s, 1, sectors_of(p, w), p, w, opt)))
    run_stage("hmode", with_stage(
        lambda s, p, w: etc.encode_hmode(
            s, 3, [~x for x in sectors_of(p, w)], p, w, opt)))
    run_stage("etc1_diff", with_stage(
        lambda s, p, w: etc.compress_etc1_internal(
            s, 4, p, w, opt, punchthrough_min_d=True)))
    run_stage("etc2_full", lambda x: etc.compress_etc2(x, opt, False))


if __name__ == "__main__":
    main()
