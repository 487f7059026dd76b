"""Sub-stage device profile INSIDE compress_etc1_internal (the dominant
ETC2 stage per profile_etc_stages.py): splits the differential-mode cost
into (a) candidate generation + TestHalfBlock error scan and (b) the
O(A^2) differential pair resolve, for one flip.

Usage: python tools/profile_etc1_internals.py
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
    from convectionkernels_tpu.models.etc import (
        FLIP_TABLES, _padded_offsets, _quantize_etc1_base, _test_half_block,
        _unique_rank, _resolve_differential)
    from convectionkernels_tpu.tables import etc_tables

    opt = Options()
    n = 4096
    px = blockify_test_image(n)

    offsets, _ = _padded_offsets()
    c_count = offsets.shape[1]
    modifiers = np.asarray(etc_tables.ETC1_MODIFIER_TABLES)

    def diff_candidates(pixels_u8, flip):
        pixels, pw = etc.extract_blocks(pixels_u8, opt)
        kb = etc.ETC1_RUN_BOUNDS[True]
        diff_data = []
        for sector in range(2):
            cum = [None] * 3
            sector_pixels = []
            sector_pw = []
            for p in range(8):
                src = int(FLIP_TABLES[flip][sector][p])
                sector_pixels.append(pixels[src])
                sector_pw.append(pw[src])
                for ch in range(3):
                    v = pixels[src][ch]
                    cum[ch] = v if cum[ch] is None else cum[ch] + v
            error, colors, selectors, tables_b = etc._etc1_candidates_dedup(
                cum, sector_pixels, sector_pw, True, opt)
            urank = jnp.broadcast_to(
                jnp.arange(error.shape[1], dtype=jnp.int32)[None, :],
                error.shape)
            row_chunks = tuple(
                (int(s), int(s + k))
                for s, k in zip(np.cumsum((0,) + kb[:-1]), kb))
            diff_data.append(dict(
                error=error, color=colors, selectors=selectors,
                table=tables_b, urank=urank, row_chunks=row_chunks))
        return diff_data

    def scan_only(pixels_u8):
        dd = diff_candidates(pixels_u8, 0)
        return [d["error"] for d in dd] + [d["color"] for d in dd]

    def resolve_only(pixels_u8):
        dd = diff_candidates(pixels_u8, 0)
        # feed through optimization_barrier so XLA can't fuse the scan
        # into the resolve (we want the resolve cost in isolation);
        # subtract the scan-only time to get it exactly either way
        win = _resolve_differential(
            dd, pixels_u8.shape[0],
            jnp.full((pixels_u8.shape[0],), np.float32(1e30)))
        return win[0]["total"], win[0]["color"], win[1]["color"]

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
        tmp = tempfile.mkdtemp(prefix="etc1int")
        try:
            t0 = time.perf_counter()
            with jax.profiler.trace(tmp):
                np.asarray(jax.tree_util.tree_leaves(jitted(x))[0])
            wall = time.perf_counter() - t0
            total = 0.0
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
                    if (e.get("ph") == "X" and e.get("pid") in device_pids
                            and str(e.get("name", "")).startswith("jit_")):
                        total += e.get("dur", 0) / 1e6
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"{name:28s} {total * 1e3:8.2f} ms device (wall {wall:.1f}s)",
              flush=True)
        return total

    t_scan = run_stage("scan_only (1 flip, 2 sec)", scan_only)
    t_full = run_stage("scan+resolve (1 flip)", resolve_only)
    print(f"{'resolve (by subtraction)':28s} {(t_full - t_scan) * 1e3:8.2f}"
          " ms device", flush=True)


if __name__ == "__main__":
    main()
