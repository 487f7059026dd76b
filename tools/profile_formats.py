"""Per-stage device profiler for the encode programs.

For each requested format, runs ONE fresh (salted, non-memoized) chunk
through the compiled encoder under jax.profiler and prints:
  - total on-device time and Mtexels/s
  - the top-K device ops by time, with the fusion's originating HLO names

This is the measurement companion to bench.py (same honest-timing
methodology, see bench.py docstring): it answers *where* the time goes
inside the program, so kernel work (Pallas/layout) targets the real
hotspot rather than the assumed one.

Usage: python tools/profile_formats.py [fmt ...]  (default: a spread)
"""

import glob
import gzip
import json
import shutil
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

from convectionkernels_tpu.utils import cache as _cache

_cache.enable()


def _device_events(tracedir):
    evs_out = []
    for path in glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(path) as f:
            trace = json.load(f)
        evs = trace.get("traceEvents", [])
        device_pids = {
            e["pid"] for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "device" in str(e.get("args", {}).get("name", "")).lower()
        }
        evs_out.extend(e for e in evs
                       if e.get("ph") == "X" and e.get("pid") in device_pids)
    return evs_out


def profile_fn(fn, x, label, top_k=14):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def salt_input(v, salt):
        d = jnp.full((), salt, dtype=jnp.int32) & 0x7F
        return v ^ d.astype(v.dtype)

    x0 = jax.device_put(x)
    np.asarray(fn(x0))  # compile + settle
    salted = salt_input(x0, np.int32(time.time_ns() & 0x3FFFFFFF))

    tmp = tempfile.mkdtemp(prefix="profmt")
    try:
        with jax.profiler.trace(tmp):
            np.asarray(fn(salted))
        evs = _device_events(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    prog = [e for e in evs if str(e.get("name", "")).startswith("jit_")]
    total = sum(e.get("dur", 0) for e in prog) / 1e6
    # op-level events: everything on the device lane that is not the
    # enclosing program slice (trace viewer nests ops under the program)
    ops = defaultdict(float)
    for e in evs:
        name = str(e.get("name", ""))
        if name.startswith("jit_") or not name:
            continue
        ops[name] += e.get("dur", 0) / 1e6

    texels = x.shape[0] * 16
    print(f"\n=== {label}: {total * 1e3:.2f} ms device, "
          f"{texels / max(total, 1e-9) / 1e6:.1f} Mtexels/s "
          f"({x.shape[0]} blocks) ===")
    ranked = sorted(ops.items(), key=lambda kv: -kv[1])
    op_total = sum(ops.values())
    shown = 0.0
    for name, dur in ranked[:top_k]:
        shown += dur
        print(f"  {dur * 1e3:8.2f} ms  {100 * dur / max(op_total, 1e-9):5.1f}%"
              f"  {name[:110]}")
    if len(ranked) > top_k:
        print(f"  {(op_total - shown) * 1e3:8.2f} ms  (other "
              f"{len(ranked) - top_k} ops)")
    return total


def main():
    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import (_bc1_fn, _bc3_fn, _bc6h_fn,
                                           _bc7_fn, _eac_fn, _etc_fn)
    from convectionkernels_tpu.bc7_plan import (BC7EncodingPlan,
                                                plan_from_quality)
    from bench import blockify_test_image, hdr_test_blocks

    opt = Options()
    want = sys.argv[1:] or ["etc2", "bc7_q50", "bc7_q100", "bc6hu"]

    registry = {}
    registry["bc1"] = (_bc1_fn(opt), "u8")
    registry["bc3"] = (_bc3_fn(opt), "u8")
    registry["etc1"] = (_etc_fn(opt, "etc1"), "u8")
    registry["etc2"] = (_etc_fn(opt, "etc2"), "u8")
    registry["etc2_pt"] = (_etc_fn(opt, "etc2_pt"), "u8a")
    registry["eac_r11"] = (_eac_fn(opt, False), "s16")
    registry["bc7_q50"] = (_bc7_fn(opt, plan_from_quality(50)), "u8")
    registry["bc7_q100"] = (_bc7_fn(opt, BC7EncodingPlan()), "u8")
    registry["bc6hu"] = (_bc6h_fn(opt, False), "hdr")

    rng = np.random.default_rng(44)
    for name in want:
        fn, kind = registry[name]
        n = fn.chunk
        if kind == "u8":
            x = blockify_test_image(n)
        elif kind == "u8a":
            x = blockify_test_image(n)
            x[..., 3] = rng.integers(0, 256, size=(n, 16))
        elif kind == "hdr":
            x = hdr_test_blocks(n)
        else:
            x = rng.integers(0, 2048, size=(n, 16), dtype=np.int16)
        profile_fn(fn.jitted_body, x, name)


if __name__ == "__main__":
    main()
