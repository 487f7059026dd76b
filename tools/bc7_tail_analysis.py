"""Attribute an encode program's device op time to source lines.

Compiles the chunk program on the TPU, profiles one fresh run, then
maps each device op name (fusion.N etc.) to the HLO instruction's
source metadata and aggregates device time per source file:line.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bc7_tail_analysis.py [fmt]
fmt: bc7_q50 / bc7_q100 / etc2 / etc1 / eac_r11 / bc6hu / bc1 / bc3 (default bc7_q50)
"""

import re
import sys
from collections import defaultdict

import numpy as np

from convectionkernels_tpu.utils import cache as _cache

_cache.enable()


def main():
    import jax

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import _bc7_fn
    from convectionkernels_tpu.bc7_plan import (BC7EncodingPlan,
                                                plan_from_quality)
    from bench import blockify_test_image
    from tools.profile_formats import _device_events
    import gzip
    import json
    import glob
    import shutil
    import tempfile
    import time

    from convectionkernels_tpu.api import (_bc1_fn, _bc3_fn, _bc6h_fn,
                                           _eac_fn, _etc_fn)
    from bench import hdr_test_blocks

    fmt = sys.argv[1] if len(sys.argv) > 1 else "bc7_q50"
    opt = Options()
    if fmt.startswith("bc7_q"):
        q = int(fmt[5:])
        plan = BC7EncodingPlan() if q >= 100 else plan_from_quality(q)
        fn = _bc7_fn(opt, plan)
        x = blockify_test_image(fn.chunk)
    elif fmt in ("etc1", "etc2", "etc2_pt", "etc2_rgba", "etc2_alpha"):
        fn = _etc_fn(opt, fmt)
        x = blockify_test_image(fn.chunk)
    elif fmt == "eac_r11":
        fn = _eac_fn(opt, False)
        x = np.random.default_rng(44).integers(
            0, 2048, size=(fn.chunk, 16), dtype=np.int16)
    elif fmt == "bc6hu":
        fn = _bc6h_fn(opt, False)
        x = hdr_test_blocks(fn.chunk)
    elif fmt == "bc1":
        fn = _bc1_fn(opt)
        x = blockify_test_image(fn.chunk)
    elif fmt == "bc3":
        fn = _bc3_fn(opt)
        x = blockify_test_image(fn.chunk)
    else:
        raise SystemExit(f"unknown fmt {fmt}")

    jitted = fn.jitted_body
    import jax.numpy as jnp

    x0 = jax.device_put(x)
    compiled = jitted.lower(x0).compile()
    hlo = compiled.as_text()

    # op name -> "file:line" from metadata
    meta = {}
    pat = re.compile(
        r"%?([\w.\-]+) = .*?metadata={[^}]*?source_file=\"([^\"]+)\""
        r"[^}]*?source_line=(\d+)")
    for m in pat.finditer(hlo):
        name, f, line = m.groups()
        meta[name] = f"{f.split('/')[-1]}:{line}"

    np.asarray(jitted(x0))  # settle

    @jax.jit
    def salt_input(v, salt):
        d = jnp.full((), salt, dtype=jnp.int32) & 0x7F
        return v ^ d.astype(v.dtype)

    salted = salt_input(x0, np.int32(time.time_ns() & 0x3FFFFFFF))
    tmp = tempfile.mkdtemp(prefix="tailprof")
    try:
        with jax.profiler.trace(tmp):
            np.asarray(jitted(salted))
        evs = _device_events(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    by_src = defaultdict(float)
    total = 0.0
    for e in evs:
        name = str(e.get("name", ""))
        if name.startswith("jit_") or not name:
            continue
        dur = e.get("dur", 0) / 1e6
        total += dur
        by_src[meta.get(name, f"<unmapped:{name.split('.')[0]}>")] += dur

    print(f"total op time {total*1e3:.1f} ms; top sources:")
    for src, dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur*1e3:8.2f} ms  {src}")


if __name__ == "__main__":
    main()
