"""Measure this chip's achievable elementwise f32 throughput through XLA.

The encoders are VPU (elementwise/reduce) programs, so the honest
"speed of light" for utilization claims is the measured rate of a
compute-bound fused elementwise chain — not the MXU TFLOPs headline.
A degree-D polynomial evaluated pointwise does D fused multiply-adds
per 8 bytes of HBM traffic; at D=512 the kernel is arithmetic-bound
(intensity 128 flop/byte >> the ~4.7 flop/byte roofline knee), so the
measured flop rate approaches the VPU ceiling XLA can reach.

Usage: python tools/vpu_peak.py
Prints one JSON line: {"vpu_f32_flops": ..., "hbm_gbps": ...}
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

DEGREE = 512
N = 1 << 24  # 64 MB f32


def _device_ms(jitted, x):
    import jax

    tmp = tempfile.mkdtemp(prefix="vpupeak")
    try:
        with jax.profiler.trace(tmp):
            np.asarray(jitted(x))
        total = 0.0
        for path in glob.glob(tmp + "/**/*.trace.json.gz", recursive=True):
            with gzip.open(path) as f:
                trace = json.load(f)
            evs = trace.get("traceEvents", [])
            device_pids = {
                e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device" in str(e.get("args", {}).get("name", "")).lower()
            }
            total += sum(
                e.get("dur", 0) for e in evs
                if e.get("ph") == "X" and e.get("pid") in device_pids
                and str(e.get("name", "")).startswith("jit_"))
        return total / 1e3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def poly(x):
        acc = x
        for i in range(DEGREE):
            acc = acc * np.float32(0.999998) + np.float32(1e-7)
        return acc

    @jax.jit
    def copy_add(x):
        return x + np.float32(1.0)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random(N, dtype=np.float32))
    np.asarray(poly(x))      # compile
    np.asarray(copy_add(x))

    best_flops = 0.0
    for rep in range(3):
        salt = np.float32((time.time_ns() % 97) * 1e-9)
        xs = x + salt
        ms = _device_ms(poly, xs)
        flops = 2.0 * DEGREE * N / (ms / 1e3)
        best_flops = max(best_flops, flops)

    best_bw = 0.0
    for rep in range(3):
        salt = np.float32((time.time_ns() % 97) * 1e-9)
        xs = x + salt
        ms = _device_ms(copy_add, xs)
        gbps = 2.0 * 4 * N / (ms / 1e3) / 1e9
        best_bw = max(best_bw, gbps)

    print(json.dumps({"vpu_f32_flops": round(best_flops / 1e12, 3),
                      "unit": "Tflop/s",
                      "hbm_gbps": round(best_bw, 1)}))


if __name__ == "__main__":
    main()
