"""Benchmark: Mtexels/s on the real chip vs the reference CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline is the reference CVTT SSE2 build at -O2, single core, measured
on this machine (BASELINE.md protocol). vs_baseline = our Mtexels/s divided
by the reference's Mtexels/s for the same format and options.
"""

import json
import os
import time

import numpy as np

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()


def blockify_test_image(n_blocks: int, seed: int = 42) -> np.ndarray:
    """Gradient+noise blocks approximating natural-image statistics."""
    rng = np.random.default_rng(seed)
    c0 = rng.integers(0, 256, size=(n_blocks, 1, 4)).astype(np.float32)
    c1 = rng.integers(0, 256, size=(n_blocks, 1, 4)).astype(np.float32)
    t = rng.random((n_blocks, 16, 1), dtype=np.float32)
    noise = rng.integers(-8, 9, size=(n_blocks, 16, 4)).astype(np.float32)
    px = np.clip(c0 + (c1 - c0) * t + noise, 0, 255).astype(np.uint8)
    px[..., 3] = 255
    return px


def bench_ours(pixels, iters=5):
    import jax

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import _bc1_fn

    fn = _bc1_fn(Options())
    device_pixels = jax.device_put(pixels)
    out = fn(device_pixels)
    out.block_until_ready()  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(device_pixels)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    texels = pixels.shape[0] * 16
    return texels / dt / 1e6


def bench_reference(pixels, iters=3):
    import ctypes

    from tests.oracle import build_oracle
    from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions

    oracle = CvttOracle("sse2")
    opts = OracleOptions()
    oracle.encode_bc1(pixels[:64], opts)  # warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        oracle.encode_bc1(pixels, opts)
    dt = (time.perf_counter() - t0) / iters
    texels = pixels.shape[0] * 16
    return texels / dt / 1e6


def main():
    n_blocks = 65536  # 1024x1024 image
    pixels = blockify_test_image(n_blocks)

    ours = bench_ours(pixels)
    ref = bench_reference(pixels)

    print(json.dumps({
        "metric": "bc1_encode_throughput",
        "value": round(ours, 3),
        "unit": "Mtexels/s",
        "vs_baseline": round(ours / ref, 3),
    }))


if __name__ == "__main__":
    main()
