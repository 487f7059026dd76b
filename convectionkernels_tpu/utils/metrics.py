"""Quality metrics and throughput counters.

The reference ships no observability (SURVEY.md section 5); this module adds
the TPU framework's: PSNR/RMSE against decoded output, bit-exact match rates
vs a reference encoding, and Mtexels/s throughput helpers used by bench.py.
"""

from __future__ import annotations

import time

import numpy as np


def psnr(original: np.ndarray, decoded: np.ndarray, peak: float = 255.0):
    """PSNR over all channels (inputs as [N, 16, C] blocks or images)."""
    a = np.asarray(original, dtype=np.float64)
    b = np.asarray(decoded, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def rmse(original: np.ndarray, decoded: np.ndarray) -> float:
    a = np.asarray(original, dtype=np.float64)
    b = np.asarray(decoded, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def match_rate(blocks_a: np.ndarray, blocks_b: np.ndarray) -> float:
    """Fraction of encoded blocks that are byte-identical."""
    a = np.asarray(blocks_a)
    b = np.asarray(blocks_b)
    return float(np.all(a == b, axis=-1).mean())


class Throughput:
    """Mtexels/s timer for encode calls (16 texels per block)."""

    def __init__(self):
        self.start = None
        self.elapsed = 0.0
        self.texels = 0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self.start

    def add_blocks(self, num_blocks: int):
        self.texels += num_blocks * 16

    @property
    def mtexels_per_s(self) -> float:
        return self.texels / self.elapsed / 1e6 if self.elapsed else 0.0


def profile_encode(fn, pixels, trace_dir: str | None = None, iters: int = 3):
    """Time a jitted encode fn; optionally capture a jax.profiler trace."""
    import jax

    out = fn(pixels)
    out.block_until_ready()  # compile + warm

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            out = fn(pixels)
            out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(pixels)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dict(seconds=dt, mtexels_per_s=pixels.shape[0] * 16 / dt / 1e6)
