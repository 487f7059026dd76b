"""Benchmark: encode throughput on the real chip vs the reference CPU baseline.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: BC7 quality-50 encode throughput (the reference's
flagship codec at a production quality level). vs_baseline = our
Mtexels/s per chip divided by the reference CVTT SSE2 build's
single-core Mtexels/s on this machine for the same format and options
(BASELINE.md protocol; the reference publishes no numbers of its own).

Per-format details (BC1/BC3/ETC2/BC6H and the reference baselines) are
printed to stderr.
"""

import json
import sys
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


def hdr_test_blocks(n_blocks: int, seed: int = 43) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 16.0, size=(n_blocks, 16, 4)).astype(np.float16)
    vals[..., 3] = np.float16(1.0)
    return vals.view(np.int16)


# Reference-baseline measurement slice: SSE2 single-core rates are stable
# well below this count; keeping it small bounds total bench wall-clock.
REF_SLICE_BLOCKS = 4096


def bench_ours(fn, pixels, iters=5):
    import jax

    device_pixels = jax.device_put(pixels)
    out = fn(device_pixels)
    out.block_until_ready()  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(device_pixels)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return pixels.shape[0] * 16 / dt / 1e6


def bench_reference(name, pixels, iters=2, **kwargs):
    """Reference CVTT SSE2 build at -O2, single core."""
    from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions

    oracle = CvttOracle("sse2")
    opts = OracleOptions()
    fn = getattr(oracle, f"encode_{name}")
    fn(pixels[:64], opts, **kwargs)  # warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        fn(pixels, opts, **kwargs)
    dt = (time.perf_counter() - t0) / iters
    return pixels.shape[0] * 16 / dt / 1e6


def main():
    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import (_bc1_fn, _bc3_fn, _bc6h_fn,
                                           _bc7_fn, _etc_fn)
    from convectionkernels_tpu.bc7_plan import plan_from_quality

    opt = Options()
    n_blocks = 65536  # 1024x1024 image
    px = blockify_test_image(n_blocks)
    hdr = hdr_test_blocks(n_blocks)

    # reference rates are estimated on a smaller slice (SSE2 single core is
    # ~3 orders of magnitude slower; this many blocks is plenty for a
    # stable rate at iters=2)
    ref_slice = REF_SLICE_BLOCKS
    ref_px = px[:ref_slice]
    ref_hdr = hdr[:ref_slice]

    results = {}
    headline = None
    for name, fn, pixels, ref in [
        ("bc1", _bc1_fn(opt), px, ("bc1", ref_px, {})),
        ("bc3", _bc3_fn(opt), px, ("bc3", ref_px, {})),
        ("etc2", _etc_fn(opt, "etc2"), px, ("etc2", ref_px, {})),
        ("bc7_q50", _bc7_fn(opt, plan_from_quality(50)), px,
         ("bc7", ref_px, {"quality": 50})),
        ("bc6hu", _bc6h_fn(opt, False), hdr,
         ("bc6h", ref_hdr, {"signed": False})),
    ]:
        ours = bench_ours(fn, pixels)
        ref_name, ref_pixels, ref_kwargs = ref
        ref_rate = bench_reference(ref_name, ref_pixels, **ref_kwargs)
        results[name] = (ours, ref_rate, ours / ref_rate)
        print(f"{name}: ours {ours:.1f} Mtexels/s, reference SSE2 "
              f"{ref_rate:.3f} Mtexels/s, speedup {ours / ref_rate:.1f}x",
              file=sys.stderr, flush=True)
        if name == "bc7_q50":
            headline = (ours, ref_rate)

    assert headline is not None, "bc7_q50 headline entry missing from bench list"
    ours, ref_rate = headline
    print(json.dumps({
        "metric": "bc7_q50_encode_throughput",
        "value": round(ours, 3),
        "unit": "Mtexels/s",
        "vs_baseline": round(ours / ref_rate, 3),
    }))


if __name__ == "__main__":
    main()
