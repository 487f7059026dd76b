"""Benchmark: encode throughput on the real chip vs the reference CPU baseline.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: BC7 quality-50 encode throughput (the reference's
flagship codec at a production quality level). vs_baseline = our
Mtexels/s per chip divided by the reference CVTT SSE2 build's
single-core Mtexels/s on this machine for the same format and options
(BASELINE.md protocol; the reference publishes no numbers of its own).

Measurement methodology (important): wall-clock timing through the axon
TPU tunnel is meaningless in both directions — the runtime memoizes
(executable, inputs) pairs (round 1's same-input loop numbers were
inflated ~400x), and every fresh execution re-ships the multi-MB
compiled executable (~30 MB/s), which would deflate honest wall-clock
numbers by a similar factor. The honest per-chip metric is the
ON-DEVICE execution time of one fresh (non-memoized) run, read from the
jax.profiler device trace — that is what a production deployment (where
the executable is resident) would see. A salted input guarantees the
profiled run is not a memoized replay.

Per-format details are printed to stderr.
"""

import json
import sys
import time

import numpy as np

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

# Reference-baseline measurement slice: SSE2 single-core rates are stable
# well below this count; keeping it small bounds total bench wall-clock.
REF_SLICE_BLOCKS = 2048

# Device-side measurement batch (one compiled program's worth of blocks).
BENCH_BLOCKS = 65536


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


def _device_exec_seconds(traced) -> float:
    """Sum of top-level program executions on the device lane of a
    jax.profiler chrome trace."""
    import glob
    import gzip

    total = 0.0
    for path in glob.glob(traced + "/**/*.trace.json.gz", recursive=True):
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
    return total / 1e6


def bench_ours(fn, pixels):
    """On-device execution time of one fresh run via jax.profiler
    (see module docstring). Falls back to wall clock when the trace has
    no device lane (pure-CPU runs)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    @jax.jit
    def salt_input(x, salt):
        # vary low bits so each profiled run is a globally fresh input
        d = jnp.full((), salt, dtype=jnp.int32) & 0x7F
        return x ^ d.astype(x.dtype)

    x0 = jax.device_put(pixels)
    np.asarray(fn(x0))  # compile + settle

    salt = np.int32(time.time_ns() & 0x3FFFFFFF)
    best = None
    for rep in range(2):
        x = salt_input(x0, salt + np.int32(rep + 1))
        tmp = tempfile.mkdtemp(prefix="benchtrace")
        try:
            t0 = time.perf_counter()
            with jax.profiler.trace(tmp):
                np.asarray(fn(x))
            wall = time.perf_counter() - t0
            dev = _device_exec_seconds(tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        dt = dev if dev > 0 else wall
        best = dt if best is None or dt < best else best
    return pixels.shape[0] * 16 / best / 1e6


def bench_reference(name, pixels, iters=1, **kwargs):
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
    import os

    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import (_bc1_fn, _bc3_fn, _bc6h_fn,
                                           _bc7_fn, _eac_fn, _etc_fn)
    from convectionkernels_tpu.bc7_plan import (BC7EncodingPlan,
                                                plan_from_quality)

    # Skip-and-log remaining formats when the wall-clock deadline nears:
    # one slow format must never starve the rest of the record (VERDICT r2).
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    deadline = time.perf_counter() + budget_s

    opt = Options()
    px = blockify_test_image(BENCH_BLOCKS)
    hdr = hdr_test_blocks(BENCH_BLOCKS)
    rng = np.random.default_rng(44)
    s16 = rng.integers(0, 2048, size=(BENCH_BLOCKS, 16), dtype=np.int16)
    # punchthrough input needs real transparency variation or the
    # classification short-circuits to the opaque path
    px_alpha = px.copy()
    px_alpha[..., 3] = rng.integers(0, 256, size=(BENCH_BLOCKS, 16))

    ref_px = px[:REF_SLICE_BLOCKS]
    ref_hdr = hdr[:REF_SLICE_BLOCKS]
    ref_s16 = s16[:REF_SLICE_BLOCKS]

    results = {}
    # Headline format FIRST so its JSON lands even if a later format blows
    # the budget; then the formats with no prior recorded measurement
    # (bc6hu, bc7_q100), then the rest. Reference slices for the ultra-slow
    # oracle configs are shrunk so SSE2 time stays bounded (rates are
    # stable well below these counts).
    for name, fn, pixels, ref in [
        ("bc7_q50", _bc7_fn(opt, plan_from_quality(50)), px,
         ("bc7", ref_px[:1024], {"quality": 50})),
        ("bc6hu", _bc6h_fn(opt, False), hdr,
         ("bc6h", ref_hdr[:256], {"signed": False})),
        ("bc7_q100", _bc7_fn(opt, BC7EncodingPlan()), px,
         ("bc7", ref_px[:128], {"quality": 0})),
        ("bc1", _bc1_fn(opt), px, ("bc1", ref_px, {})),
        ("bc3", _bc3_fn(opt), px, ("bc3", ref_px, {})),
        ("etc2", _etc_fn(opt, "etc2"), px,
         ("etc2", ref_px[:1024], {})),
        ("etc2_punchthrough", _etc_fn(opt, "etc2_pt"), px_alpha,
         ("etc2_punchthrough", px_alpha[:1024], {})),
        ("eac_r11", _eac_fn(opt, False), s16,
         ("eac11", ref_s16, {})),
    ]:
        if name != "bc7_q50" and time.perf_counter() > deadline - 60:
            print(f"{name}: SKIPPED (bench budget {budget_s:.0f}s exhausted)",
                  file=sys.stderr, flush=True)
            continue
        # profile ONE chunk-sized program execution: the chunked wrapper's
        # 16 dispatches each re-upload the executable through the tunnel,
        # which overflows the profiler window; one chunk is the honest
        # per-chip steady-state unit (the product path just repeats it)
        try:
            n_bench = min(pixels.shape[0], fn.chunk)
            ours = bench_ours(fn.jitted_body, pixels[:n_bench])
            ref_name, ref_pixels, ref_kwargs = ref
            ref_rate = bench_reference(ref_name, ref_pixels, **ref_kwargs)
        except Exception as exc:  # keep the headline alive: the remote
            # compile helper can be OOM-killed under concurrent compiles
            print(f"{name}: FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:200]})", file=sys.stderr, flush=True)
            continue
        results[name] = (ours, ref_rate, ours / ref_rate)
        print(f"{name}: ours {ours:.1f} Mtexels/s, reference SSE2 "
              f"{ref_rate:.3f} Mtexels/s, speedup {ours / ref_rate:.1f}x",
              file=sys.stderr, flush=True)
        if name == "bc7_q50":
            # emit the headline JSON the moment it exists — nothing that
            # happens later in the run can lose it
            print(json.dumps({
                "metric": "bc7_q50_encode_throughput",
                "value": round(ours, 3),
                "unit": "Mtexels/s",
                "vs_baseline": round(ours / ref_rate, 3),
            }), flush=True)

    if "bc7_q50" not in results:
        raise SystemExit("bc7_q50 headline measurement failed")


if __name__ == "__main__":
    main()
