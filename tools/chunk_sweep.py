"""Chunk-size sweep: on-device time per chunk vs chunk size.

The heavy codecs (ETC, BC6H, BC7) run in 4096-block chunks to bound the
HBM held by their candidate tensors. Their per-chunk device time is
dominated by *fixed* small-op overhead (profile_formats.py), so a larger
chunk amortizes that overhead over more texels. This sweep measures the
real trade-off on the attached chip to pick per-codec chunk sizes.

Usage: python tools/chunk_sweep.py [fmt ...]
(default: etc2 bc6hu bc7_q50 eac_r11)

Results are appended into CHUNK_SWEEP.json at the repo root (the
committed record backing the api.py chunk constants).

The printed `wall` spans the whole bench_ours call — compile + warm-up
run + 2 profiled repetitions — so read it as an upper bound on compile
time, not a pure compile figure.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

from bench import blockify_test_image, hdr_test_blocks, bench_ours  # noqa: E402


def main():
    from convectionkernels_tpu import Options
    from convectionkernels_tpu.api import _bc6h_fn, _bc7_fn, _eac_fn, _etc_fn
    from convectionkernels_tpu.bc7_plan import plan_from_quality

    fmts = sys.argv[1:] or ["etc2", "bc6hu", "bc7_q50", "eac_r11"]
    opt = Options()
    rng = np.random.default_rng(44)

    builders = {
        "etc2": (lambda: _etc_fn(opt, "etc2").body, blockify_test_image),
        "eac_r11": (lambda: _eac_fn(opt, False).body,
                    lambda n: rng.integers(0, 2048, size=(n, 16),
                                           dtype=np.int16)),
        "bc6hu": (lambda: _bc6h_fn(opt, False).body, hdr_test_blocks),
        "bc7_q50": (lambda: _bc7_fn(opt, plan_from_quality(50)).body,
                    blockify_test_image),
    }

    unknown = [f for f in fmts if f not in builders]
    if unknown:
        raise SystemExit(f"unknown format(s) {unknown}; "
                         f"supported: {sorted(builders)}")

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CHUNK_SWEEP.json")
    try:
        with open(out_path) as f:
            record = json.load(f)
    except (OSError, ValueError):
        record = {}

    for fmt in fmts:
        make_body, make_px = builders[fmt]
        body = make_body()
        import jax
        jitted = jax.jit(body)
        record.setdefault(fmt, {})
        sizes = tuple(int(s) for s in os.environ.get(
            "CHUNK_SWEEP_SIZES", "1024,2048,4096,8192,16384").split(","))
        for n in sizes:
            px = make_px(n)
            try:
                t0 = time.perf_counter()
                reps_s, _ = bench_ours(jitted, px)
                rate = n * 16 / min(reps_s) / 1e6
                wall = time.perf_counter() - t0
            except Exception as exc:
                print(f"{fmt} chunk={n}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
                break
            record[fmt][str(n)] = {
                "mtexels_per_s": round(rate, 3),
                "reps_device_ms": [round(t * 1e3, 3) for t in reps_s],
            }
            print(f"{fmt} chunk={n}: {rate:.2f} Mtexels/s "
                  f"(reps {['%.2f' % (t * 1e3) for t in reps_s]} ms, "
                  f"incl-compile wall {wall:.0f}s)", flush=True)
            with open(out_path, "w") as f:
                json.dump(record, f, indent=1, sort_keys=True)
                f.write("\n")


if __name__ == "__main__":
    main()
