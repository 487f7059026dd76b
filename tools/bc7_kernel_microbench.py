"""Micro-bench the BC7 mode kernel at different NB tile sizes.

Synthesizes one mode-3-shaped call (K=2048, R=2, slow indexing) and
reports device ms per NB. Correctness is covered elsewhere; this is
purely for tile tuning.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bc7_kernel_microbench.py [NB ...]
"""

import sys
import time

import numpy as np

from convectionkernels_tpu.utils import cache as _cache

_cache.enable()


def main():
    import jax
    import jax.numpy as jnp

    from convectionkernels_tpu.models import bc7_kernel

    n = 4096
    k_len = 2048
    mode = 3
    rng = np.random.default_rng(0)

    pix = rng.integers(0, 256, size=(n, 64)).astype(np.int32)
    ep_init = [[jnp.asarray(rng.integers(0, 256, size=(n, k_len)),
                            dtype=jnp.int32) for _ in range(4)]
               for _ in range(2)]
    alpha = jnp.zeros((n, k_len), dtype=jnp.float32)
    consts = np.zeros((19, k_len), dtype=np.int32)
    consts[0] = rng.integers(0, 2, k_len)
    consts[1] = rng.integers(0, 2, k_len)
    consts[2:18] = rng.integers(0, 2, (16, k_len))
    consts[18] = rng.integers(0, 16, k_len)
    cfg = dict(fast_indexing=False, uniform=False,
               cw_sq=[np.float32(0.04), np.float32(0.5), np.float32(0.01),
                      np.float32(1.0)],
               num_real_channels=3, index_range=4)
    cw = [np.float32(0.2), np.float32(0.7), np.float32(0.1),
          np.float32(1.0)]

    for nb in [int(a) for a in (sys.argv[1:] or ["8", "16", "32"])]:
        bc7_kernel.NB = nb

        @jax.jit
        def run(pix, alpha, *eps):
            ep = [[eps[0], eps[1], eps[2], eps[3]],
                  [eps[4], eps[5], eps[6], eps[7]]]
            return bc7_kernel.single_plane_mode_best(
                mode, pix, ep, alpha, consts, cfg, cw, 2)

        args = (jnp.asarray(pix), alpha,
                *ep_init[0], *ep_init[1])
        out = run(*args)
        jax.block_until_ready(out)
        # timing: device trace of one fresh (salted) run
        import glob
        import gzip
        import json
        import shutil
        import tempfile

        pix2 = jnp.asarray(pix ^ np.int32(time.time_ns() & 0x3F))
        tmp = tempfile.mkdtemp(prefix="mb")
        try:
            with jax.profiler.trace(tmp):
                jax.block_until_ready(run(pix2, alpha, *ep_init[0],
                                          *ep_init[1]))
            total = 0.0
            for path in glob.glob(tmp + "/**/*.trace.json.gz",
                                  recursive=True):
                with gzip.open(path) as f:
                    trace = json.load(f)
                evs = trace.get("traceEvents", [])
                pids = {e["pid"] for e in evs
                        if e.get("ph") == "M"
                        and e.get("name") == "process_name"
                        and "device" in str(
                            e.get("args", {}).get("name", "")).lower()}
                total += sum(e.get("dur", 0) for e in evs
                             if e.get("ph") == "X" and e.get("pid") in pids
                             and str(e.get("name", "")).startswith("jit_"))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"NB={nb}: {total/1e3:.2f} ms device for N={n}, K={k_len}")


if __name__ == "__main__":
    main()
