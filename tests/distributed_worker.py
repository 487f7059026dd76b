"""Subprocess worker for the multi-process distributed encode test.

Usage: python -m tests.distributed_worker <port> <nprocs> <pid> <outdir>

Each worker is one "host" of a simulated multi-host job: it initializes
jax.distributed against the shared coordinator, blockifies only its
raster slice of a deterministic test image, encodes over the global
(all-process) device mesh, and writes its shard-local output slice.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=2"
if "--xla_cpu_enable_fast_math" not in _flags:
    _flags += " --xla_cpu_enable_fast_math=false"
if "--xla_cpu_max_isa" not in _flags:
    _flags += " --xla_cpu_max_isa=AVX"  # no FMA contraction (see conftest)
os.environ["XLA_FLAGS"] = _flags.strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

# the TPU plugin overrides JAX_PLATFORMS at registration; force CPU
jax.config.update("jax_platforms", "cpu")

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()


def test_image(h=40, w=44, seed=7):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    return img


def main():
    port, nprocs, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])

    from convectionkernels_tpu import Options
    from convectionkernels_tpu import api
    from convectionkernels_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", nprocs, pid)

    import jax
    assert jax.process_count() == nprocs

    img = test_image()
    fn = api._bc1_fn(Options())
    local, start, n_blocks = distributed.encode_image_distributed(
        fn, img, chunk=8)

    np.savez(os.path.join(outdir, f"out_{pid}.npz"),
             local=local, start=start, n_blocks=n_blocks)

    # also exercise the all-gathered assembly path
    full = distributed.encode_image_distributed(fn, img, chunk=8,
                                                assemble=True)
    np.save(os.path.join(outdir, f"full_{pid}.npy"), full)


if __name__ == "__main__":
    main()
