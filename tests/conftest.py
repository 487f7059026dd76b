"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths can be exercised without TPU hardware.

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "--xla_cpu_enable_fast_math" not in _flags:
    # XLA:CPU's fast-math default approximates f32 division (reciprocal +
    # Newton), which breaks bit-exactness vs the IEEE-dividing reference.
    _flags = (_flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = _flags

# persistent compilation cache: recompiles of unchanged encoder graphs are
# instant across test runs (this box has 1 CPU; cold compiles take minutes).
# NOTE: must go through jax.config.update — this JAX build ignores the
# JAX_COMPILATION_CACHE_DIR env var.
from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()
