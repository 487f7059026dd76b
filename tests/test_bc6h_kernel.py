"""BC6H Pallas kernel path vs XLA graph path byte-equality.

The kernel (models/bc6h_kernel.py) and the graph path trace the same
helper functions (quantize/unquantize, TwosCL lane math, refiner,
exact divides), and each lexicographic reduce is replaced by the
sequential strict-less scan it is defined to equal — so the two paths
must agree bit-for-bit. On CPU the kernel runs in Pallas interpret
mode (slow), so the corpus is small and the round counts reduced; the
oracle goldens in test_bc6h.py cover the kernel path natively whenever
the suite runs on a TPU backend.
"""

import os

import numpy as np
import pytest

from convectionkernels_tpu import Options
from convectionkernels_tpu.models import bc6h
from convectionkernels_tpu.options import Flags


def _hdr_blocks(n, seed=3):
    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 16.0, size=(n, 16, 4)).astype(np.float16)
    vals[..., 3] = np.float16(1.0)
    # a few smooth blocks to exercise dedup/near-tie paths
    base = rng.uniform(0, 8.0, size=(n // 4, 1, 4)).astype(np.float16)
    vals[: n // 4] = base + rng.uniform(
        0, 0.25, size=(n // 4, 16, 4)).astype(np.float16)
    return vals.view(np.int16)


def _pack_both(px, opt, is_signed, tweak, refine):
    cw = opt.channel_weights()
    prev = os.environ.get("CONVECTION_BC6H_KERNEL")
    try:
        os.environ["CONVECTION_BC6H_KERNEL"] = "0"
        graph = np.asarray(bc6h.pack(px, opt.flags, cw, is_signed,
                                     tweak, refine))
        os.environ["CONVECTION_BC6H_KERNEL"] = "1"
        kernel = np.asarray(bc6h.pack(px, opt.flags, cw, is_signed,
                                      tweak, refine))
    finally:
        if prev is None:
            os.environ.pop("CONVECTION_BC6H_KERNEL", None)
        else:
            os.environ["CONVECTION_BC6H_KERNEL"] = prev
    return graph, kernel


@pytest.mark.slow
def test_kernel_matches_graph_default_tpu():
    """TPU-native kernel-vs-graph equality at production strength:
    default options (slow indexing), full tweak x refine rounds."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("native kernel path needs a TPU backend")

    opt = Options()
    px = _hdr_blocks(256, seed=5)
    graph, kernel = _pack_both(px, opt, False, opt.seed_points,
                               opt.refine_rounds_bc6h)
    np.testing.assert_array_equal(graph, kernel)


@pytest.mark.slow
def test_kernel_matches_graph_fast_indexing_tpu():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("native kernel path needs a TPU backend")

    opt = Options(flags=Options().flags | Flags.BC6H_FAST_INDEXING)
    px = _hdr_blocks(256, seed=7)
    graph, kernel = _pack_both(px, opt, True, opt.seed_points,
                               opt.refine_rounds_bc6h)
    np.testing.assert_array_equal(graph, kernel)


def test_kernel_matches_graph_interpret():
    """CPU interpret-mode equality on a reduced configuration (the
    interpret path is slow; round counts are cut but every kernel code
    path — tweak seeding, refinement, dedup, inversion — still runs)."""
    opt = Options()
    px = _hdr_blocks(128, seed=11)
    graph, kernel = _pack_both(px, opt, False, 2, 2)
    np.testing.assert_array_equal(graph, kernel)
