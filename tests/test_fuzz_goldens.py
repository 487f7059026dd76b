"""Large random-block fuzz goldens per format (VERDICT round-1 item 4).

The round-1 corpora were 8-96 blocks; rare paths (float near-ties,
extreme endpoints, punchthrough edges) are thin at that size. These runs
push thousands of uniform-random + structured blocks through every
format at default options and byte-compare against the scalar oracle.

Block counts are calibrated from measured scalar-oracle throughput so
each oracle call stays under ~60 s on this 1-core box:
  bc1 ~1.2 Mtexels/s -> 10240   etc2 ~22 Ktexels/s -> 4096
  bc3 ~185 Ktexels/s -> 10240   bc7(q50) ~13 Ktexels/s -> 2048
  eac ~141 Ktexels/s -> 10240   bc7(max) ~5.9 Ktexels/s -> 1024
  bc5s ~161 Ktexels/s -> 10240  bc6h ~2.4 Ktexels/s -> 512
"""

import numpy as np
import pytest

import convectionkernels_tpu as ck
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def _check(ref, got):
    got = np.asarray(got)
    mismatched = np.any(ref != got, axis=1)
    assert not mismatched.any(), (
        f"{mismatched.sum()}/{len(ref)} blocks mismatch; first at "
        f"{np.argmax(mismatched)}")


def fuzz_blocks(n, seed):
    """Half uniform-random (maximal tie pressure), half structured mix."""
    a = blockgen.random_blocks(n // 2, seed)
    b = blockgen.mixed_blocks(n - n // 2, seed + 1)
    return np.concatenate([a, b], axis=0)


@pytest.mark.slow
def test_fuzz_bc1(oracle):
    px = fuzz_blocks(10240, seed=301)
    _check(oracle.encode_bc1(px), ck.encode_bc1(px))


@pytest.mark.slow
def test_fuzz_bc2(oracle):
    px = fuzz_blocks(10240, seed=303)
    _check(oracle.encode_bc2(px), ck.encode_bc2(px))


@pytest.mark.slow
def test_fuzz_bc3(oracle):
    px = fuzz_blocks(10240, seed=305)
    _check(oracle.encode_bc3(px), ck.encode_bc3(px))


@pytest.mark.slow
def test_fuzz_bc4(oracle):
    px = fuzz_blocks(10240, seed=307)
    _check(oracle.encode_bc4u(px), ck.encode_bc4u(px))


@pytest.mark.slow
def test_fuzz_bc5s(oracle):
    rng = np.random.default_rng(309)
    px = rng.integers(-128, 128, size=(10240, 16, 4),
                      dtype=np.int16).astype(np.int8)
    _check(oracle.encode_bc5s(px), ck.encode_bc5s(px))


@pytest.mark.slow
def test_fuzz_etc1(oracle):
    px = fuzz_blocks(4096, seed=311)
    _check(oracle.encode_etc1(px), ck.encode_etc1(px))


@pytest.mark.slow
def test_fuzz_etc2(oracle):
    px = fuzz_blocks(4096, seed=313)
    _check(oracle.encode_etc2(px), ck.encode_etc2(px))


@pytest.mark.slow
def test_fuzz_etc2_punchthrough(oracle):
    px = fuzz_blocks(4096, seed=315)  # random alpha: all transparency classes
    _check(oracle.encode_etc2_punchthrough(px),
           ck.encode_etc2_punchthrough(px))


@pytest.mark.slow
def test_fuzz_etc2_alpha(oracle):
    px = fuzz_blocks(8192, seed=317)
    _check(oracle.encode_etc2_alpha(px), ck.encode_etc2_alpha(px))


@pytest.mark.slow
def test_fuzz_eac11(oracle):
    rng = np.random.default_rng(319)
    px = rng.integers(0, 2048, size=(10240, 16), dtype=np.int16)
    _check(oracle.encode_eac11(px), ck.encode_eac11(px))


@pytest.mark.slow
def test_fuzz_bc7_q50(oracle):
    px = fuzz_blocks(2048, seed=321)
    _check(oracle.encode_bc7(px, OracleOptions(), quality=50),
           ck.encode_bc7(px, quality=50))


@pytest.mark.slow
def test_fuzz_bc7_max(oracle):
    """Max-quality (default plan): the most state-heavy BC7 path — all 64
    partitions x 243 shapes with the cross-mode combine (BC67.cpp:1602-1660)."""
    px = fuzz_blocks(1024, seed=325)
    _check(oracle.encode_bc7(px, OracleOptions(), quality=0),
           ck.encode_bc7(px))


@pytest.mark.slow
def test_fuzz_bc6hu(oracle):
    rng = np.random.default_rng(323)
    px = rng.uniform(0, 64.0, size=(512, 16, 4)) \
        .astype(np.float16).view(np.int16)
    _check(oracle.encode_bc6h(px), ck.encode_bc6hu(px))
