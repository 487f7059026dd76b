"""Batch-size bucketing (api._wrap/_bucket_size) bounds XLA compiles.

Arbitrary image sizes must reuse a small fixed set of compiled programs:
one [chunk]-sized body program for every N >= chunk, plus power-of-two
bucket programs below the chunk size. Encoding two different-sized
batches in the same bucket must trigger no new compile, and results must
be byte-identical to the oracle regardless of padding.
"""

import numpy as np
import pytest

import convectionkernels_tpu.api as api
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def test_bucket_size_policy():
    assert api._bucket_size(1, 4096) == 256
    assert api._bucket_size(256, 4096) == 256
    assert api._bucket_size(257, 4096) == 512
    assert api._bucket_size(3000, 4096) == 4096
    assert api._bucket_size(4096, 4096) == 4096
    assert api._bucket_size(4097, 4096) == 8192
    assert api._bucket_size(9000, 4096) == 12288
    # tiny chunk (test configurations): bucket never exceeds the chunk
    assert api._bucket_size(20, 24) == 24
    assert api._bucket_size(5, 24) == 24


def test_same_bucket_reuses_program(oracle):
    fn = api._bc1_fn(api.Options())
    base = fn.jitted_body._cache_size()

    px_a = blockgen.mixed_blocks(40, seed=11)
    px_b = blockgen.mixed_blocks(72, seed=12)
    got_a = np.asarray(api.encode_bc1(px_a))
    after_a = fn.jitted_body._cache_size()
    got_b = np.asarray(api.encode_bc1(px_b))
    after_b = fn.jitted_body._cache_size()

    # both 40 and 72 pad to the 256 bucket: at most one new program for
    # the first call (zero when an earlier test already hit the bucket),
    # and the second call must not add any
    assert after_a <= base + 1
    assert after_b == after_a

    assert (got_a == oracle.encode_bc1(px_a)).all()
    assert (got_b == oracle.encode_bc1(px_b)).all()


def test_multi_chunk_reuses_single_program(monkeypatch, oracle):
    monkeypatch.setattr(api, "_CHUNK_LIGHT", 24)
    monkeypatch.setattr(api, "_CHUNK_HEAVY", 24)
    api._bc1_fn.cache_clear()
    try:
        fn = api._bc1_fn(api.Options())
        base = fn.jitted_body._cache_size()

        px_a = blockgen.mixed_blocks(56, seed=13)   # 3 chunks of 24 (pad 72)
        px_b = blockgen.mixed_blocks(104, seed=14)  # 5 chunks of 24 (pad 120)
        got_a = np.asarray(api.encode_bc1(px_a))
        got_b = np.asarray(api.encode_bc1(px_b))

        # every N >= chunk reuses the one [chunk]-sized program
        assert fn.jitted_body._cache_size() == base + 1

        assert (got_a == oracle.encode_bc1(px_a)).all()
        assert (got_b == oracle.encode_bc1(px_b)).all()
    finally:
        api._bc1_fn.cache_clear()
