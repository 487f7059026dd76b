"""The lax.map block-axis chunking (api._chunked) is invisible to results.

Forces tiny chunk sizes so the map path, the remainder padding, and the
pad-strip logic are all exercised, then asserts byte equality against the
reference oracle (blocks are independent, so chunking must not change any
output).
"""

import numpy as np
import pytest

import convectionkernels_tpu.api as api
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


@pytest.fixture()
def tiny_chunks(monkeypatch):
    monkeypatch.setattr(api, "_CHUNK_LIGHT", 24)
    monkeypatch.setattr(api, "_CHUNK_HEAVY", 24)
    api._bc1_fn.cache_clear()
    api._rgb_noalpha_fn.cache_clear()
    api._bc3_fn.cache_clear()
    yield
    api._bc1_fn.cache_clear()
    api._rgb_noalpha_fn.cache_clear()
    api._bc3_fn.cache_clear()


def test_bc1_chunked_exact_multiple(oracle, tiny_chunks):
    px = blockgen.mixed_blocks(96, seed=77)  # 4 chunks of 24
    ref = oracle.encode_bc1(px)
    got = np.asarray(api.encode_bc1(px))
    assert (ref == got).all()


def test_bc1_chunked_with_padding(oracle, tiny_chunks):
    px = blockgen.mixed_blocks(96, seed=77)[:80]  # 3 chunks + remainder 8
    ref = oracle.encode_bc1(px)
    got = np.asarray(api.encode_bc1(px))
    assert (ref == got).all()


def test_bc3_chunked(oracle, tiny_chunks):
    px = blockgen.mixed_blocks(96, seed=77)
    ref = oracle.encode_bc3(px)
    got = np.asarray(api.encode_bc3(px))
    assert (ref == got).all()
