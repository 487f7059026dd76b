"""Decoder bit-exactness vs the reference decoders (oracle-encoded blocks)."""

import numpy as np
import pytest

from convectionkernels_tpu import decode_bc6hs, decode_bc6hu, decode_bc7
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def test_decode_bc7(oracle):
    pixels = blockgen.mixed_blocks(64, seed=81)
    blocks = oracle.encode_bc7(pixels)
    ref = oracle.decode_bc7(blocks)
    got = decode_bc7(blocks)
    assert np.array_equal(ref, got)


def test_decode_bc6hu(oracle):
    rng = np.random.default_rng(83)
    vals = rng.uniform(0, 16.0, size=(16, 16, 4)).astype(np.float16)
    px = vals.view(np.int16)
    blocks = oracle.encode_bc6h(px, signed=False)
    ref = oracle.decode_bc6h(blocks, signed=False)
    got = decode_bc6hu(blocks)
    assert np.array_equal(ref, got)


def test_decode_bc6hs(oracle):
    rng = np.random.default_rng(85)
    vals = rng.uniform(-8.0, 8.0, size=(16, 16, 4)).astype(np.float16)
    px = vals.view(np.int16)
    blocks = oracle.encode_bc6h(px, signed=True)
    ref = oracle.decode_bc6h(blocks, signed=True)
    got = decode_bc6hs(blocks)
    assert np.array_equal(ref, got)
