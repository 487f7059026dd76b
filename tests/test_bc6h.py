"""BC6H bit-exactness vs the reference CVTT scalar oracle."""

import numpy as np
import pytest

from convectionkernels_tpu.api import encode_bc6hs, encode_bc6hu
from tests.oracle.cvtt_oracle import CvttOracle


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def hdr_blocks(n, seed=0, signed=False):
    """Random half-float blocks in a sane HDR range."""
    rng = np.random.default_rng(seed)
    lo = -4.0 if signed else 0.0
    vals = rng.uniform(lo, 16.0, size=(n, 16, 4)).astype(np.float16)
    vals[..., 3] = np.float16(1.0)
    return vals.view(np.int16)


def smooth_hdr_blocks(n, seed=0, signed=False):
    rng = np.random.default_rng(seed + 9)
    lo = -2.0 if signed else 0.0
    c0 = rng.uniform(lo, 8.0, size=(n, 1, 4)).astype(np.float32)
    c1 = rng.uniform(lo, 8.0, size=(n, 1, 4)).astype(np.float32)
    t = rng.random((n, 16, 1), dtype=np.float32)
    vals = (c0 + (c1 - c0) * t).astype(np.float16)
    return vals.view(np.int16)


def _check(ref, got, pixels):
    got = np.asarray(got)
    mismatched = np.any(ref != got, axis=1)
    assert not mismatched.any(), (
        f"{mismatched.sum()}/{len(pixels)} blocks mismatch; first at "
        f"{np.argmax(mismatched)}:\nref={ref[np.argmax(mismatched)]}\n"
        f"got={got[np.argmax(mismatched)]}\n"
        f"pixels={pixels[np.argmax(mismatched)].tolist()}")


def test_bc6hu_random(oracle):
    px = hdr_blocks(16, seed=51)
    _check(oracle.encode_bc6h(px, signed=False), encode_bc6hu(px), px)


def test_bc6hu_smooth(oracle):
    px = smooth_hdr_blocks(16, seed=53)
    _check(oracle.encode_bc6h(px, signed=False), encode_bc6hu(px), px)


def test_bc6hs(oracle):
    px = smooth_hdr_blocks(16, seed=55, signed=True)
    _check(oracle.encode_bc6h(px, signed=True), encode_bc6hs(px), px)
