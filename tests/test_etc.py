"""ETC1/ETC2/EAC bit-exactness vs the reference CVTT scalar oracle."""

import numpy as np
import pytest

from convectionkernels_tpu import api
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def _check(ref, got, pixels):
    got = np.asarray(got)
    mismatched = np.any(ref != got, axis=1)
    assert not mismatched.any(), (
        f"{mismatched.sum()}/{len(pixels)} blocks mismatch; first at "
        f"{np.argmax(mismatched)}:\nref={ref[np.argmax(mismatched)]}\n"
        f"got={got[np.argmax(mismatched)]}\n"
        f"pixels={pixels[np.argmax(mismatched)].tolist()}")


def test_etc2_alpha(oracle):
    pixels = blockgen.mixed_blocks(64, seed=61)
    _check(oracle.encode_etc2_alpha(pixels), api.encode_etc2_alpha(pixels),
           pixels)


def test_eac11_unsigned(oracle):
    rng = np.random.default_rng(63)
    pixels = rng.integers(0, 2048, size=(32, 16)).astype(np.int16)
    _check(oracle.encode_eac11(pixels, signed=False),
           api.encode_eac11(pixels, signed=False), pixels)


def test_eac11_signed(oracle):
    rng = np.random.default_rng(65)
    pixels = rng.integers(-1024, 1024, size=(32, 16)).astype(np.int16)
    _check(oracle.encode_eac11(pixels, signed=True),
           api.encode_eac11(pixels, signed=True), pixels)


def test_etc1(oracle):
    pixels = blockgen.gradient_blocks(16, seed=67)
    _check(oracle.encode_etc1(pixels), api.encode_etc1(pixels), pixels)


def test_etc2(oracle):
    pixels = blockgen.gradient_blocks(16, seed=69)
    _check(oracle.encode_etc2(pixels), api.encode_etc2(pixels), pixels)


def test_etc2_punchthrough(oracle):
    pixels = blockgen.alpha_blocks(16, seed=71)
    _check(oracle.encode_etc2_punchthrough(pixels),
           api.encode_etc2_punchthrough(pixels), pixels)
