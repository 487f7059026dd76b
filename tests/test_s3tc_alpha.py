"""BC2/BC3/BC4/BC5 bit-exactness vs the reference CVTT scalar oracle."""

import numpy as np
import pytest

import convectionkernels_tpu as ck
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions


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


def test_bc4u(oracle):
    pixels = blockgen.mixed_blocks(96, seed=21)
    _check(oracle.encode_bc4u(pixels), ck.encode_bc4u(pixels), pixels)


def test_bc4s(oracle):
    rng = np.random.default_rng(23)
    pixels = rng.integers(-128, 128, size=(64, 16, 4)).astype(np.int8)
    _check(oracle.encode_bc4s(pixels), ck.encode_bc4s(pixels), pixels)


def test_bc5u(oracle):
    pixels = blockgen.mixed_blocks(64, seed=25)
    _check(oracle.encode_bc5u(pixels), ck.encode_bc5u(pixels), pixels)


def test_bc2(oracle):
    pixels = blockgen.mixed_blocks(64, seed=27)
    _check(oracle.encode_bc2(pixels), ck.encode_bc2(pixels), pixels)


def test_bc3(oracle):
    pixels = blockgen.mixed_blocks(64, seed=29)
    _check(oracle.encode_bc3(pixels), ck.encode_bc3(pixels), pixels)


def test_bc3_flat_alpha(oracle):
    # flat and near-flat alpha exercise the degenerate-span paths
    pixels = blockgen.gradient_blocks(32, seed=31)
    pixels[:16, :, 3] = 255
    pixels[16:, :, 3] = 0
    _check(oracle.encode_bc3(pixels), ck.encode_bc3(pixels), pixels)
