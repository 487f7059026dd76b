"""BC7 bit-exactness vs the reference CVTT scalar oracle."""

import numpy as np
import pytest

import convectionkernels_tpu as ck
from convectionkernels_tpu.api import encode_bc7
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


def test_bc7_default_opaque(oracle):
    # opaque gradients: RGB modes + mode 6 path
    pixels = blockgen.gradient_blocks(32, seed=41)
    pixels[..., 3] = 255
    _check(oracle.encode_bc7(pixels), encode_bc7(pixels), pixels)


def test_bc7_default_alpha(oracle):
    # alpha-varying blocks: RGBA modes incl. dual-plane
    pixels = blockgen.alpha_blocks(32, seed=43)
    _check(oracle.encode_bc7(pixels), encode_bc7(pixels), pixels)


def test_bc7_random(oracle):
    pixels = blockgen.random_blocks(32, seed=45)
    _check(oracle.encode_bc7(pixels), encode_bc7(pixels), pixels)


def test_bc7_quality50(oracle):
    pixels = blockgen.gradient_blocks(24, seed=47)
    pixels[..., 3] = 255
    _check(oracle.encode_bc7(pixels, quality=50),
           encode_bc7(pixels, quality=50), pixels)
