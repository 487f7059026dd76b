"""BC1 bit-exactness vs the reference CVTT scalar oracle."""

import numpy as np
import pytest

import convectionkernels_tpu as ck
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def _compare_bc1(oracle, pixels, ck_opts, or_opts):
    ref = oracle.encode_bc1(pixels, or_opts)
    got = np.asarray(ck.encode_bc1(pixels, ck_opts))
    mismatched = np.any(ref != got, axis=1)
    assert not mismatched.any(), (
        f"{mismatched.sum()}/{len(pixels)} blocks mismatch; first at "
        f"{np.argmax(mismatched)}:\nref={ref[np.argmax(mismatched)]}\n"
        f"got={got[np.argmax(mismatched)]}\n"
        f"pixels={pixels[np.argmax(mismatched)]}")


def test_bc1_default_mixed(oracle):
    pixels = blockgen.mixed_blocks(128, seed=7)
    _compare_bc1(oracle, pixels, ck.Options(), OracleOptions())


def test_bc1_default_random(oracle):
    pixels = blockgen.random_blocks(256, seed=11)
    _compare_bc1(oracle, pixels, ck.Options(), OracleOptions())


def test_bc1_uniform_flag(oracle):
    flags = ck.Flags.UNIFORM | ck.Flags.BC7_FAST_INDEXING
    pixels = blockgen.mixed_blocks(64, seed=13)
    _compare_bc1(oracle, pixels, ck.Options(flags=flags),
                 OracleOptions(flags=flags))


def test_bc1_no_paranoid(oracle):
    flags = ck.Flags.BC7_FAST_INDEXING  # integer error path
    pixels = blockgen.mixed_blocks(64, seed=17)
    _compare_bc1(oracle, pixels, ck.Options(flags=flags),
                 OracleOptions(flags=flags))
