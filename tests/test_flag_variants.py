"""Bit-exactness for the expensive flag variants (Better/Ultra/FakeBT709).

These compile the largest graphs; they run last (alphabetical file order
keeps them after the light tests) and stay green via the persistent compile
cache once built.
"""

import numpy as np
import pytest

import convectionkernels_tpu as ck
from tests import blockgen
from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions

LIGHT = dict(seed_points=1, refine_rounds_s3tc=1, refine_rounds_iic=1,
             refine_rounds_bc7=1, refine_rounds_bc6h=1)


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


def _check(ref, got, pixels):
    got = np.asarray(got)
    mismatched = np.any(ref != got, axis=1)
    assert not mismatched.any(), (
        f"{mismatched.sum()}/{len(pixels)} blocks mismatch; first at "
        f"{np.argmax(mismatched)}:\nref={ref[np.argmax(mismatched)]}\n"
        f"got={got[np.argmax(mismatched)]}")


def test_bc1_exhaustive_light(oracle):
    flags = ck.Flags.S3TC_PARANOID | ck.Flags.S3TC_EXHAUSTIVE
    px = blockgen.mixed_blocks(32, seed=121)
    _check(oracle.encode_bc1(px, OracleOptions(flags=flags, **LIGHT)),
           ck.encode_bc1(px, ck.Options(flags=flags, **LIGHT)), px)


def test_bc7_slow_indexing_light(oracle):
    # default minus BC7_FastIndexing: the +-1 index retest path
    flags = ck.Flags.S3TC_PARANOID
    px = blockgen.gradient_blocks(16, seed=123)
    px[..., 3] = 255
    _check(oracle.encode_bc7(px, OracleOptions(flags=flags, **LIGHT),
                             quality=5),
           ck.encode_bc7(px, ck.Options(flags=flags, **LIGHT), quality=5),
           px)


def test_bc7_try_single_color_light(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.BC7_TRY_SINGLE_COLOR
    px = blockgen.flat_blocks(16, seed=125)
    px[..., 3] = 255
    _check(oracle.encode_bc7(px, OracleOptions(flags=flags, **LIGHT),
                             quality=5),
           ck.encode_bc7(px, ck.Options(flags=flags, **LIGHT), quality=5),
           px)


def test_etc2_fakebt709_light(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.ETC_USE_FAKE_BT709
    px = blockgen.gradient_blocks(8, seed=127)
    _check(oracle.encode_etc2(px, OracleOptions(flags=flags, **LIGHT)),
           ck.encode_etc2(px, ck.Options(flags=flags, **LIGHT)), px)


def test_bc6h_fast_indexing_light(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.BC6H_FAST_INDEXING
    rng = np.random.default_rng(129)
    px = rng.uniform(0, 8.0, size=(8, 16, 4)).astype(np.float16).view(np.int16)
    _check(oracle.encode_bc6h(px, OracleOptions(flags=flags, **LIGHT),
                              signed=False),
           ck.encode_bc6hu(px, ck.Options(flags=flags, **LIGHT)), px)
