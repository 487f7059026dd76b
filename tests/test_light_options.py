"""Fast bit-exactness tests: reduced seed/refine rounds -> small graphs.

These compile in seconds-to-a-minute on the 1-CPU test box and cover the
same code paths as the default-options tests (which compile the full search
graphs and populate the persistent cache).
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
        f"got={got[np.argmax(mismatched)]}\n"
        f"pixels={pixels[np.argmax(mismatched)].tolist()}")


CKO = ck.Options(**LIGHT)
ORO = OracleOptions(**LIGHT)


def test_bc1_light(oracle):
    px = blockgen.mixed_blocks(96, seed=101)
    _check(oracle.encode_bc1(px, ORO), ck.encode_bc1(px, CKO), px)


def test_bc4_light(oracle):
    px = blockgen.mixed_blocks(96, seed=103)
    _check(oracle.encode_bc4u(px, ORO), ck.encode_bc4u(px, CKO), px)


def test_bc3_light(oracle):
    px = blockgen.mixed_blocks(64, seed=105)
    _check(oracle.encode_bc3(px, ORO), ck.encode_bc3(px, CKO), px)


def test_bc7_light(oracle):
    px = blockgen.gradient_blocks(24, seed=107)
    px[..., 3] = 255
    _check(oracle.encode_bc7(px, ORO, quality=5),
           ck.encode_bc7(px, CKO, quality=5), px)


def test_bc7_light_alpha(oracle):
    px = blockgen.alpha_blocks(24, seed=109)
    _check(oracle.encode_bc7(px, ORO, quality=5),
           ck.encode_bc7(px, CKO, quality=5), px)


def test_bc6h_light(oracle):
    rng = np.random.default_rng(111)
    px = rng.uniform(0, 8.0, size=(16, 16, 4)).astype(np.float16).view(np.int16)
    _check(oracle.encode_bc6h(px, ORO, signed=False),
           ck.encode_bc6hu(px, CKO), px)


def test_etc2_alpha_light(oracle):
    px = blockgen.mixed_blocks(64, seed=113)
    _check(oracle.encode_etc2_alpha(px, ORO), ck.encode_etc2_alpha(px, CKO),
           px)


def test_bc2_light(oracle):
    px = blockgen.alpha_blocks(64, seed=115)
    _check(oracle.encode_bc2(px, ORO), ck.encode_bc2(px, CKO), px)


def test_bc5_light(oracle):
    px = blockgen.mixed_blocks(64, seed=117)
    _check(oracle.encode_bc5u(px, ORO), ck.encode_bc5u(px, CKO), px)


def test_etc1_light(oracle):
    px = blockgen.gradient_blocks(32, seed=119)
    _check(oracle.encode_etc1(px, ORO), ck.encode_etc1(px, CKO), px)


def test_etc2_light(oracle):
    px = blockgen.gradient_blocks(32, seed=121)
    _check(oracle.encode_etc2(px, ORO), ck.encode_etc2(px, CKO), px)


def test_etc2_punchthrough_light(oracle):
    px = blockgen.alpha_blocks(32, seed=123)
    _check(oracle.encode_etc2_punchthrough(px, ORO),
           ck.encode_etc2_punchthrough(px, CKO), px)


def test_eac11_light(oracle):
    rng = np.random.default_rng(125)
    px = rng.integers(0, 2048, size=(32, 16)).astype(np.int16)
    _check(oracle.encode_eac11(px, ORO, signed=False),
           ck.encode_eac11(px, signed=False, options=CKO), px)
