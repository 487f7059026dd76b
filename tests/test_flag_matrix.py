"""Default-strength flag/format test matrix (VERDICT round-1 item 4).

The earlier flag-variant tests pinned the expensive paths only in
weakened configs (seed_points=1, refine_rounds=1). These run the SHIPPED
strength — the default Options (seeds=4, refine 2/3/8/2) — so bugs that
only manifest with multiple seeds or refine-round interleaving are
caught. Covers every Flags bit and every API entry point that had no
default-strength test:

  S3TC_Exhaustive(+Paranoid)         S3TC.cpp:798-935
  BC7 slow indexing (no FastIndexing) BC67.cpp:1362-1386
  BC7_TrySingleColor                  BC67.cpp:940-1040
  BC7_RespectPunchThrough             BC67.cpp:1281-1303
  ETC_UseFakeBT709 (+Accurate)        ETC.cpp:2157-2327
  BC6H_FastIndexing                   IndexSelectorHDR.h:141-144
  Uniform                             ConvectionKernels.h:49
  encode_bc5s                         API.cpp:182-199
  encode_etc2_rgba 8+8 interleave     API.cpp:270-286

Plus random-fuzz goldens per format at block counts calibrated so each
scalar-oracle call stays under ~60 s (test_fuzz_goldens.py).
"""

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
        f"got={got[np.argmax(mismatched)]}")


def punchthrough_blocks(n, seed=0):
    """Blocks whose alpha is exactly 0 or 255 per pixel (the punchthrough
    classification, BC67.cpp:1064-1070), mixed with some opaque blocks."""
    rng = np.random.default_rng(seed)
    px = blockgen.gradient_blocks(n, seed)
    alpha = rng.integers(0, 2, size=(n, 16), dtype=np.uint8) * 255
    px[: n // 2, :, 3] = alpha[: n // 2]
    px[n // 2:, :, 3] = 255
    return px


@pytest.mark.slow
def test_bc1_exhaustive_default_strength(oracle):
    flags = ck.Flags.S3TC_PARANOID | ck.Flags.S3TC_EXHAUSTIVE
    px = blockgen.mixed_blocks(64, seed=221)
    _check(oracle.encode_bc1(px, OracleOptions(flags=flags)),
           ck.encode_bc1(px, ck.Options(flags=flags)), px)


@pytest.mark.slow
def test_bc3_exhaustive_default_strength(oracle):
    # exhaustive cluster fit + interpolated alpha, both at full strength
    flags = ck.Flags.S3TC_PARANOID | ck.Flags.S3TC_EXHAUSTIVE
    px = blockgen.mixed_blocks(64, seed=223)
    _check(oracle.encode_bc3(px, OracleOptions(flags=flags)),
           ck.encode_bc3(px, ck.Options(flags=flags)), px)


@pytest.mark.slow
def test_bc7_slow_indexing_default_strength(oracle):
    # default flags minus BC7_FastIndexing: +-1 index retest at seeds=4,
    # refine=2 (quality 20 bounds the XLA graph while exercising multiple
    # modes/shapes)
    flags = ck.Flags.S3TC_PARANOID
    px = blockgen.mixed_blocks(32, seed=225)
    _check(oracle.encode_bc7(px, OracleOptions(flags=flags), quality=20),
           ck.encode_bc7(px, ck.Options(flags=flags), quality=20), px)


@pytest.mark.slow
def test_bc7_try_single_color_default_strength(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.BC7_TRY_SINGLE_COLOR
    px = np.concatenate([blockgen.flat_blocks(16, seed=227),
                         blockgen.gradient_blocks(16, seed=228)])
    px[..., 3] = 255
    _check(oracle.encode_bc7(px, OracleOptions(flags=flags), quality=20),
           ck.encode_bc7(px, ck.Options(flags=flags), quality=20), px)


@pytest.mark.slow
def test_bc7_respect_punch_through(oracle):
    # BC7_RespectPunchThrough invalidates parity combos per alpha class
    # (BC67.cpp:1281-1303); needs punchthrough-alpha inputs to bite
    flags = ck.Flags.DEFAULT | ck.Flags.BC7_RESPECT_PUNCH_THROUGH
    px = punchthrough_blocks(32, seed=229)
    _check(oracle.encode_bc7(px, OracleOptions(flags=flags), quality=20),
           ck.encode_bc7(px, ck.Options(flags=flags), quality=20), px)


@pytest.mark.slow
def test_etc2_fakebt709_default_strength(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.ETC_USE_FAKE_BT709
    px = blockgen.mixed_blocks(24, seed=231)
    _check(oracle.encode_etc2(px, OracleOptions(flags=flags)),
           ck.encode_etc2(px, ck.Options(flags=flags)), px)


@pytest.mark.slow
def test_etc2_fakebt709_accurate(oracle):
    # ETC_FakeBT709Accurate switches the rounding resolve to the accurate
    # variant (ETC.cpp:2157-2285); previously untested in any config
    flags = (ck.Flags.DEFAULT | ck.Flags.ETC_USE_FAKE_BT709
             | ck.Flags.ETC_FAKE_BT709_ACCURATE)
    px = blockgen.mixed_blocks(24, seed=233)
    _check(oracle.encode_etc2(px, OracleOptions(flags=flags)),
           ck.encode_etc2(px, ck.Options(flags=flags)), px)


@pytest.mark.slow
def test_bc6h_fast_indexing_default_strength(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.BC6H_FAST_INDEXING
    rng = np.random.default_rng(235)
    px = rng.uniform(0, 8.0, size=(16, 16, 4)).astype(np.float16).view(np.int16)
    _check(oracle.encode_bc6h(px, OracleOptions(flags=flags), signed=False),
           ck.encode_bc6hu(px, ck.Options(flags=flags)), px)


def test_bc5s_bit_exact(oracle):
    # encode_bc5s (API.cpp:182-199): signed dual-channel; previously had
    # no test at all
    rng = np.random.default_rng(237)
    px = rng.integers(-128, 128, size=(32, 16, 4), dtype=np.int16) \
        .astype(np.int8)
    _check(oracle.encode_bc5s(px), ck.encode_bc5s(px), px)


def test_etc2_rgba_interleave(oracle):
    # EncodeETC2RGBA (API.cpp:270-286): 8 bytes EAC alpha then 8 bytes
    # ETC2 color per block
    px = blockgen.alpha_blocks(24, seed=239)
    _check(oracle.encode_etc2_rgba(px), ck.encode_etc2_rgba(px), px)


def test_uniform_weights_bc7(oracle):
    flags = ck.Flags.DEFAULT | ck.Flags.UNIFORM
    px = blockgen.mixed_blocks(16, seed=241)
    _check(oracle.encode_bc7(px, OracleOptions(flags=flags), quality=10),
           ck.encode_bc7(px, ck.Options(flags=flags), quality=10), px)
