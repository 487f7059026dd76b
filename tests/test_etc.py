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


def test_etc1_run_bounds():
    """ETC1_RUN_BOUNDS (models/etc.py) must upper-bound the number of
    distinct quantized-color runs along each table's offset list for ANY
    half-block, or the run-slot compaction would silently drop attempts.

    The committed bounds are the exact maxima of the 3-channel
    boundary-set union over all cum values in [0, 2040] (full 3-cover
    enumeration, run offline; ETC_RUN_BOUNDS_EXHAUSTIVE=1 re-runs it
    here). The default tier checks the cheap per-channel exact bound
    K <= min(3*max_changes + 1, n_offs) plus an adversarial battery:
    all triples of the 12 boundary-densest cum values per channel, and
    4096 random triples."""
    import itertools
    import os

    from convectionkernels_tpu.models.etc import ETC1_RUN_BOUNDS
    from convectionkernels_tpu.tables import etc_tables

    def quant(cu, differential):
        cu = np.clip(cu, 0, 2040)
        if differential:
            return ((cu << 5) - cu + (cu >> 3) + 1024) >> 11
        return ((cu << 5) - (cu << 1) + (cu >> 3) + 2048) >> 12

    rng = np.random.default_rng(73)
    for differential in (True, False):
        bounds = ETC1_RUN_BOUNDS[differential]
        for t in range(8):
            offs = np.array(etc_tables.potential_offsets(t))
            k_t = bounds[t]
            cums = np.arange(0, 2041)
            q = quant(cums[:, None] + offs[None, :], differential)
            b = q[:, 1:] != q[:, :-1]       # [2041, len-1] boundary sets
            per_ch_worst = int(b.sum(axis=1).max())
            assert k_t <= min(3 * per_ch_worst + 1, len(offs))

            dense = np.argsort(-b.sum(axis=1))[:12]
            cand = [np.array(tri) for tri in
                    itertools.product(dense, repeat=3)]
            cand += list(rng.integers(0, 2041, size=(4096, 3)))
            tri = np.stack(cand)             # [M, 3]
            runs = 1 + (b[tri[:, 0]] | b[tri[:, 1]]
                        | b[tri[:, 2]]).sum(axis=1)
            worst = int(runs.max())
            assert worst <= k_t, (
                f"d={differential} t{t}: observed {worst} runs > bound "
                f"{k_t}")

            if os.environ.get("ETC_RUN_BOUNDS_EXHAUSTIVE"):
                uniq = np.unique(b, axis=0)
                best = 0
                for i in range(len(uniq)):
                    u2 = uniq[i][None, :] | uniq
                    for j in range(len(uniq)):
                        best = max(best, int(
                            (u2[j][None, :] | uniq).sum(axis=1).max()))
                assert min(best + 1, len(offs)) == k_t


def test_etc2_punchthrough(oracle):
    pixels = blockgen.alpha_blocks(16, seed=71)
    _check(oracle.encode_etc2_punchthrough(pixels),
           api.encode_etc2_punchthrough(pixels), pixels)
