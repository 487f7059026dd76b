"""exact_math: correctly-rounded f32 divide/sqrt vs numpy (IEEE hardware)."""

import jax
import numpy as np
import pytest

from convectionkernels_tpu.ops.exact_math import (exact_divide,
                                                  exact_reciprocal,
                                                  exact_sqrt)


def _operands(n=200000, seed=1):
    rng = np.random.default_rng(seed)
    xs = np.concatenate([
        rng.uniform(1e-6, 1e6, n).astype(np.float32),
        rng.integers(1, 100000, n).astype(np.float32),
        (rng.integers(1, 256, n) * rng.integers(1, 256, n)).astype(np.float32),
    ])
    ys = np.concatenate([
        rng.uniform(1e-6, 1e6, n).astype(np.float32),
        rng.integers(1, 100000, n).astype(np.float32),
        rng.integers(1, 65536, n).astype(np.float32),
    ])
    return xs, ys


def test_exact_divide():
    xs, ys = _operands()
    ref = (xs / ys).astype(np.float32)
    got = np.asarray(jax.jit(exact_divide)(xs, ys))
    assert (ref.view(np.int32) == got.view(np.int32)).all()


def test_exact_divide_signs():
    xs, ys = _operands(seed=2)
    for sa, sb in [(-1, 1), (1, -1), (-1, -1)]:
        ref = ((sa * xs) / (sb * ys)).astype(np.float32)
        got = np.asarray(jax.jit(exact_divide)(sa * xs, sb * ys))
        assert (ref.view(np.int32) == got.view(np.int32)).all()


def test_exact_sqrt():
    xs, _ = _operands(seed=3)
    ref = np.sqrt(xs).astype(np.float32)
    got = np.asarray(jax.jit(exact_sqrt)(xs))
    assert (ref.view(np.int32) == got.view(np.int32)).all()


def test_exact_reciprocal():
    _, ys = _operands(seed=4)
    ref = (np.float32(1.0) / ys).astype(np.float32)
    got = np.asarray(jax.jit(exact_reciprocal)(ys))
    assert (ref.view(np.int32) == got.view(np.int32)).all()


def test_specials():
    # subnormals excluded: exact_math flushes them to zero by contract
    sp = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1.0, -1.0, 3.4e38,
                   ], dtype=np.float32)
    a = np.repeat(sp, len(sp))
    b = np.tile(sp, len(sp))
    with np.errstate(all="ignore"):
        ref = (a / b).astype(np.float32)
    got = np.asarray(exact_divide(a, b))
    both_nan = np.isnan(ref) & np.isnan(got)
    # subnormal reference results are flushed to (signed) zero by contract
    ref_sub = (np.abs(ref) < np.finfo(np.float32).tiny) & (ref != 0)
    flushed = ref_sub & ((got.view(np.int32) & 0x7FFFFFFF) == 0) \
        & (np.signbit(ref) == np.signbit(got))
    ok = both_nan | flushed | (ref.view(np.int32) == got.view(np.int32))
    assert ok.all(), list(zip(a[~ok], b[~ok], ref[~ok], got[~ok]))

    with np.errstate(all="ignore"):
        sref = np.sqrt(sp).astype(np.float32)
    sgot = np.asarray(exact_sqrt(sp))
    both_nan = np.isnan(sref) & np.isnan(sgot)
    assert (both_nan | (sref.view(np.int32) == sgot.view(np.int32))).all()
