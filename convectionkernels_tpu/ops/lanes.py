"""Lane math: exact float/int semantics shared by every codec.

This is the TPU generalization of the reference's ParallelMath layer
(/root/reference/ConvectionKernels_ParallelMath.h). Where the reference runs
8 blocks in SSE2 lanes, here every value is a jnp array whose leading axis is
the block axis (thousands of blocks per call); all per-lane predication
(`Select`/`ConditionalSet`) becomes `jnp.where`.

Bit-exactness contract: semantics follow the reference's *scalar* build
(ParallelMath.h:1281-1812), which is the portably-defined configuration:
  - round-to-nearest == floor(x + 0.5f)              (ParallelMath.h:1677)
  - Reciprocal == exact IEEE 1/x                     (ParallelMath.h:1456)
  - integer lane types are int32                     (ParallelMath.h:1311-1318)
(The SSE2 build's _mm_rcp_ps is CPU-model-dependent, so it cannot be a
portable golden target.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32

FLT_MAX = np.float32(3.4028234663852886e38)


def f32(v) -> np.float32:
    """Host-side float32 constant (mirrors a C++ float literal/expression)."""
    return np.float32(v)


def make_float(shape, v):
    return jnp.full(shape, v, dtype=F32)


def to_float(v):
    """ParallelMath::ToFloat — int32 lane -> float32."""
    return v.astype(F32)


def round_nearest(v):
    """Scalar RoundTowardNearestForScope: floor(v + 0.5f) (ParallelMath.h:1677)."""
    return jnp.floor(v + np.float32(0.5))


def round_and_convert_to_int_nearest(v):
    """RoundAndConvertToU15/U16/S16 under round-to-nearest, as int32."""
    return jnp.floor(v + np.float32(0.5)).astype(I32)


def round_up_to_int(v):
    """RoundAndConvertTo* under RoundUpForScope: ceil (ParallelMath.h:1668)."""
    return jnp.ceil(v).astype(I32)


def round_down_to_int(v):
    """RoundDownForScope: floor (ParallelMath.h:1674)."""
    return jnp.floor(v).astype(I32)


def trunc_to_int(v):
    """RoundTowardZeroForScope: C truncation (ParallelMath.h:1662)."""
    return jnp.trunc(v).astype(I32)


def clamp(v, lo, hi):
    """ParallelMath::Clamp: min then max order preserved (scalar :1447-1454)."""
    return jnp.maximum(jnp.minimum(v, np.float32(hi)), np.float32(lo))


def make_safe_denominator(v):
    """MakeSafeDenominator: 0 -> 1 (ParallelMath.h:1398-1402)."""
    return jnp.where(v == np.float32(0.0), np.float32(1.0), v)


def select(flag, a, b):
    """ParallelMath::Select: flag ? a : b."""
    return jnp.where(flag, a, b)


def cond_set(dest, flag, src):
    """ParallelMath::ConditionalSet: if flag: dest = src."""
    return jnp.where(flag, src, dest)


def sq_diff_int(a, b):
    """SqDiffUInt8/SqDiffSInt16 scalar: (a-b)^2 in int32 (ParallelMath.h:1705-1723)."""
    d = a - b
    return d * d


def right_shift(v, bits: int):
    """Arithmetic right shift (scalar SignedRightShift)."""
    return v >> bits


def abs_f(v):
    return jnp.abs(v)


def twoscl_half_to_float(v):
    """TwosCLHalfToFloat (scalar build, ParallelMath.h:1727-1750).

    Converts the internal two's-complement-sign half-float representation to
    float32 using pure integer ops, including the denormal correction.
    `v` is int32 holding a 16-bit 2CL half value.

    NOTE: mirrors the scalar build exactly, in which signBits is derived from
    absV (so it is zero except for v == -32768) — the scalar build returns the
    magnitude, unlike the SSE2 build which keeps v's sign. We match the scalar
    oracle bit-for-bit, quirks included.
    """
    abs_v = jnp.abs(v)
    sign_bits = abs_v & (-32768)
    mantissa = abs_v & 0x03FF
    exponent = abs_v & 0x7C00
    is_denormal = exponent == 0
    exponent = (exponent >> 3) + 14336
    denorm_corr_bits = jnp.where(is_denormal, (sign_bits | 14336), 0) << 16
    f_bits = ((exponent | sign_bits) << 16) | (mantissa << 13)
    f = jnp.asarray(f_bits, dtype=I32).view(F32)
    correction = jnp.asarray(denorm_corr_bits, dtype=I32).view(F32)
    return f - correction


def first_argmin(x, axis: int):
    """First-occurrence argmin with GUARANTEED tie semantics.

    jnp.argmin documents first-occurrence ties, but the XLA:TPU lowering
    of the fused variadic reduce does not honor it on every axis/layout
    combination (observed: rare tie-dependent winner flips vs the scalar
    reference on smooth-gradient inputs). Two plain min-reduces are
    unambiguous: the value min, then the min index among positions
    achieving it.
    """
    import jax

    if axis < 0:
        axis += x.ndim
    m = jnp.min(x, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.min(jnp.where(x == m, iota, x.shape[axis]), axis=axis)


def lex_min_with_index(x, axes):
    """(min value, first-occurrence flat index) over `axes` in ONE pass.

    A variadic lax.reduce with an EXPLICIT lexicographic comparator:
    (value, index) pairs reduce by strict-less on value, then strict-less
    on index. Unlike jnp.argmin's builtin lowering (whose tie behavior
    depends on reduction schedule — see first_argmin), this comparator is
    associative and commutative, so any association yields the
    first-occurrence winner. One pass means XLA fuses the producer chain
    once instead of recomputing it for the value min and the index min
    separately (the dominant cost in the op-level ETC profiles).

    `axes` may be an int or a tuple; the flat index is row-major over the
    given axes in order (matching reshape(...).argmin() visitation).
    """
    import jax

    if isinstance(axes, int):
        axes = (axes,)
    axes = tuple(a + x.ndim if a < 0 else a for a in axes)
    sizes = [x.shape[a] for a in axes]
    iota = None
    stride = 1
    for a, s in zip(reversed(axes), reversed(sizes)):
        term = jax.lax.broadcasted_iota(I32, x.shape, a)
        term = term * stride if stride > 1 else term
        iota = term if iota is None else iota + term
        stride *= s
    big = jnp.int32(stride)

    def reducer(a, b):
        av, ai = a
        bv, bi = b
        better = (bv < av) | ((bv == av) & (bi < ai))
        return (jnp.where(better, bv, av), jnp.where(better, bi, ai))

    init = (jnp.asarray(jnp.inf, dtype=x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.asarray(jnp.iinfo(x.dtype).max, dtype=x.dtype))
    return jax.lax.reduce((x, iota), (init, big), reducer, axes)


def lex_min_with_payload(x, payloads, axes):
    """lex_min_with_index that additionally carries `payloads` (a list of
    arrays shaped like x) from the winning position through the same
    one-pass reduce: (min value, first index, *payloads at the winner).

    Replaces the select-argmin-then-gather pattern (two passes plus an
    R-step where-chain) with a single fused pass; payload values are the
    exact elements at the winner, so results are bit-identical to the
    gather they replace.
    """
    import jax

    if isinstance(axes, int):
        axes = (axes,)
    axes = tuple(a + x.ndim if a < 0 else a for a in axes)
    sizes = [x.shape[a] for a in axes]
    iota = None
    stride = 1
    for a, s in zip(reversed(axes), reversed(sizes)):
        term = jax.lax.broadcasted_iota(I32, x.shape, a)
        term = term * stride if stride > 1 else term
        iota = term if iota is None else iota + term
        stride *= s
    big = jnp.int32(stride)

    def reducer(a, b):
        av, ai = a[0], a[1]
        bv, bi = b[0], b[1]
        better = (bv < av) | ((bv == av) & (bi < ai))
        return tuple(jnp.where(better, bx, ax) for ax, bx in zip(a, b))

    init = (jnp.asarray(jnp.inf, dtype=x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.asarray(jnp.iinfo(x.dtype).max, dtype=x.dtype))
    inits = (init, big) + tuple(
        jnp.zeros((), dtype=p.dtype) for p in payloads)
    payloads = [jnp.broadcast_to(p, x.shape) for p in payloads]
    return jax.lax.reduce((x, iota) + tuple(payloads), inits, reducer, axes)


def take_winner(x, win):
    """x[i, win[i]] for x [N, K], win [N] — as a one-hot masked reduce.

    take_along_axis / jnp.take lower to serial per-lane gathers on TPU
    (~40us each); the one-hot select + reduce is a single wide fused op
    and XLA shares the iota/compare across consecutive calls with the
    same `win`. Exact for the values stored here: non-negative floats
    (x + 0.0 == x), ints, bools.
    """
    import jax

    onehot = jax.lax.broadcasted_iota(I32, x.shape, 1) == win[:, None]
    if x.dtype == jnp.bool_:
        return jnp.any(onehot & x, axis=1)
    return jnp.sum(jnp.where(onehot, x, 0), axis=1, dtype=x.dtype)


def take_winner_t(x, win):
    """x[win[j], j] for x [K, N] (block-minor layout), win [N]: the
    transposed take_winner — one-hot masked reduce over the leading axis."""
    import jax

    onehot = jax.lax.broadcasted_iota(I32, x.shape, 0) == win[None, :]
    if x.dtype == jnp.bool_:
        return jnp.any(onehot & x, axis=0)
    return jnp.sum(jnp.where(onehot, x, 0), axis=0, dtype=x.dtype)


def compute_tweak_factors(tweak: int, range_: int) -> tuple[np.float32, np.float32]:
    """Util::ComputeTweakFactors (ConvectionKernels_Util.cpp:75-84).

    Host-side: tweak/range are static. Returns float32 factors with the exact
    C float arithmetic (including -0.0 for factor0 when minOutsideUnits==0).
    """
    total_units = range_ - 1
    min_outside = (tweak >> 1) & 1
    max_outside = tweak & 1
    inside = total_units - min_outside - max_outside
    f0 = -(np.float32(min_outside)) / np.float32(inside)
    f1 = np.float32(max_outside) / np.float32(inside) + np.float32(1.0)
    return f0, f1


def tweak_rounds_for_range(range_: int) -> int:
    """BCCommon::TweakRoundsForRange (ConvectionKernels_BCCommon.cpp:39-44)."""
    return 3 if range_ == 3 else 4
