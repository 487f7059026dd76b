"""Correctly-rounded float32 division, reciprocal, and sqrt.

XLA lowers f32 divide and sqrt to reciprocal/rsqrt Newton iterations on both
CPU and TPU; the results differ from IEEE round-to-nearest in ~35-43% of ulps
(measured). The reference encoder's decisions hinge on exact IEEE results
(its scalar build uses hardware divss/sqrtss), so this module rebuilds
correctly-rounded f32 divide/sqrt from operations XLA executes exactly:
int32 arithmetic (two's-complement wraparound) and f32 multiply/add
(measured exactly rounded, no FMA contraction).

Method: mantissa-domain integer long division / integer sqrt. The quotient
estimate comes from the fast native op, then is corrected with exact int32
arithmetic (products split into 12/13-bit limbs so partials stay below 2^26;
residuals are computed modulo 2^32, which is exact because the true residual
magnitude stays well below 2^31). Rounding uses the exact remainder, with
ties-to-even for division (sqrt cannot tie).

Handles all normal values plus zero/inf/NaN. Subnormal inputs and outputs
are not produced by the encoders' arithmetic (values stay within ~1e-30 of
magnitude); they fall back to native results.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
F32 = jnp.float32

_EXP_MASK = 0x7F800000
_MAN_MASK = 0x007FFFFF
_SIGN_MASK = np.int32(-2147483648)  # 0x80000000 as int32


def _bits(x):
    return jnp.asarray(x, F32).view(I32)


def _from_bits(b):
    return jnp.asarray(b, I32).view(F32)


def _mul_wrap(a, b):
    """Exact a*b modulo 2^32 for 0 <= a < 2^26, 0 <= b < 2^25 int32 inputs.

    Splits b into 13-bit limbs so partial products stay below 2^31 before the
    intentional wraparound shifts.
    """
    bh = b >> 13
    bl = b & 0x1FFF
    return ((a * bh) << 13) + a * bl  # int32 wraparound is exact mod 2^32


def _divide_normal(ma, ea, mb, eb):
    """Correctly-rounded mantissa quotient for normalized 24-bit mantissas.

    Returns (q23, e_out) with q23 in [2^23, 2^24) and the biased exponent.
    """
    lt = ma < mb
    s = jnp.where(lt, 24, 23)
    e_out = ea - eb + jnp.where(lt, 126, 127)

    # Estimate: native (approximate) division of exact float operands.
    # ma * 2^s is exact in f32 (24-bit mantissa, pure exponent scale).
    nf = ma.astype(F32) * jnp.where(lt, np.float32(16777216.0),
                                    np.float32(8388608.0))
    qe = jnp.trunc(nf / mb.astype(F32)).astype(I32)

    # Exact residual r = (ma << s) - qe*mb modulo 2^32 (true |r| << 2^31)
    n_mod = ma << s
    r = n_mod - _mul_wrap(mb, qe)

    # One multiplicative correction (residual may be several mb in size)
    d = jnp.trunc(r.astype(F32) / mb.astype(F32)).astype(I32)
    qe = qe + d
    r = r - _mul_wrap(mb, d)

    # Final conditional steps (estimate now within a couple of units)
    for _ in range(3):
        neg = r < 0
        qe = jnp.where(neg, qe - 1, qe)
        r = jnp.where(neg, r + mb, r)
    for _ in range(3):
        ge = r >= mb
        qe = jnp.where(ge, qe + 1, qe)
        r = jnp.where(ge, r - mb, r)

    # Round to nearest, ties to even
    two_r = r << 1
    round_up = (two_r > mb) | ((two_r == mb) & ((qe & 1) == 1))
    q = qe + round_up.astype(I32)

    # Mantissa overflow (q == 2^24) -> shift into next binade
    overflow = q == (1 << 24)
    q = jnp.where(overflow, 1 << 23, q)
    e_out = e_out + overflow.astype(I32)
    return q, e_out


def exact_divide(a, b):
    """Correctly-rounded (IEEE RN) float32 a / b."""
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    ab = _bits(a)
    bb = _bits(b)
    sign = (ab ^ bb) & _SIGN_MASK

    ea = (ab >> 23) & 0xFF
    eb = (bb >> 23) & 0xFF
    ma = (ab & _MAN_MASK) | 0x800000
    mb = (bb & _MAN_MASK) | 0x800000

    q, e_out = _divide_normal(ma, ea, mb, eb)

    normal_result = sign | (e_out << 23) | (q & _MAN_MASK)

    # Subnormal operands are flushed to zero (the encoders' arithmetic never
    # produces them; this is also TPU hardware convention).
    a_zero = ea == 0
    b_zero = eb == 0
    a_inf = (ab & ~_SIGN_MASK) == _EXP_MASK
    b_inf = (bb & ~_SIGN_MASK) == _EXP_MASK
    a_nan = (ab & ~_SIGN_MASK) > _EXP_MASK
    b_nan = (bb & ~_SIGN_MASK) > _EXP_MASK

    nan_bits = jnp.full_like(ab, 0x7FC00000)
    inf_bits = sign | _EXP_MASK
    zero_bits = sign

    out = normal_result
    out = jnp.where(e_out >= 255, inf_bits, out)
    out = jnp.where(e_out <= 0, zero_bits, out)  # flush-to-zero underflow
    out = jnp.where(b_zero, inf_bits, out)
    out = jnp.where(a_zero, zero_bits, out)
    out = jnp.where(b_inf, zero_bits, out)
    out = jnp.where(a_inf, inf_bits, out)
    out = jnp.where((a_zero & b_zero) | (a_inf & b_inf), nan_bits, out)
    out = jnp.where(a_nan | b_nan, nan_bits, out)
    return _from_bits(out)


def exact_reciprocal(v):
    """Correctly-rounded 1.0f / v (the reference scalar Reciprocal)."""
    return exact_divide(jnp.ones_like(jnp.asarray(v, F32)), v)


def exact_sqrt(x):
    """Correctly-rounded (IEEE RN) float32 sqrt."""
    x = jnp.asarray(x, F32)
    xb = _bits(x)
    ea = (xb >> 23) & 0xFF
    ma = (xb & _MAN_MASK) | 0x800000

    # Unbiased exponent; make it even by shifting the mantissa
    e_unb = ea - 127
    odd = (e_unb & 1) != 0  # works for negatives: -3 & 1 == 1
    m2 = jnp.where(odd, ma << 1, ma)          # in [2^23, 2^26)
    e_half = (e_unb - odd.astype(I32)) >> 1   # floor division by 2

    # value = (m2 / 2^23) * 2^(2*e_half); we want the 24-bit mantissa
    # S = RN(sqrt(m2 / 2^23) * 2^23) = RN(sqrt(m2 << 23)).
    # N = m2 << 23 is in [2^46, 2^48) so S is in [2^23, 2^24).
    # float(m2) is exact: m2 < 2^25 and the odd case is even.
    nf = m2.astype(F32) * np.float32(8388608.0)
    se = jnp.trunc(jnp.sqrt(nf)).astype(I32)  # approximate integer sqrt

    # Exact residual r = N - se^2 mod 2^32 (true |r| <= ~2^29)
    n_mod = m2 << 23
    r = n_mod - _mul_wrap(se, se)

    # Correction: delta ~ r / (2*se)
    d = jnp.trunc(r.astype(F32) / (np.float32(2.0) * se.astype(F32))
                  ).astype(I32)
    se = se + d
    r = r - (_mul_wrap(se - d, d << 1) + _mul_wrap(d, d))  # (se+d)^2 expand

    for _ in range(3):
        neg = r < 0
        se = jnp.where(neg, se - 1, se)
        r = jnp.where(neg, r + (se << 1) + 1, r)
    for _ in range(3):
        big = r > (se << 1)  # r >= 2*se+1 means (se+1)^2 <= N
        se = jnp.where(big, se + 1, se)
        r = jnp.where(big, r - (se << 1) + 1, r)

    # Round: up iff N > se^2 + se  <=>  r > se  (no ties possible)
    se = se + (r > se).astype(I32)
    overflow = se == (1 << 24)
    se = jnp.where(overflow, 1 << 23, se)

    # value mantissa = se/2^23 in [1,2), exponent = e_half
    e_out = e_half + 127 + overflow.astype(I32)
    result = (e_out << 23) | (se & _MAN_MASK)

    x_zero = ea == 0  # subnormals flushed to zero
    x_neg = x < 0
    x_nan = (xb & ~_SIGN_MASK) > _EXP_MASK
    x_inf = xb == _EXP_MASK

    out = result
    out = jnp.where(x_inf, _EXP_MASK, out)
    out = jnp.where(x_zero, xb & _SIGN_MASK, out)  # sqrt(+-0) = +-0
    out = jnp.where(x_neg & ~x_zero, 0x7FC00000, out)
    out = jnp.where(x_nan, 0x7FC00000, out)
    return _from_bits(out)
