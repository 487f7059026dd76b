"""Public encode API.

TPU-native equivalent of cvtt::Kernels (/root/reference/ConvectionKernels.h:236-277,
ConvectionKernels_API.cpp). Unlike the reference's fixed 8-blocks-per-call
contract, every entry point here takes an arbitrary batch of N blocks
([N, 16, 4] pixels) and encodes them all in one jit-compiled program; the
Options dataclass is a static jit argument so each distinct configuration
compiles once and is cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import s3tc
from .options import Flags, Options


def _as_block_array(pixels, dtype=jnp.uint8):
    arr = jnp.asarray(pixels, dtype=dtype)
    if arr.ndim != 3 or arr.shape[1] != 16:
        raise ValueError(f"expected [N, 16, C] pixel blocks, got {arr.shape}")
    return arr


# Per-codec block-chunk sizes: the search stages materialize per-block
# candidate tensors (e.g. ETC's [N, 81, 81] differential pair grids,
# BC7's [N, shapes, tweaks, parities] axes) whose peak HBM scales with N.
# Processing the batch in fixed-size chunks bounds peak memory while
# keeping each chunk wide enough to saturate the VPU.
_CHUNK_LIGHT = 32768
_CHUNK_HEAVY = 4096

# Program-cache contract: every `_*_fn` below is memoized per distinct
# (Options, ...) configuration, and each cached entry owns one jax.jit
# program per batch bucket it has seen. This mirrors the reference's
# caller-owned scratch (ConvectionKernels.h:224-234) with the ownership
# inverted: the library holds the "scratch" (compiled programs) so
# repeat encodes are free. A long-lived process sweeping many distinct
# Options values (e.g. a threshold sweep) therefore grows compiled
# programs without bound unless it calls release_programs() between
# sweeps; steady-state production use (a handful of configurations)
# needs nothing. _PROGRAM_CACHE_SIZE bounds each per-configuration
# cache; least-recently-used configurations are evicted, dropping the
# last reference to their jitted executables so they can be collected.
_PROGRAM_CACHE_SIZE = 64


def _program_cache(fn):
    """functools.lru_cache with the documented bound + release registry."""
    cached = functools.lru_cache(maxsize=_PROGRAM_CACHE_SIZE)(fn)
    _ALL_PROGRAM_CACHES.append(cached)
    return cached


_ALL_PROGRAM_CACHES: list = []


def release_programs() -> None:
    """Drop every cached encoder program (the analogue of the reference's
    ReleaseETC*Data): subsequent encodes recompile (or re-hit the
    persistent XLA compile cache) from a clean slate."""
    for cached in _ALL_PROGRAM_CACHES:
        cached.cache_clear()


# Batches smaller than the chunk size are padded up to a power-of-two
# bucket (>= _BUCKET_MIN) before the jitted call, so arbitrary image
# sizes reuse a small fixed set of compiled programs per configuration:
# one per bucket plus the full-chunk body. Padding replicates block 0
# and is stripped from the output (blocks are independent, so padding
# cannot change any result; tests/test_chunking.py pins this).
_BUCKET_MIN = 256


def _bucket_size(n: int, chunk: int) -> int:
    """Padded batch size for n blocks: a multiple of `chunk` when n >= chunk,
    else the smallest power-of-two bucket in [_BUCKET_MIN, chunk] holding n."""
    if n >= chunk:
        return ((n + chunk - 1) // chunk) * chunk
    b = min(_BUCKET_MIN, chunk)
    while b < n:
        b *= 2
    return min(b, chunk)


def _chunked(body, chunk: int):
    """Map `body` over `chunk`-sized slices of the leading axis (traceable:
    used inside jit/shard_map, where the chunk count is shape-static)."""

    def run(pixels):
        n = pixels.shape[0]
        if n <= chunk:
            return body(pixels)
        pad = (-n) % chunk
        if pad:
            fill = jnp.broadcast_to(pixels[:1], (pad,) + pixels.shape[1:])
            pixels = jnp.concatenate([pixels, fill], axis=0)
        batches = pixels.reshape((-1, chunk) + pixels.shape[1:])
        out = jax.lax.map(body, batches)
        return out.reshape((-1,) + out.shape[2:])[:n]

    return run


def _wrap(body, chunk: int):
    """Host-level batcher around a jitted fixed-size `body`.

    Pads N up to a bucket size (see _bucket_size), runs the single
    compiled [chunk]-sized program over chunk slices (or one sub-chunk
    bucket program), and strips the pad. All N >= chunk share ONE
    compiled program per configuration; smaller batches share at most
    log2(chunk/_BUCKET_MIN)+1 bucket programs.

    The returned callable carries `.body` and `.chunk` so the sharded
    path (parallel.sharding.encode_sharded) can re-compose the chunking
    per device shard inside shard_map.
    """
    jitted = jax.jit(body)

    def run(pixels):
        n = pixels.shape[0]
        nb = _bucket_size(n, chunk)
        if nb != n:
            fill = jnp.broadcast_to(pixels[:1], (nb - n,) + pixels.shape[1:])
            pixels = jnp.concatenate([pixels, fill], axis=0)
        if nb <= chunk:
            out = jitted(pixels)
        else:
            outs = [jitted(jax.lax.slice_in_dim(pixels, i, i + chunk, axis=0))
                    for i in range(0, nb, chunk)]
            out = jnp.concatenate(outs, axis=0)
        return out[:n] if nb != n else out

    run.body = body
    run.chunk = chunk
    run.jitted_body = jitted
    return run


@_program_cache
def _bc1_fn(options: Options):
    cw = options.channel_weights()
    exhaustive = bool(options.flags & Flags.S3TC_EXHAUSTIVE)
    sc_tables = _single_color_tables() if exhaustive else None

    def fn(pixels):
        return s3tc.pack_rgb(
            pixels, options.flags, cw, True, options.threshold, exhaustive,
            options.seed_points, options.refine_rounds_s3tc, sc_tables)

    chunk = _CHUNK_HEAVY if exhaustive else _CHUNK_LIGHT
    return _wrap(fn, chunk)


@_program_cache
def _single_color_tables():
    from .tables import s3tc_single_color
    return s3tc_single_color.load_tables()


def encode_bc1(pixels, options: Options = Options()):
    """Kernels::EncodeBC1 (API.cpp:86-99): BC1 with alpha test. [N,16,4] -> [N,8]."""
    return _bc1_fn(options)(_as_block_array(pixels))


@_program_cache
def _rgb_noalpha_fn(options: Options):
    """Shared BC2/BC3 color half: PackRGB without alpha test (API.cpp:109,125)."""
    cw = options.channel_weights()
    exhaustive = bool(options.flags & Flags.S3TC_EXHAUSTIVE)
    sc_tables = _single_color_tables() if exhaustive else None

    def fn(pixels):
        return s3tc.pack_rgb(
            pixels, options.flags, cw, False, 1.0, exhaustive,
            options.seed_points, options.refine_rounds_s3tc, sc_tables)

    chunk = _CHUNK_HEAVY if exhaustive else _CHUNK_LIGHT
    return _wrap(fn, chunk)


@_program_cache
def _bc2_fn(options: Options):
    def fn(pixels):
        color = _rgb_noalpha_fn(options)(pixels)
        alpha = s3tc.pack_explicit_alpha(pixels, 3)
        return jnp.concatenate([alpha, color], axis=-1)

    return _wrap(fn, _CHUNK_LIGHT)


@_program_cache
def _bc3_fn(options: Options):
    def fn(pixels):
        color = _rgb_noalpha_fn(options)(pixels)
        alpha = s3tc.pack_interpolated_alpha(
            pixels, 3, False, options.seed_points, options.refine_rounds_iic)
        return jnp.concatenate([alpha, color], axis=-1)

    return _wrap(fn, _CHUNK_LIGHT)


@_program_cache
def _bc4_fn(options: Options, signed: bool):
    def fn(pixels):
        if signed:
            pixels = s3tc.bias_signed_input(pixels)
        return s3tc.pack_interpolated_alpha(
            pixels, 0, signed, options.seed_points, options.refine_rounds_iic)

    return _wrap(fn, _CHUNK_LIGHT)


@_program_cache
def _bc5_fn(options: Options, signed: bool):
    def fn(pixels):
        if signed:
            pixels = s3tc.bias_signed_input(pixels)
        r = s3tc.pack_interpolated_alpha(
            pixels, 0, signed, options.seed_points, options.refine_rounds_iic)
        g = s3tc.pack_interpolated_alpha(
            pixels, 1, signed, options.seed_points, options.refine_rounds_iic)
        return jnp.concatenate([r, g], axis=-1)

    return _wrap(fn, _CHUNK_LIGHT)


def encode_bc2(pixels, options: Options = Options()):
    """Kernels::EncodeBC2 (API.cpp:101-115): BC1 color + 4-bit alpha. -> [N,16]."""
    return _bc2_fn(options)(_as_block_array(pixels))


def encode_bc3(pixels, options: Options = Options()):
    """Kernels::EncodeBC3 (API.cpp:117-131): BC1 color + interp alpha. -> [N,16]."""
    return _bc3_fn(options)(_as_block_array(pixels))


def encode_bc4u(pixels, options: Options = Options()):
    """Kernels::EncodeBC4U (API.cpp:133-146). -> [N,8]."""
    return _bc4_fn(options, False)(_as_block_array(pixels))


def encode_bc4s(pixels, options: Options = Options()):
    """Kernels::EncodeBC4S (API.cpp:148-164): signed input. -> [N,8]."""
    return _bc4_fn(options, True)(_as_block_array(pixels, dtype=jnp.int8))


def encode_bc5u(pixels, options: Options = Options()):
    """Kernels::EncodeBC5U (API.cpp:166-180). -> [N,16]."""
    return _bc5_fn(options, False)(_as_block_array(pixels))


def encode_bc5s(pixels, options: Options = Options()):
    """Kernels::EncodeBC5S (API.cpp:182-199): signed input. -> [N,16]."""
    return _bc5_fn(options, True)(_as_block_array(pixels, dtype=jnp.int8))


@_program_cache
def _bc7_fn(options: Options, plan):
    from .models import bc7

    cw = options.channel_weights()

    def fn(pixels):
        return bc7.pack(pixels, options.flags, cw, plan,
                        options.refine_rounds_bc7)

    return _wrap(fn, _CHUNK_HEAVY)


@_program_cache
def _bc6h_fn(options: Options, signed: bool):
    from .models import bc6h

    cw = options.channel_weights()

    def fn(pixels):
        return bc6h.pack(pixels, options.flags, cw, signed,
                         options.seed_points, options.refine_rounds_bc6h)

    return _wrap(fn, _CHUNK_HEAVY)


def encode_bc6hu(pixels, options: Options = Options()):
    """Kernels::EncodeBC6HU (API.cpp:56-69): unsigned HDR. [N,16,4] f16-bits
    (int16) -> [N,16]."""
    return _bc6h_fn(options, False)(jnp.asarray(pixels, dtype=jnp.int16))


def encode_bc6hs(pixels, options: Options = Options()):
    """Kernels::EncodeBC6HS (API.cpp:71-84): signed HDR."""
    return _bc6h_fn(options, True)(jnp.asarray(pixels, dtype=jnp.int16))


def encode_bc7(pixels, options: Options = Options(), plan=None, quality=None):
    """Kernels::EncodeBC7 (API.cpp:41-54). -> [N,16].

    `plan` is a BC7EncodingPlan (default: max quality); `quality` (1-100)
    configures a plan via ConfigureBC7EncodingPlanFromQuality.
    """
    from . import bc7_plan
    if plan is None:
        plan = (bc7_plan.plan_from_quality(quality) if quality is not None
                else bc7_plan.BC7EncodingPlan())
    return _bc7_fn(options, plan)(_as_block_array(pixels))


@_program_cache
def _etc_fn(options: Options, kind: str):
    from .models import etc

    if kind == "etc2_pt":
        return _etc2_pt_dispatch(options)

    def fn(pixels):
        if kind == "etc1":
            return etc.compress_etc1(pixels, options)
        if kind == "etc2":
            return etc.compress_etc2(pixels, options, False)
        if kind == "etc2_alpha":
            return etc.compress_etc2_alpha(pixels, options)
        if kind == "etc2_rgba":
            color = etc.compress_etc2(pixels, options, False)
            alpha = etc.compress_etc2_alpha(pixels, options)
            return jnp.concatenate([alpha, color], axis=-1)
        raise ValueError(kind)

    return _wrap(fn, _CHUNK_HEAVY)


@_program_cache
def _etc2_pt_only_fn(options: Options):
    from .models import etc

    def fn(pixels):
        return etc.compress_etc2_punchthrough_only(pixels, options)

    return _wrap(fn, _CHUNK_HEAVY)


@_program_cache
def _etc2_pt_dispatch(options: Options):
    """ETC2 punchthrough: host dispatch over the transparency split.

    Per-lane, CompressETC2Block's result is EITHER the opaque stages
    (no transparent pixel — identical math to the plain ETC2 program,
    since the zeroing wheres and num_opaque==16 scale factors are
    identities) OR the punchthrough stages (any transparent pixel — the
    opaque results are discarded by the FLT_MAX reset, ETC.cpp:1874).
    Routing each block to the program it actually needs is the TPU-native
    form of the reference's AnySet/AllSet group skips and avoids running
    the large opaque candidate scan on transparent blocks (and vice
    versa). Bit-exactness vs the monolithic program is pinned by the
    oracle golden tests on mixed-alpha inputs (tests/test_etc.py).

    `.body` stays the monolithic single-program form (used only as a
    fallback); `.jitted_body`/`.chunk` expose the punchthrough-only
    program (the hot path for transparency-bearing workloads) for
    bench/profiling; `.split` carries (classify, opaque_fn, pt_fn) so
    the sharded path (parallel.sharding.encode_sharded) can route the
    transparency split across device shards too instead of regressing
    every shard to the monolithic program.
    """
    from .models import etc

    opaque_fn = _etc_fn(options, "etc2")
    pt_fn = _etc2_pt_only_fn(options)

    f_thr = max(min(1.0, options.threshold), 0.0) * 255.0
    thr = int(np.floor(np.float32(f_thr) + 1.0))

    def classify(px: np.ndarray) -> np.ndarray:
        """[N] bool: True = any transparent pixel = punchthrough program."""
        return (np.asarray(px)[:, :, 3] < thr).any(axis=1)

    def run(pixels):
        px = np.asarray(pixels)
        any_t = classify(px)
        if not any_t.any():
            return opaque_fn(px)
        if any_t.all():
            return pt_fn(px)
        out = np.empty((px.shape[0], 8), dtype=np.uint8)
        out[~any_t] = np.asarray(opaque_fn(px[~any_t]))
        out[any_t] = np.asarray(pt_fn(px[any_t]))
        return jnp.asarray(out)

    def body(pixels):
        return etc.compress_etc2(pixels, options, True)

    run.body = body
    run.chunk = pt_fn.chunk
    run.jitted_body = pt_fn.jitted_body
    run.split = (classify, opaque_fn, pt_fn)
    return run


@_program_cache
def _eac_fn(options: Options, signed: bool):
    from .models import etc

    def fn(pixels):
        return etc.compress_eac11(pixels, signed, options)

    return _wrap(fn, _CHUNK_HEAVY)


def encode_etc1(pixels, options: Options = Options()):
    """Kernels::EncodeETC1 (API.cpp:201-214). -> [N,8]."""
    return _etc_fn(options, "etc1")(_as_block_array(pixels))


def encode_etc2(pixels, options: Options = Options()):
    """Kernels::EncodeETC2 (API.cpp:216-229). -> [N,8]."""
    return _etc_fn(options, "etc2")(_as_block_array(pixels))


def encode_etc2_rgba(pixels, options: Options = Options()):
    """Kernels::EncodeETC2RGBA (API.cpp:270-286). -> [N,16]."""
    return _etc_fn(options, "etc2_rgba")(_as_block_array(pixels))


def encode_etc2_punchthrough(pixels, options: Options = Options()):
    """Kernels::EncodeETC2PunchthroughAlpha (API.cpp:231-244). -> [N,8]."""
    return _etc_fn(options, "etc2_pt")(_as_block_array(pixels))


def encode_etc2_alpha(pixels, options: Options = Options()):
    """Kernels::EncodeETC2Alpha (API.cpp:246-257). -> [N,8]."""
    return _etc_fn(options, "etc2_alpha")(_as_block_array(pixels))


def encode_eac11(pixels, signed: bool = False,
                 options: Options = Options()):
    """Kernels::EncodeETC2Alpha11 (API.cpp:259-268): [N,16] i16 -> [N,8]."""
    return _eac_fn(options, signed)(jnp.asarray(pixels, dtype=jnp.int16))


def decode_bc7(blocks):
    """Kernels::DecodeBC7 (API.cpp:288-298): [N,16] -> [N,16,4] u8."""
    from .models import decode
    return decode.decode_bc7(np.asarray(blocks))


def decode_bc6hu(blocks):
    """Kernels::DecodeBC6HU (API.cpp:300-310): [N,16] -> [N,16,4] f16 bits."""
    from .models import decode
    return decode.decode_bc6h(np.asarray(blocks), signed=False)


def decode_bc6hs(blocks):
    """Kernels::DecodeBC6HS (API.cpp:312-322)."""
    from .models import decode
    return decode.decode_bc6h(np.asarray(blocks), signed=True)
