"""ctypes wrapper for the reference CVTT oracle (see build_oracle.py).

The scalar build is the bit-exactness oracle; the SSE2 build is the CPU
performance baseline. All functions take blocks in the reference's
PixelBlock layout: u8[N, 16, 4] (RGBA), s8[N, 16, 4], f16-bits i16[N, 16, 4],
or scalar i16[N, 16], with N a multiple of 8 (cvtt::NumParallelBlocks).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from . import build_oracle


@dataclass(frozen=True)
class OracleOptions:
    """Mirror of cvtt::Options (ConvectionKernels.h:73-103)."""

    flags: int = 0x108  # Flags::Default = BC7_FastIndexing | S3TC_Paranoid
    threshold: float = 0.5
    # The reference defaults are float32 divisions (0.2125f / 0.7154f,
    # ConvectionKernels.h:92-95); Python double division differs by 1 ulp
    # for red, which shifts index-projection near-ties.
    red_weight: float = float(np.float32(0.2125) / np.float32(0.7154))
    green_weight: float = 1.0
    blue_weight: float = float(np.float32(0.0721) / np.float32(0.7154))
    alpha_weight: float = 1.0
    refine_rounds_bc7: int = 2
    refine_rounds_bc6h: int = 3
    refine_rounds_iic: int = 8
    refine_rounds_s3tc: int = 2
    seed_points: int = 4


class CvttOracle:
    def __init__(self, variant: str = "scalar"):
        scalar, sse2 = build_oracle.ensure_built()
        path = scalar if variant == "scalar" else sse2
        self.lib = ctypes.CDLL(str(path))

    def _opts_args(self, o: OracleOptions):
        weights = (ctypes.c_float * 4)(
            o.red_weight, o.green_weight, o.blue_weight, o.alpha_weight
        )
        return (
            ctypes.c_uint32(o.flags),
            ctypes.c_float(o.threshold),
            weights,
            ctypes.c_int(o.refine_rounds_bc7),
            ctypes.c_int(o.refine_rounds_bc6h),
            ctypes.c_int(o.refine_rounds_iic),
            ctypes.c_int(o.refine_rounds_s3tc),
            ctypes.c_int(o.seed_points),
        )

    def _encode_u8(self, fn_name: str, pixels: np.ndarray, block_size: int,
                   opts: OracleOptions, *extra_ints) -> np.ndarray:
        pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
        n = pixels.shape[0]
        assert n % 8 == 0, "block count must be a multiple of 8"
        assert pixels.shape[1:] == (16, 4)
        out = np.zeros(n * block_size, dtype=np.uint8)
        fn = getattr(self.lib, fn_name)
        fn(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n),
            *[ctypes.c_int(x) for x in extra_ints],
            *self._opts_args(opts),
        )
        return out.reshape(n, block_size)

    # --- LDR formats -------------------------------------------------------
    def encode_bc1(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_bc1", pixels, 8, opts)

    def encode_bc2(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_bc2", pixels, 16, opts)

    def encode_bc3(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_bc3", pixels, 16, opts)

    def encode_bc4u(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_bc4u", pixels, 8, opts)

    def encode_bc5u(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_bc5u", pixels, 16, opts)

    def encode_bc4s(self, pixels, opts=OracleOptions()):
        pixels = np.ascontiguousarray(pixels, dtype=np.int8)
        n = pixels.shape[0]
        out = np.zeros(n * 8, dtype=np.uint8)
        self.lib.cvtt_encode_bc4s(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ctypes.c_int64(n), *self._opts_args(opts))
        return out.reshape(n, 8)

    def encode_bc5s(self, pixels, opts=OracleOptions()):
        pixels = np.ascontiguousarray(pixels, dtype=np.int8)
        n = pixels.shape[0]
        out = np.zeros(n * 16, dtype=np.uint8)
        self.lib.cvtt_encode_bc5s(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ctypes.c_int64(n), *self._opts_args(opts))
        return out.reshape(n, 16)

    def encode_bc7(self, pixels, opts=OracleOptions(), quality=0):
        """quality=0 uses the default (max-quality) BC7EncodingPlan."""
        return self._encode_u8("cvtt_encode_bc7", pixels, 16, opts, quality)

    # --- HDR ---------------------------------------------------------------
    def encode_bc6h(self, pixels_f16bits, opts=OracleOptions(), signed=False):
        pixels = np.ascontiguousarray(pixels_f16bits, dtype=np.int16)
        n = pixels.shape[0]
        assert n % 8 == 0 and pixels.shape[1:] == (16, 4)
        out = np.zeros(n * 16, dtype=np.uint8)
        self.lib.cvtt_encode_bc6h(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_int64(n), ctypes.c_int(1 if signed else 0),
            *self._opts_args(opts))
        return out.reshape(n, 16)

    # --- ETC ---------------------------------------------------------------
    def encode_etc1(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_etc1", pixels, 8, opts)

    def encode_etc2(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_etc2", pixels, 8, opts, 0)

    def encode_etc2_rgba(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_etc2", pixels, 16, opts, 1)

    def encode_etc2_punchthrough(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_etc2", pixels, 8, opts, 2)

    def encode_etc2_alpha(self, pixels, opts=OracleOptions()):
        return self._encode_u8("cvtt_encode_etc2_alpha", pixels, 8, opts)

    def encode_eac11(self, pixels_s16, opts=OracleOptions(), signed=False):
        pixels = np.ascontiguousarray(pixels_s16, dtype=np.int16)
        n = pixels.shape[0]
        assert n % 8 == 0 and pixels.shape[1:] == (16,)
        out = np.zeros(n * 8, dtype=np.uint8)
        self.lib.cvtt_encode_eac11(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_int64(n), ctypes.c_int(1 if signed else 0),
            *self._opts_args(opts))
        return out.reshape(n, 8)

    # --- Decoders ----------------------------------------------------------
    def decode_bc7(self, blocks):
        blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
        n = blocks.shape[0]
        out = np.zeros((n, 16, 4), dtype=np.uint8)
        self.lib.cvtt_decode_bc7(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n))
        return out

    def decode_bc6h(self, blocks, signed=False):
        blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
        n = blocks.shape[0]
        out = np.zeros((n, 16, 4), dtype=np.int16)
        self.lib.cvtt_decode_bc6h(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n), ctypes.c_int(1 if signed else 0))
        return out

    # --- BC7 plan ----------------------------------------------------------
    def bc7_plan_from_quality(self, quality: int) -> dict:
        """Return the BC7EncodingPlan fields for a quality level (0 = default)."""
        size = 8 * 5 + 2 + 8 + 4 + 1 + 243 + 129 + 129 + 1 + 243 + 1
        buf = np.zeros(size, dtype=np.uint8)
        self.lib.cvtt_bc7_plan_from_quality(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(quality))
        p = 0

        def take(n):
            nonlocal p
            chunk = buf[p:p + n]
            p += n
            return chunk

        def u64(b):
            return int(np.frombuffer(b.tobytes(), dtype="<u8")[0])

        plan = {}
        plan["mode1_partition_enabled"] = u64(take(8))
        plan["mode2_partition_enabled"] = u64(take(8))
        plan["mode3_partition_enabled"] = u64(take(8))
        plan["mode0_partition_enabled"] = int(np.frombuffer(take(2).tobytes(), dtype="<u2")[0])
        plan["mode7_rgba_partition_enabled"] = u64(take(8))
        plan["mode7_rgb_partition_enabled"] = u64(take(8))
        plan["mode4_sp"] = take(8).reshape(4, 2).copy()
        plan["mode5_sp"] = take(4).copy()
        plan["mode6_enabled"] = bool(take(1)[0])
        plan["seed_points_for_shape_rgb"] = take(243).copy()
        plan["seed_points_for_shape_rgba"] = take(129).copy()
        plan["rgba_shape_list"] = take(129).copy()
        plan["rgba_num_shapes"] = int(take(1)[0])
        plan["rgb_shape_list"] = take(243).copy()
        plan["rgb_num_shapes"] = int(take(1)[0])
        return plan
