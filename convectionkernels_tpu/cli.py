"""Command-line encoder: image -> KTX/DDS.

TPU-native equivalent of the reference's etc2packer example CLI
(/root/reference/etc2packer/etc2packer.cpp:43-293), extended to all
supported formats. Unlike the reference's 8-blocks-per-call loop, the whole
image's blocks go to the device in one batch; with more than one device
(or -shard), blocks are data-parallel sharded over the mesh
(parallel.sharding.encode_sharded).

Usage:
  python -m convectionkernels_tpu.cli [options] input output
  -f <format>     bc1|bc2|bc3|bc4|bc4s|bc5|bc5s|bc6h|bc6hs|bc7|etc1|etc2|
                  etc2rgba|etc2pt|eac_r11|eac_r11s|eac_rg11|eac_rg11s
  -q <1..100>     BC7 quality plan
  -u              uniform channel weights
  -fakebt709      etc2comp-compatible pseudo-BT.709 error metric
  -fast|-better|-ultra   flag presets
  -t <0..1>       BC1/punchthrough alpha threshold
  -mips           encode a full mip chain (2x2 box filter)
  -shard          force the sharded encode path (default: auto when the
                  default mesh has more than one device)
"""

from __future__ import annotations

import sys

import numpy as np

from . import api
from .options import Flags, Options
from .parallel import sharding
from .utils import containers, image as image_util


def load_image(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGBA"))
    except ImportError:
        raise SystemExit(
            "no image loader available (install PIL or use .npy)")


def _u8_to_s8(blocks: np.ndarray) -> np.ndarray:
    """u8 image channel -> signed s8 input (127.5-centered remap)."""
    return (blocks.astype(np.int16) - 128).clip(-127, 127).astype(np.int8)


def _u8_to_half_bits(blocks: np.ndarray) -> np.ndarray:
    """LDR u8 blocks -> f16 bit patterns (for HDR sources use the API with
    PixelBlockF16-style input directly)."""
    return (blocks.astype(np.float32)
            / np.float32(255.0)).astype(np.float16).view(np.int16)


def _eac_channel(blocks: np.ndarray, ch: int) -> np.ndarray:
    return blocks[:, :, ch].astype(np.int16) << 3  # 8-bit -> 11-bit scale


def get_encoder(fmt: str, options: Options, quality):
    """Returns (encode(blocks)->bytes, container_fmt).

    encode() routes through encode_sharded-compatible wrappers so the
    caller can pick the sharded path.
    """
    from .bc7_plan import BC7EncodingPlan, plan_from_quality

    def simple(fn_getter, transform=None):
        fn = fn_getter()

        def encode(blocks, sharded):
            inp = blocks if transform is None else transform(blocks)
            if sharded:
                return sharding.encode_sharded(fn, inp)
            return np.asarray(fn(inp))

        return encode

    def dual_channel(fn_getter, tr0, tr1):
        """Two independent single-channel passes, 8+8 bytes interleaved
        per block (the reference's BC5/RG11 model, API.cpp:166-199)."""
        fn = fn_getter()

        def encode(blocks, sharded):
            run = (lambda b: sharding.encode_sharded(fn, b)) if sharded \
                else (lambda b: np.asarray(fn(b)))
            r = run(tr0(blocks))
            g = run(tr1(blocks))
            return np.concatenate([r, g], axis=-1)

        return encode

    if fmt == "bc7":
        plan = (plan_from_quality(quality) if quality is not None
                else BC7EncodingPlan())
        return simple(lambda: api._bc7_fn(options, plan)), "bc7"
    if fmt in ("bc6h", "bc6hs"):
        signed = fmt == "bc6hs"
        return (simple(lambda: api._bc6h_fn(options, signed),
                       _u8_to_half_bits),
                "bc6h_sf" if signed else "bc6h_uf")
    if fmt in ("bc4s", "bc5s"):
        getter = (lambda: api._bc4_fn(options, True)) if fmt == "bc4s" \
            else (lambda: api._bc5_fn(options, True))
        return simple(getter, _u8_to_s8), "bc4u" if fmt == "bc4s" else "bc5u"
    if fmt in ("eac_r11", "eac_r11s"):
        signed = fmt.endswith("s")
        return (simple(lambda: api._eac_fn(options, signed),
                       lambda b: _eac_channel(b, 0)), fmt)
    if fmt in ("eac_rg11", "eac_rg11s"):
        signed = fmt.endswith("s")
        return (dual_channel(lambda: api._eac_fn(options, signed),
                             lambda b: _eac_channel(b, 0),
                             lambda b: _eac_channel(b, 1)),
                "eac_rg11s" if signed else "eac_rg11")

    simple_map = {
        "bc1": (lambda: api._bc1_fn(options), "bc1"),
        "bc2": (lambda: api._bc2_fn(options), "bc2"),
        "bc3": (lambda: api._bc3_fn(options), "bc3"),
        "bc4": (lambda: api._bc4_fn(options, False), "bc4u"),
        "bc5": (lambda: api._bc5_fn(options, False), "bc5u"),
        "etc1": (lambda: api._etc_fn(options, "etc1"), "etc1"),
        "etc2": (lambda: api._etc_fn(options, "etc2"), "etc2"),
        "etc2rgba": (lambda: api._etc_fn(options, "etc2_rgba"), "etc2_rgba"),
        "etc2pt": (lambda: api._etc_fn(options, "etc2_pt"),
                   "etc2_punchthrough"),
    }
    if fmt not in simple_map:
        raise SystemExit(f"unknown format: {fmt}")
    getter, container_fmt = simple_map[fmt]
    return simple(getter), container_fmt


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    fmt = "etc2"
    quality = None
    flags = Flags.DEFAULT
    threshold = 0.5
    mips = False
    shard = None
    paths = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-f":
            i += 1
            fmt = argv[i]
        elif a == "-q":
            i += 1
            quality = int(argv[i])
        elif a == "-u":
            flags |= Flags.UNIFORM
        elif a == "-fakebt709":
            flags |= Flags.ETC_USE_FAKE_BT709
        elif a == "-fast":
            flags = Flags.FAST
        elif a == "-better":
            flags = Flags.BETTER
        elif a == "-ultra":
            flags = Flags.ULTRA
        elif a == "-t":
            i += 1
            threshold = float(argv[i])
        elif a == "-mips":
            mips = True
        elif a == "-shard":
            shard = True
        else:
            paths.append(a)
        i += 1

    if len(paths) != 2:
        print(__doc__)
        return 1
    input_path, output_path = paths

    img = load_image(input_path)
    options = Options(flags=flags, threshold=threshold)
    encode, container_fmt = get_encoder(fmt, options, quality)

    if shard is None:
        import jax
        shard = len(jax.devices()) > 1

    images = image_util.mip_chain(img) if mips else [img]
    levels = []
    for level_img in images:
        h, w = level_img.shape[:2]
        blocks = image_util.blockify(level_img)
        levels.append((encode(blocks, shard), w, h))

    if output_path.endswith(".dds"):
        containers.write_dds(output_path, levels, fmt=container_fmt)
    else:
        containers.write_ktx(output_path, levels, fmt=container_fmt)
    total = sum(b.nbytes for b, _, _ in levels)
    print(f"wrote {output_path}: {fmt}, {levels[0][1]}x{levels[0][2]}, "
          f"{len(levels)} level(s), {total} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
