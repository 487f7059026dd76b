"""Command-line encoder: image -> KTX/DDS.

TPU-native equivalent of the reference's etc2packer example CLI
(/root/reference/etc2packer/etc2packer.cpp:43-293), extended to all
supported formats. Unlike the reference's 8-blocks-per-call loop, the whole
image's blocks go to the device in one batch (sharded across chips when more
than one is available).

Usage:
  python -m convectionkernels_tpu.cli [options] input output
  -f <format>     bc1|bc2|bc3|bc4|bc5|bc6h|bc6hs|bc7|etc1|etc2|etc2rgba|
                  etc2pt|eac_r11|eac_r11s
  -q <1..100>     BC7 quality plan
  -u              uniform channel weights
  -fakebt709      etc2comp-compatible pseudo-BT.709 error metric
  -fast|-better|-ultra   flag presets
  -t <0..1>       BC1/punchthrough alpha threshold
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


ENCODERS = {
    "bc1": (api.encode_bc1, "bc1"),
    "bc2": (api.encode_bc2, "bc2"),
    "bc3": (api.encode_bc3, "bc3"),
    "bc4": (api.encode_bc4u, "bc4u"),
    "bc5": (api.encode_bc5u, "bc5u"),
    "bc7": (api.encode_bc7, "bc7"),
    "etc1": (api.encode_etc1, "etc1"),
    "etc2": (api.encode_etc2, "etc2"),
    "etc2rgba": (api.encode_etc2_rgba, "etc2_rgba"),
    "etc2pt": (api.encode_etc2_punchthrough, "etc2_punchthrough"),
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    fmt = "etc2"
    quality = None
    flags = Flags.DEFAULT
    threshold = 0.5
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
        else:
            paths.append(a)
        i += 1

    if len(paths) != 2:
        print(__doc__)
        return 1
    input_path, output_path = paths

    img = load_image(input_path)
    h, w = img.shape[:2]
    blocks = image_util.blockify(img)

    options = Options(flags=flags, threshold=threshold)

    if fmt in ("bc6h", "bc6hs"):
        # LDR image promoted to half floats (for HDR sources use the API
        # with PixelBlockF16-style input directly)
        rgbaf = (np.asarray(img, dtype=np.float32)
                 / np.float32(255.0)).astype(np.float16).view(np.int16)
        pad_h, pad_w = (-h) % 4, (-w) % 4
        rgbaf = np.pad(rgbaf, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
        bh, bw = rgbaf.shape[0] // 4, rgbaf.shape[1] // 4
        hblocks = rgbaf.reshape(bh, 4, bw, 4, 4).transpose(
            0, 2, 1, 3, 4).reshape(-1, 16, 4)
        enc = api.encode_bc6hs if fmt == "bc6hs" else api.encode_bc6hu
        out = np.asarray(enc(hblocks, options))
        container_fmt = "bc6h_sf" if fmt == "bc6hs" else "bc6h_uf"
        if output_path.endswith(".dds"):
            containers.write_dds(output_path, out, w, h, container_fmt)
        else:
            containers.write_ktx(output_path, out, w, h, container_fmt)
        print(f"wrote {output_path}: {fmt}, {w}x{h}, {out.nbytes} bytes")
        return 0
    if fmt in ("eac_r11", "eac_r11s"):
        chan = blocks[:, :, 0].astype(np.int16) << 3  # 8-bit -> 11-bit scale
        out = np.asarray(api.encode_eac11(chan, signed=fmt.endswith("s"),
                                          options=options))
        container_fmt = "eac_r11" if fmt == "eac_r11" else "eac_r11s"
    else:
        encode, container_fmt = ENCODERS[fmt]
        if fmt == "bc7" and quality is not None:
            out = np.asarray(encode(blocks, options, quality=quality))
        else:
            out = np.asarray(encode(blocks, options))

    if output_path.endswith(".dds"):
        containers.write_dds(output_path, out, w, h, container_fmt)
    else:
        containers.write_ktx(output_path, out, w, h, container_fmt)
    print(f"wrote {output_path}: {fmt}, {w}x{h}, {out.nbytes} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
