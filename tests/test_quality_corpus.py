"""Real-image-class quality corpus with pinned PSNR regression values.

No photographic test sets ship in this offline image, so the corpus is
three deterministic 128x128 synthetic images spanning the statistics the
Kodak-class sets exercise: smooth gradients, multi-octave texture, and
hard edges with alpha structure (BASELINE.md protocol steps 2-3).

Two gates per format:
- bit-exact match rate vs the scalar reference oracle must be 1.0
  (encoding quality therefore EQUALS the reference's by construction);
- for the formats with decoders (BC7, BC6H) the round-trip PSNR vs the
  source must match tests/quality_corpus_expected.json to 0.01 dB.

Regenerate the pinned values with CONVECTION_UPDATE_CORPUS=1 after an
intentional change (any diff is a quality regression otherwise).
"""

import json
import os

import numpy as np
import pytest

import convectionkernels_tpu as ck
from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions

EXPECTED_PATH = os.path.join(os.path.dirname(__file__),
                             "quality_corpus_expected.json")


def _value_noise(rng, size, octaves):
    """Multi-octave smooth noise in [0,1]: photographic-texture proxy."""
    img = np.zeros((size, size), dtype=np.float64)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        cells = 2 ** (o + 2)
        grid = rng.random((cells + 1, cells + 1))
        xs = np.linspace(0, cells, size, endpoint=False)
        x0 = xs.astype(int)
        fx = xs - x0
        fx = fx * fx * (3 - 2 * fx)  # smoothstep
        g00 = grid[np.ix_(x0, x0)]
        g10 = grid[np.ix_(x0 + 1, x0)]
        g01 = grid[np.ix_(x0, x0 + 1)]
        g11 = grid[np.ix_(x0 + 1, x0 + 1)]
        fy = fx[:, None]
        fxx = fx[None, :]
        val = (g00 * (1 - fy) * (1 - fxx) + g10 * fy * (1 - fxx)
               + g01 * (1 - fy) * fxx + g11 * fy * fxx)
        img += amp * val
        total += amp
        amp *= 0.5
    return img / total


def corpus_images(size=128):
    rng = np.random.default_rng(2026)
    images = {}

    # smooth: radial + linear gradients
    y, x = np.mgrid[0:size, 0:size] / size
    r = np.sqrt((x - 0.3) ** 2 + (y - 0.6) ** 2)
    img = np.stack([x, 1 - r, y * (1 - x)], axis=-1)
    smooth = np.clip(img * 255, 0, 255).astype(np.uint8)
    images["smooth"] = np.concatenate(
        [smooth, np.full((size, size, 1), 255, np.uint8)], axis=-1)

    # detail: independent multi-octave noise per channel
    chans = [(_value_noise(rng, size, 5) * 255).astype(np.uint8)
             for _ in range(3)]
    images["detail"] = np.stack(
        chans + [np.full((size, size), 255, np.uint8)], axis=-1)

    # edges: rectangles/disks with hard boundaries + alpha holes
    img = np.full((size, size, 4), 255, np.uint8)
    for _ in range(24):
        x0, y0 = rng.integers(0, size - 8, 2)
        w, h = rng.integers(4, 48, 2)
        color = rng.integers(0, 256, 3)
        img[y0:y0 + h, x0:x0 + w, :3] = color
    alpha = np.full((size, size), 255, np.uint8)
    for _ in range(6):
        cx, cy = rng.integers(16, size - 16, 2)
        rad = int(rng.integers(4, 20))
        mask = (x * size - cx) ** 2 + (y * size - cy) ** 2 < rad ** 2
        alpha[mask] = rng.integers(0, 255)
    img[..., 3] = alpha
    images["edges"] = img

    return images


def _blockify(img):
    from convectionkernels_tpu.utils import image as image_util
    return image_util.blockify(img)


def _psnr(a, b, max_value=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(max_value * max_value / mse))


@pytest.fixture(scope="module")
def oracle():
    return CvttOracle("scalar")


@pytest.mark.slow
def test_quality_corpus(oracle):
    images = corpus_images()
    results = {}

    for name, img in images.items():
        blocks = _blockify(img)
        entry = {}

        # bit-exactness gates (quality == reference by construction)
        pairs = [
            ("bc1", ck.encode_bc1(blocks), oracle.encode_bc1(blocks)),
            ("bc3", ck.encode_bc3(blocks), oracle.encode_bc3(blocks)),
            ("etc2", ck.encode_etc2(blocks), oracle.encode_etc2(blocks)),
            ("bc7_q50", ck.encode_bc7(blocks, quality=50),
             oracle.encode_bc7(blocks, OracleOptions(), 50)),
        ]
        for fmt, got, ref in pairs:
            got = np.asarray(got)
            match = float(np.all(got == ref, axis=1).mean())
            entry[f"{fmt}_match_rate"] = match
            assert match == 1.0, f"{name}/{fmt}: match rate {match}"

        # decoder round-trip PSNR (BC7; RGB channels; alpha-weighted
        # blocks keep their encoded alpha)
        bc7_bytes = np.asarray(ck.encode_bc7(blocks, quality=50))
        decoded = ck.decode_bc7(bc7_bytes)
        entry["bc7_q50_psnr"] = round(
            _psnr(blocks[..., :3], decoded[..., :3]), 4)

        results[name] = entry

    # BC6H on the detail image promoted to half floats
    img = images["detail"]
    half = (img.astype(np.float32) / np.float32(255.0)) \
        .astype(np.float16).view(np.int16)
    hblocks = _blockify_half(half)
    ref = oracle.encode_bc6h(hblocks[:512], signed=False)
    got = np.asarray(ck.encode_bc6hu(hblocks[:512]))
    match = float(np.all(got == ref, axis=1).mean())
    assert match == 1.0, f"bc6hu match rate {match}"
    decoded = ck.decode_bc6hu(got)
    src = np.ascontiguousarray(
        hblocks[:512].reshape(-1, 4)[:, :3]).view(np.float16) \
        .astype(np.float64)
    dec = np.ascontiguousarray(
        decoded.reshape(-1, 4)[:, :3].astype(np.int16)) \
        .view(np.float16).astype(np.float64)
    mse = np.mean((src - dec) ** 2)
    results["detail"]["bc6hu_match_rate"] = match
    results["detail"]["bc6hu_psnr_linear1"] = round(
        float(10 * np.log10(1.0 / mse)), 4)

    if os.environ.get("CONVECTION_UPDATE_CORPUS"):
        with open(EXPECTED_PATH, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        pytest.skip("corpus expectations regenerated")

    if not os.path.exists(EXPECTED_PATH):
        pytest.skip("pinned corpus values not generated yet; run with "
                    "CONVECTION_UPDATE_CORPUS=1 (the match-rate gates "
                    "above still ran and passed)")
    with open(EXPECTED_PATH) as f:
        expected = json.load(f)
    for name, entry in expected.items():
        for key, val in entry.items():
            got = results[name][key]
            assert abs(got - val) < 0.01, (
                f"{name}/{key}: {got} != pinned {val}")


def _blockify_half(half_img):
    h, w = half_img.shape[:2]
    pad_h, pad_w = (-h) % 4, (-w) % 4
    padded = np.pad(half_img, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    bh, bw = padded.shape[0] // 4, padded.shape[1] // 4
    return np.ascontiguousarray(
        padded.reshape(bh, 4, bw, 4, 4).transpose(0, 2, 1, 3, 4)
        .reshape(-1, 16, 4))
