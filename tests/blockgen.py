"""Deterministic test-block generators covering the encoders' code paths."""

import numpy as np


def random_blocks(n, seed=0):
    """Uniform random RGBA blocks."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 16, 4), dtype=np.uint8)


def gradient_blocks(n, seed=0):
    """Smooth two-color gradients (the common natural-image case)."""
    rng = np.random.default_rng(seed + 1)
    c0 = rng.integers(0, 256, size=(n, 1, 4)).astype(np.float32)
    c1 = rng.integers(0, 256, size=(n, 1, 4)).astype(np.float32)
    t = rng.random((n, 16, 1), dtype=np.float32)
    px = c0 + (c1 - c0) * t
    noise = rng.integers(-6, 7, size=(n, 16, 4)).astype(np.float32)
    return np.clip(px + noise, 0, 255).astype(np.uint8)


def flat_blocks(n, seed=0):
    """Single-color blocks (exercise degenerate PCA / single-color paths)."""
    rng = np.random.default_rng(seed + 2)
    c = rng.integers(0, 256, size=(n, 1, 4), dtype=np.uint8)
    return np.broadcast_to(c, (n, 16, 4)).copy()


def alpha_blocks(n, seed=0):
    """Blocks with mixed transparent/opaque pixels (BC1 alpha-test path)."""
    rng = np.random.default_rng(seed + 3)
    px = gradient_blocks(n, seed + 4)
    alpha = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    px[..., 3] = alpha
    return px


def mixed_blocks(n, seed=0):
    """A balanced mix of all generators; n must be a multiple of 8."""
    quarter = max(n // 4, 8)
    parts = [
        random_blocks(quarter, seed),
        gradient_blocks(quarter, seed),
        flat_blocks(quarter, seed),
        alpha_blocks(n - 3 * quarter, seed),
    ]
    return np.concatenate(parts, axis=0)[:n]
