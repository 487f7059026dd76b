"""Multi-chip / multi-host data-parallel encoding.

The reference has no distribution layer: callers loop over 8-block groups
(etc2packer.cpp:215-281) and blocks never interact. The TPU-native
generalization shards the flattened block axis over a jax.sharding.Mesh:
pixel blocks are data-parallel on the leading axis, Options/plan/LUTs are
replicated (broadcast once), and the fixed-size encoded outputs come back
shard-local in raster order (no collectives needed beyond the input/output
layout transfers XLA inserts).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(devices=None) -> Mesh:
    """One-axis data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), axis_names=("blocks",))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def encode_sharded(encode_fn, pixels, mesh: Mesh | None = None):
    """Encode [N, 16, C] pixel blocks data-parallel over `mesh`.

    encode_fn: a jitted batch encoder (e.g. api._bc1_fn(options)).
    Blocks are padded to a multiple of the mesh size (padding replicates
    block 0; the pad is stripped from the output), sharded on the leading
    axis, encoded, and returned unsharded in raster order.
    """
    if mesh is None:
        mesh = default_mesh()
    num_devices = mesh.devices.size

    pixels = np.asarray(pixels)
    n = pixels.shape[0]
    n_pad = pad_to_multiple(n, num_devices)
    if n_pad != n:
        pad = np.broadcast_to(pixels[:1], (n_pad - n,) + pixels.shape[1:])
        pixels = np.concatenate([pixels, pad], axis=0)

    sharding = NamedSharding(mesh, P("blocks"))
    device_pixels = jax.device_put(pixels, sharding)
    out = encode_fn(device_pixels)
    return np.asarray(out)[:n]
