"""Multi-chip / multi-host data-parallel encoding.

The reference has no distribution layer: callers loop over 8-block groups
(etc2packer.cpp:215-281) and blocks never interact. The TPU-native
generalization shards the flattened block axis over a jax.sharding.Mesh
via shard_map: each device runs the per-shard chunked encoder on its own
slice of the block axis with NO collectives (the exact analogue of the
reference's caller-distributed independence contract), Options/plan/LUTs
are jit-static constants replicated into every shard's program, and the
fixed-size encoded outputs come back shard-local in raster order.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def default_mesh(devices=None) -> Mesh:
    """One-axis data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), axis_names=("blocks",))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _sharded_fn(encode_fn, mesh: Mesh, chunk: int | None):
    """jit(shard_map(per-shard chunked body)) for `encode_fn` over `mesh`.

    encode_fn is an api._wrap result (carries .body/.chunk) or any plain
    batch encoder. Inside shard_map every device sees only its [N/D, ...]
    shard, so the lax.map chunking composes per shard and XLA cannot
    insert any cross-device resharding of the candidate tensors.
    """
    from ..api import _chunked

    body = getattr(encode_fn, "body", encode_fn)
    if chunk is None:
        chunk = getattr(encode_fn, "chunk", None)
    local = _chunked(body, chunk) if chunk else body

    spec = P("blocks")
    try:
        # check_vma=False: the Pallas kernels inside the encoders return
        # plain ShapeDtypeStruct outputs with no varying-mesh-axes
        # annotation, which the vma checker rejects; the no-collectives
        # HLO assertion in tests/test_sharded.py covers what the checker
        # would (shard independence).
        fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    except TypeError:  # pragma: no cover - older jax: check_rep instead
        fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_rep=False)
    return jax.jit(fn)


def encode_sharded(encode_fn, pixels, mesh: Mesh | None = None,
                   chunk: int | None = None):
    """Encode [N, 16, C] pixel blocks data-parallel over `mesh`.

    encode_fn: an api encoder (e.g. api._bc1_fn(options)).
    Blocks are padded to a multiple of the mesh size (padding replicates
    block 0; the pad is stripped from the output), sharded on the leading
    axis, encoded shard-locally (each shard applies the same lax.map
    chunking as the single-device path), and returned in raster order.
    `chunk` overrides the per-shard chunk size (tests force tiny chunks).
    """
    if mesh is None:
        mesh = default_mesh()
    num_devices = mesh.devices.size

    pixels = np.asarray(pixels)
    n = pixels.shape[0]

    split = getattr(encode_fn, "split", None)
    if split is not None:
        # Host-routed program split (ETC2 punchthrough's transparency
        # classification, api._etc2_pt_dispatch): classify on host, shard
        # each subset through its own (much cheaper) program, scatter the
        # outputs back in raster order. Byte-exact vs the single-device
        # dispatcher because the same subsets run the same programs.
        classify, opaque_fn, pt_fn = split
        route_pt = classify(pixels)
        if route_pt.all() or not route_pt.any():
            sub_fn = pt_fn if route_pt.any() else opaque_fn
            return encode_sharded(sub_fn, pixels, mesh, chunk)
        out_o = encode_sharded(opaque_fn, pixels[~route_pt], mesh, chunk)
        out_p = encode_sharded(pt_fn, pixels[route_pt], mesh, chunk)
        out = np.empty((n,) + out_o.shape[1:], dtype=out_o.dtype)
        out[~route_pt] = out_o
        out[route_pt] = out_p
        return out

    n_pad = pad_to_multiple(n, num_devices)
    if n_pad != n:
        pad = np.broadcast_to(pixels[:1], (n_pad - n,) + pixels.shape[1:])
        pixels = np.concatenate([pixels, pad], axis=0)

    sharding = NamedSharding(mesh, P("blocks"))
    device_pixels = jax.device_put(pixels, sharding)
    out = _sharded_fn(encode_fn, mesh, chunk)(device_pixels)
    return np.asarray(out)[:n]
