"""Multi-host distributed encoding.

The reference leaves distribution entirely to the caller: etc2packer's
block loop (/root/reference/etc2packer/etc2packer.cpp:215-281) is the
model — blocks are independent, so any partition of the block axis is
valid. The TPU-native generalization runs ONE JAX program over a pod
slice: `initialize()` wires up jax.distributed, every host blockifies
only its raster slice of the image (edge-clamp semantics exactly as
etc2packer.cpp:226-231, applied globally), the global block axis is
sharded over all devices of the global mesh, and the encoded bytes come
back shard-local in raster order (each host holds its own contiguous
output slice; no gather is required to write a partitioned file, and an
optional all-gather assembles the full buffer on every host).

Options/plans/LUTs are jit-static constants, so they are "broadcast" by
compilation rather than communication; the only cross-host traffic is
the jax.distributed control plane.
"""

from __future__ import annotations

import numpy as np

import jax

from ..utils import image as image_util
from .sharding import _sharded_fn, default_mesh, pad_to_multiple


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host encoding.

    On TPU pods with standard env metadata all arguments are discovered
    automatically; tests pass them explicitly for local CPU processes.
    Safe to call once per process, before any other JAX call.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def _block_grid(height: int, width: int) -> tuple[int, int]:
    return (height + 3) // 4, (width + 3) // 4


def local_block_range(n_blocks: int, n_pad: int) -> tuple[int, int]:
    """[start, end) of the global (padded) block axis owned by this process.

    The padded block axis is split evenly over processes in process-index
    order, matching NamedSharding(P("blocks")) over a mesh built from
    jax.devices() (devices are ordered by process).
    """
    pcount = jax.process_count()
    assert n_pad % pcount == 0
    per = n_pad // pcount
    start = jax.process_index() * per
    return start, start + per


def blockify_local_slice(image: np.ndarray, start: int, end: int,
                         n_blocks: int) -> np.ndarray:
    """Blockify only the rows of `image` covering global blocks [start, end).

    Blocks are in raster order (bh x bw grid); this host needs pixel rows
    [4*r0, 4*r1) where r0/r1 are the covering block-row range. Blocks past
    n_blocks (device padding) replicate block 0, matching
    sharding.encode_sharded's padding convention.
    """
    h, w = image.shape[:2]
    bh, bw = _block_grid(h, w)
    real_end = min(end, n_blocks)
    if real_end > start:
        r0 = start // bw
        r1 = (real_end - 1) // bw + 1
        rows = image[r0 * 4: min(r1 * 4, h)]
        blocks = image_util.blockify(rows)  # [(r1-r0)*bw, 16, 4]
        local = blocks[start - r0 * bw: real_end - r0 * bw]
    else:  # this process owns only padding
        local = image_util.blockify(image[:4, :4])[:0]
    if end > max(start, n_blocks):  # pad region: replicate a valid block
        pad_block = (local[:1] if len(local)
                     else image_util.blockify(image[:4, :4])[:1])
        pad = np.broadcast_to(pad_block,
                              (end - max(start, n_blocks),) + pad_block.shape[1:])
        local = np.concatenate([local, pad], axis=0)
    return np.ascontiguousarray(local)


def encode_image_distributed(encode_fn, image: np.ndarray,
                             mesh=None, chunk: int | None = None,
                             assemble: bool = False):
    """Encode a [H, W, C] u8 image data-parallel over every host's devices.

    Returns (local_bytes, start, n_blocks): this process's contiguous
    slice of the encoded output (raster block order) and its global
    offset; with assemble=True returns the fully assembled [n_blocks, B]
    array instead (all-gathered to every host).

    encode_fn: an api encoder wrapper (e.g. api._bc1_fn(options)).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = default_mesh()  # jax.devices() = global device list
    num_devices = mesh.devices.size

    h, w = image.shape[:2]
    bh, bw = _block_grid(h, w)
    n_blocks = bh * bw
    n_pad = pad_to_multiple(n_blocks, max(num_devices, jax.process_count()))
    n_pad = pad_to_multiple(n_pad, num_devices)

    start, end = local_block_range(n_blocks, n_pad)
    local = blockify_local_slice(image, start, end, n_blocks)

    sharding = NamedSharding(mesh, P("blocks"))
    global_pixels = jax.make_array_from_process_local_data(
        sharding, local, global_shape=(n_pad,) + local.shape[1:])

    out = _sharded_fn(encode_fn, mesh, chunk)(global_pixels)

    if assemble:
        from jax.experimental import multihost_utils
        full = multihost_utils.process_allgather(out, tiled=True)
        return np.asarray(full)[:n_blocks]

    # shard-local output: addressable shards are this host's contiguous
    # raster slice (same partition as the input)
    local_out = np.concatenate(
        [np.asarray(s.data) for s in
         sorted(out.addressable_shards, key=lambda s: s.index[0].start or 0)],
        axis=0)
    return local_out[: max(0, min(end, n_blocks) - start)], start, n_blocks
