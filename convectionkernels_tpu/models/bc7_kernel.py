"""Pallas TPU mega-kernel for the BC7 single-plane candidate search.

The XLA graph path in bc7.py evaluates each mode's candidate grid as
~2,000 separate fused ops over HBM-resident arrays; at the default chunk
size that is hundreds of GB of HBM round-trips per chunk and the encode
runs at ~0.1 Mtexels/s on a v5e (measured, tools/profile_formats.py).
This kernel runs the whole refine loop — endpoint compression, index
selection with the +-1 slow-indexing retest, error accumulation,
least-squares refinement, and the per-candidate lexicographic
(error, rank) round merge — inside VMEM for a tile of NB blocks.

Candidate packing: the K axis enumerates exactly the plan-valid
(shape, tweak, parity) triples (the reference's seed-count pruning,
BC67.cpp:1265-1279), padded to a multiple of 128 lanes — a dense
C x S grid would re-add the 1.6x (q100) to 9.5x (q5) work the plan
prunes. Per-candidate statics (parity bits, visitation rank, per-pixel
shape membership) ride in a packed [19, K] i32 input; per-shape winner
selection happens OUTSIDE the kernel with static gathers (bc7.py
_single_plane_kernel_best) since ranks make the merge order-free.

Bit-exactness: the kernel body calls the SAME elementwise helpers as
the XLA path (bc7_common.compress_endpoints / accumulate_error,
ops.index_select.IndexSelector, ops.refine.EndpointRefiner,
ops.exact_math), so both paths trace identical arithmetic;
tests/test_bc7_kernel.py pins kernel-vs-graph byte equality and the
oracle goldens cover the kernel path whenever the suite runs on TPU.

Reference: /root/reference/ConvectionKernels_BC67.cpp:1042-1662.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import lanes
from ..ops.index_select import IndexSelector
from ..ops.refine import EndpointRefiner
from . import bc7_common

BIG_RANK = np.int32(2**30)
INF = np.float32(np.inf)

# Blocks per grid step (sublane tile). The kernel's VMEM stack is ~8 MB
# per 256 candidate lanes at NB=8 (Mosaic allocates the unrolled body's
# temporaries); the vmem_limit below admits the measured worst case.
NB = 8


def _kernel_body(mode, k_len, num_refine_rounds, cfg, cw,
                 pix_ref, alpha_ref, consts_ref,
                 e000, e001, e002, e003, e100, e101, e102, e103,
                 err_out, rank_out, ep_out):
    """One NB-block tile: full refine loop for all K packed candidates."""
    nb = pix_ref.shape[0]

    pix = pix_ref[:]                      # [NB, 64] i32 (px*4+ch)
    alpha = alpha_ref[:]                  # [NB, K] f32; +inf marks invalid

    ep = [[e000[:], e001[:], e002[:], e003[:]],
          [e100[:], e101[:], e102[:], e103[:]]]

    # packed static rows (see single_plane_mode_best): per-endpoint parity
    # bits, 16 per-pixel shape-membership rows, per-candidate rank
    p0k = consts_ref[0:1, :]              # [1, K] i32
    p1k = consts_ref[1:2, :]
    members = [consts_ref[2 + px:3 + px, :] != 0 for px in range(16)]
    rank_k = consts_ref[18:19, :]         # [1, K] i32

    # per-pixel values as [NB, 1] columns (broadcast against [NB, K])
    fps, ips, pwps = [], [], []
    for px in range(16):
        fp_row, ip_row, pw_row = [], [], []
        for ch in range(4):
            ip = pix[:, px * 4 + ch][:, None]
            fp = lanes.to_float(ip)
            ip_row.append(ip)
            fp_row.append(fp)
            pw_row.append(fp * np.float32(cw[ch]))
        fps.append(fp_row)
        ips.append(ip_row)
        pwps.append(pw_row)

    full255 = jnp.full((nb, k_len), 255, dtype=jnp.int32)
    zero_nk = jnp.zeros((nb, k_len), dtype=jnp.float32)

    best_err = jnp.full((nb, k_len), lanes.FLT_MAX, dtype=jnp.float32)
    best_rank = jnp.full((nb, k_len), BIG_RANK, dtype=jnp.int32)
    best_ep = [jnp.zeros((nb, k_len), dtype=jnp.int32) for _ in range(8)]

    for refine in range(num_refine_rounds):
        compressed = bc7_common.compress_endpoints(mode, ep, p0k, p1k,
                                                   full255)
        selector = IndexSelector(cw, compressed, cfg["index_range"], 4)
        refiner = (EndpointRefiner(zero_nk, 4, cfg["index_range"], cw)
                   if refine != num_refine_rounds - 1 else None)

        shape_error, _ = bc7_common.accumulate_error(
            selector, zero_nk, members, fps, ips, cfg,
            with_refiner=refiner, pwps=pwps)

        err_r = shape_error + alpha
        rank_r = rank_k * num_refine_rounds + refine
        better = (err_r < best_err) | ((err_r == best_err)
                                       & (rank_r < best_rank))
        best_err = jnp.where(better, err_r, best_err)
        best_rank = jnp.where(better, rank_r, best_rank)
        for i in range(8):
            best_ep[i] = jnp.where(better, compressed[i // 4][i % 4],
                                   best_ep[i])

        if refiner is not None:
            r0, r1 = refiner.get_refined_endpoints_ldr(
                cfg["num_real_channels"])
            for ch in range(cfg["num_real_channels"]):
                ep[0][ch] = r0[ch]
                ep[1][ch] = r1[ch]

    err_out[:] = best_err
    rank_out[:] = best_rank
    for i in range(8):
        ep_out[:, i * k_len:(i + 1) * k_len] = best_ep[i]


def single_plane_mode_best(mode, pix_flat, ep_init, alpha_k, consts,
                           cfg, cw, num_refine_rounds, interpret=False):
    """Run the mode's packed-candidate refine kernel.

    Args:
      pix_flat: [N, 64] i32 pixels (px*4+ch).
      ep_init:  [2][4] lists of [N, K] i32 initial (tweaked) endpoints.
      alpha_k:  [N, K] f32 per-candidate static alpha error, +inf where
                the candidate is invalid (padding / punchthrough parity).
      consts:   [19, K] numpy i32: rows 0/1 parity bits, 2..17 per-pixel
                membership, 18 visitation rank.
      cfg: accumulate_error config.

    Returns (best_err [N, K] f32, best_rank [N, K] i32,
             best_ep [N, 8*K] i32) — per-candidate best over refine rounds.
    """
    n, k_len = ep_init[0][0].shape
    assert n % NB == 0, (n, NB)

    kernel = functools.partial(_kernel_body, mode, k_len,
                               num_refine_rounds, cfg, cw)

    def spec(width):
        return pl.BlockSpec((NB, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    consts_spec = pl.BlockSpec((19, k_len), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    err, rank, ep = pl.pallas_call(
        kernel,
        grid=(n // NB,),
        in_specs=[spec(64), spec(k_len), consts_spec] + [spec(k_len)] * 8,
        out_specs=[spec(k_len), spec(k_len), spec(8 * k_len)],
        out_shape=[
            jax.ShapeDtypeStruct((n, k_len), jnp.float32),
            jax.ShapeDtypeStruct((n, k_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 8 * k_len), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(pix_flat, alpha_k, jnp.asarray(consts),
      ep_init[0][0], ep_init[0][1], ep_init[0][2], ep_init[0][3],
      ep_init[1][0], ep_init[1][1], ep_init[1][2], ep_init[1][3])
    return err, rank, ep
