"""BC7 encoder.

TPU-native reimplementation of the reference's BC7Computer
(/root/reference/ConvectionKernels_BC67.cpp:815-2445), redesigned for dense
batched evaluation: where the reference loops mode x shape x parity x tweak x
refine sequentially over 8 SIMD lanes, this encoder evaluates whole candidate
*axes* (shapes S, tweaks T, parities P) as array dimensions over N blocks at
once, and resolves the reference's first-strict-improvement-wins update rule
exactly via lexicographic (error, visitation-rank) argmin: the reference's
winner is always the lowest-visitation-rank candidate achieving the global
minimum error, so ordered argmin reproduces it bit-for-bit.

Float32 semantics follow the scalar reference build (see ops/lanes.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..bc7_plan import BC7EncodingPlan
from ..ops import lanes, pca
from ..ops.index_select import IndexSelector
from ..ops.refine import EndpointRefiner
from ..options import Flags
from ..tables import bc7_geometry as geom
from ..tables import bc7_single_color
from . import bc7_common
from .bc7_common import (MAX_TWEAK_ROUNDS, MODE_INFO,  # noqa: F401
                         compress_endpoints)
from .bc7_common import quantize as _quantize
from .bc7_common import quantize_p as _quantize_p
from .bc7_common import unquantize as _unquantize

INF = np.float32(np.inf)
BIG_RANK = np.int32(2**30)


def _use_pallas_kernel() -> bool:
    """Whether the single-plane search runs as the Pallas TPU mega-kernel
    (bc7_kernel.py). Default: on for TPU backends, off for CPU (where the
    kernel would run interpreted). CONVECTION_BC7_KERNEL=0/1 overrides."""
    env = os.environ.get("CONVECTION_BC7_KERNEL")
    if env is not None:
        return env != "0"
    return jax.default_backend() in ("tpu", "axon")


# --- Lexicographic best tracking ---------------------------------------------

class LexBest:
    """Running (error, rank) lexicographic minimum with payload arrays.

    Reproduces the reference's sequential strict-less update: the final
    winner is the minimum-rank candidate among those achieving the minimum
    error, where rank is the reference's visitation order.
    """

    def __init__(self, error, rank, payload: dict):
        self.error = error
        self.rank = rank
        self.payload = payload

    @classmethod
    def empty(cls, shape, payload_spec: dict):
        error = jnp.full(shape, lanes.FLT_MAX, dtype=jnp.float32)
        rank = jnp.full(shape, BIG_RANK, dtype=jnp.int32)
        payload = {k: jnp.zeros(shape + extra, dtype=jnp.int32)
                   for k, extra in payload_spec.items()}
        return cls(error, rank, payload)

    def update(self, error, rank, payload: dict, extra_valid=None):
        better = (error < self.error) | ((error == self.error)
                                         & (rank < self.rank))
        if extra_valid is not None:
            better = better & extra_valid
        self.error = jnp.where(better, error, self.error)
        self.rank = jnp.where(better, rank, self.rank)
        for k in self.payload:
            extra = self.payload[k].ndim - better.ndim
            b = better.reshape(better.shape + (1,) * extra)
            self.payload[k] = jnp.where(b, payload[k], self.payload[k])


def _ordered_argmin(error, rank_axis_is_ordered=True):
    """First-occurrence argmin over the last axis (candidates pre-ordered by
    visitation rank), returning (min_error, argmin_index). Uses the
    one-pass (value, index) lexicographic reduce — jnp.argmin's documented
    first-occurrence tie rule is not honored by every XLA:TPU reduce
    lowering, and the two-pass first_argmin form made XLA re-fuse the
    producer chain into both reduction passes."""
    err, idx = lanes.lex_min_with_index(error, -1)
    return err, idx


def _gather_cols(arr, col):
    """arr[n, col[n]] via a masked sum (3 vector ops) instead of
    take_along_axis, which XLA:TPU lowers to a ~40 us serial gather.
    Exact for ints and for the non-negative f32 errors used here."""
    mask = col[:, None] == jnp.arange(arr.shape[1],
                                      dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(mask, arr, 0), axis=1)


def _lut(table, idx):
    """table[idx] for a small constant table, as a masked sum."""
    t = jnp.asarray(table)
    mask = idx[:, None] == jnp.arange(t.shape[0],
                                      dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(mask, t[None, :], 0), axis=1)


def _gather_last(arr, idx):
    """Select arr[..., idx] over a small static last axis.

    XLA:TPU lowers per-element take_along_axis to a serial gather
    (~40 us per call measured); for the <=8-wide candidate axes used
    here a where-chain is pure VPU work and an order of magnitude
    cheaper. Falls back to gather for wide axes."""
    t = arr.shape[-1]
    if t > 8:
        return jnp.take_along_axis(arr, idx[..., None], axis=-1)[..., 0]
    out = arr[..., 0]
    for j in range(1, t):
        out = jnp.where(idx == j, arr[..., j], out)
    return out


# --- Single-plane search ------------------------------------------------------

def _shape_pca(pw_pixels, shape_ids, nch: int, channel_weights):
    """Per-shape PCA endpoints: returns (base, offset) lists of [N, S] arrays.

    Generalizes the reference's per-shape EndpointSelector loops
    (BC67.cpp:1085-1144) by making the shape list an array axis.
    """
    masks = geom.shape_masks()[np.asarray(shape_ids)]  # [S, 16]
    s = masks.shape[0]

    pw = [[pw_pixels[px][ch][:, None] for ch in range(nch)]
          for px in range(16)]
    weights = [jnp.asarray(np.broadcast_to(
        masks[:, px].astype(np.float32), (1, s))) for px in range(16)]
    member = [jnp.asarray(np.broadcast_to(masks[:, px], (1, s)))
              for px in range(16)]

    centroid, direction, min_d, max_d = pca.endpoint_selector(
        pw, weights, nch, member_mask=member)
    return pca.get_endpoints(centroid, direction, min_d, max_d,
                             channel_weights, nch)


def _single_plane_grid_best(mode, n, float_pixels, pixels, pw_pixels,
                            base, offset, seeds, c_t, c_p, pti_c, p0c, p1c,
                            cw, cfg, base_rank_c, num_refine_rounds,
                            s_count, c_count,
                            static_alpha_error_rgb, cols, is_rgb, masks):
    """XLA-graph candidate evaluation over the [N,C,S] grid (the non-Pallas
    path; same arithmetic as bc7_kernel._kernel_body)."""
    index_range = cfg["index_range"]
    num_real_channels = cfg["num_real_channels"]
    t_count = MAX_TWEAK_ROUNDS

    f0s = np.zeros(t_count, dtype=np.float32)
    f1s = np.zeros(t_count, dtype=np.float32)
    for t in range(t_count):
        f0s[t], f1s[t] = lanes.compute_tweak_factors(t, index_range)
    f0c = jnp.asarray(f0s[c_t])[None, :, None]  # [1,C,1]
    f1c = jnp.asarray(f1s[c_t])[None, :, None]

    tweak_ep = [[], []]  # [epi][ch] -> [N,C,S]
    for ch in range(4):
        if is_rgb and ch == 3:
            e0 = jnp.full((n, c_count, s_count), 255, dtype=jnp.int32)
            e1 = e0
        else:
            b = base[ch][:, None, :]
            o = offset[ch][:, None, :]
            e0 = lanes.round_and_convert_to_int_nearest(
                lanes.clamp(b + o * f0c, 0.0, 255.0))
            e1 = lanes.round_and_convert_to_int_nearest(
                lanes.clamp(b + o * f1c, 0.0, 255.0))
        tweak_ep[0].append(e0)
        tweak_ep[1].append(e1)

    # static candidate validity: tweak t valid iff t < seeds[shape]
    cand_valid = (c_t[:, None] < seeds[None, :])  # [C,S]

    best = LexBest.empty((n, s_count), {f"ep{j}": () for j in range(8)})
    full255 = jnp.full((n, c_count, s_count), 255, dtype=jnp.int32)
    ep_state = [[tweak_ep[epi][ch] for ch in range(4)] for epi in range(2)]
    member_b = [jnp.asarray(masks[:, px][None, None, :]) for px in range(16)]
    fp_b = [[float_pixels[px][ch][:, None, None] for ch in range(4)]
            for px in range(16)]
    ip_b = [[pixels[px][ch][:, None, None] for ch in range(4)]
            for px in range(16)]
    pwp_b = [[pw_pixels[px][ch][:, None, None] for ch in range(4)]
             for px in range(16)]
    zero_ncs = jnp.zeros((n, c_count, s_count), dtype=jnp.float32)

    flat_order = np.argsort(base_rank_c, kind="stable")
    rank_sorted = jnp.asarray(base_rank_c[flat_order])

    for refine in range(num_refine_rounds):
        compressed = compress_endpoints(mode, ep_state, p0c, p1c, full255)
        selector = IndexSelector(cw, compressed, index_range, 4)
        refiner = (EndpointRefiner(zero_ncs, 4, index_range, cw)
                   if refine != num_refine_rounds - 1 else None)

        shape_error, _ = bc7_common.accumulate_error(
            selector, zero_ncs, member_b, fp_b, ip_b, cfg,
            with_refiner=refiner, pwps=pwp_b)

        if is_rgb:
            shape_error = shape_error + jnp.take(
                static_alpha_error_rgb, cols, axis=1)[:, None, :]

        # invalid candidates: tweak beyond seeds, or punchthrough-invalid
        invalid = jnp.asarray(~cand_valid)[None, :, :] | pti_c
        cand_error = jnp.where(invalid, INF, shape_error)

        # first-occurrence argmin in visitation-rank order over C
        cand_ord = cand_error[:, flat_order, :]
        win = lanes.first_argmin(cand_ord, 1)       # [N,S]
        min_err = jnp.take_along_axis(cand_ord, win[:, None, :],
                                      axis=1)[:, 0, :]
        win_rank = (jnp.take(rank_sorted, win) * num_refine_rounds
                    + refine).astype(jnp.int32)

        def gather_c(arr):
            return jnp.take_along_axis(arr[:, flat_order, :],
                                       win[:, None, :], axis=1)[:, 0, :]

        payload = {f"ep{epi * 4 + ch}": gather_c(compressed[epi][ch])
                   for epi in range(2) for ch in range(4)}
        best.update(min_err, win_rank, payload)

        if refiner is not None:
            r0, r1 = refiner.get_refined_endpoints_ldr(num_real_channels)
            for ch in range(num_real_channels):
                ep_state[0][ch] = r0[ch]
                ep_state[1][ch] = r1[ch]
    return best


def _single_plane_kernel_best(mode, n, pixels, base, offset, seeds,
                              parity_max, alpha_s, pti_arr, masks, cfg, cw,
                              num_refine_rounds, s_count, is_rgb):
    """Pallas TPU kernel path.

    Packs exactly the plan-valid (shape, tweak, parity) candidates into
    one K axis (the reference's per-shape seed pruning, BC67.cpp:1265-1279),
    runs bc7_kernel.single_plane_mode_best for the refine loop, then
    reduces per-candidate winners to per-shape winners with static
    gathers + the LexBest rule (ranks make merge order irrelevant)."""
    from . import bc7_kernel

    t_count = MAX_TWEAK_ROUNDS
    index_range = cfg["index_range"]

    # static packed candidate table, shape-major with UNIFORM per-shape
    # slot count (parity_max x the mode's max seed count rounded up to a
    # power of two): slot j of shape s is (p = j // t_pad, t = j % t_pad),
    # invalid when t >= seeds[s]. Power-of-two segments let the kernel's
    # butterfly winner reduce stay segment-local, so per-shape winners
    # come back on EVERY lane of the shape's segment and the graph never
    # compacts the candidate axis (no [N, S, c_max] relayout).
    t_max = max(1, min(int(seeds.max()) if s_count else 1, t_count))
    t_pad = 1 << (t_max - 1).bit_length()
    c_max = parity_max * t_pad          # power of two (parity_max is)
    k_real = s_count * c_max
    k_len = max(-(-k_real // 128) * 128, 128)
    pad = k_len - k_real
    ks = np.arange(k_real)
    s_of_k = np.concatenate([ks // c_max,
                             np.zeros(pad, np.int64)]).astype(np.int32)
    p_of_k = np.concatenate([(ks % c_max) // t_pad,
                             np.zeros(pad, np.int64)]).astype(np.int32)
    t_of_k = np.concatenate([ks % t_pad,
                             np.zeros(pad, np.int64)]).astype(np.int32)
    seeds_clamped = np.minimum(seeds.astype(np.int32), t_count)
    invalid_slot = np.concatenate([
        ks % t_pad >= seeds_clamped[ks // c_max],
        np.ones(pad, dtype=bool)])
    pad_mask = invalid_slot

    # tweak factors per candidate
    tweakf = np.zeros((2, k_len), dtype=np.float32)
    for t in range(t_count):
        ff0, ff1 = lanes.compute_tweak_factors(t, index_range)
        tweakf[0, t_of_k == t] = ff0
        tweakf[1, t_of_k == t] = ff1

    def expand_s(arr, fill):
        """[N, S] -> [N, k_len]: each shape's value replicated over its
        c_max consecutive slots. Pure broadcast + reshape (+ pad) — the
        former jnp.take expansion lowered to a serial gather
        (~1.4 ms/chunk at q50 in the op profile)."""
        rep = jnp.broadcast_to(arr[:, :, None], (n, s_count, c_max))
        rep = rep.reshape(n, k_real)
        if pad:
            rep = jnp.concatenate(
                [rep, jnp.full((n, pad), fill, rep.dtype)], axis=1)
        return rep

    base_k, offset_k = [], []
    for ch in range(4):
        if is_rgb and ch == 3:
            z = jnp.zeros((n, k_len), dtype=jnp.float32)
            base_k.append(z)
            offset_k.append(z)
        else:
            base_k.append(expand_s(base[ch], 0.0))
            offset_k.append(expand_s(offset[ch], 0.0))

    # per-candidate static alpha error; +inf encodes invalid (padding and
    # punchthrough-invalid parities) so the kernel needs no separate mask
    if alpha_s is None:
        alpha_k = jnp.zeros((n, k_len), dtype=jnp.float32)
    else:
        alpha_k = expand_s(alpha_s, 0.0)
    # parity pattern per shape segment: p repeats t_pad times
    pti_k = jnp.broadcast_to(
        pti_arr[:, None, :, None],
        (n, s_count, parity_max, t_pad)).reshape(n, k_real)
    if pad:
        pti_k = jnp.concatenate(
            [pti_k, jnp.zeros((n, pad), dtype=pti_k.dtype)], axis=1)
    alpha_k = jnp.where(pti_k | jnp.asarray(pad_mask)[None, :], INF,
                        alpha_k)

    consts = np.zeros((19, k_len), dtype=np.int32)
    consts[0] = p_of_k & 1
    consts[1] = (p_of_k >> 1) & 1
    for px in range(16):
        consts[2 + px] = masks[s_of_k, px]
    consts[18] = (p_of_k * t_count + t_of_k).astype(np.int32)

    pix_flat = jnp.stack(
        [pixels[px][ch] for px in range(16) for ch in range(4)], axis=-1)

    interpret = jax.default_backend() not in ("tpu", "axon")
    err, rank, pk0, pk1 = bc7_kernel.single_plane_mode_best(
        mode, pix_flat, base_k, offset_k, tweakf, alpha_k, consts, c_max,
        cfg, cw, num_refine_rounds, interpret=interpret)

    # The kernel's butterfly reduce leaves each shape's winner on EVERY
    # lane of its c_max-aligned segment, so the per-shape arrays stay in
    # the [N, K] candidate layout: downstream consumers read shape s at
    # static lane s*c_max (col_stride) and unpack the two 4x8-bit
    # endpoint words only on [N]-sized winners.
    return LexBest(err, rank, {"eppk0": pk0, "eppk1": pk1}), c_max


def try_single_plane(pixels, float_pixels, pw_pixels, channel_weights, flags,
                     plan: BC7EncodingPlan, num_refine_rounds: int,
                     alpha_info: dict):
    """TrySinglePlane (BC67.cpp:1042-1662). Returns a list of mode-winner
    candidate dicts for the final cross-mode merge."""
    num_refine_rounds = max(num_refine_rounds, 1)
    cw = [np.float32(w) for w in channel_weights]
    cw_sq = [w * w for w in cw]

    n = pixels[0][0].shape[0]
    has_alpha = alpha_info["has_non_max_alpha"]      # [N] bool
    allow_rgb = alpha_info["allow_rgb"]              # [N] bool
    is_punch_through = alpha_info["is_punch_through"]
    has_nonzero_alpha = alpha_info["has_non_zero_alpha"]

    fast_indexing = bool(flags & Flags.BC7_FAST_INDEXING)
    uniform = bool(flags & Flags.UNIFORM)
    try_single_color = bool(flags & Flags.BC7_TRY_SINGLE_COLOR)
    respect_punch_through = bool(flags & Flags.BC7_RESPECT_PUNCH_THROUGH)

    if _use_pallas_kernel():
        from . import bc7_kernel
        use_kernel = n % bc7_kernel.NB == 0
    else:
        use_kernel = False

    # --- Initial per-shape endpoints (BC67.cpp:1085-1144) ---
    rgb_ids = np.asarray(plan.rgb_shape_list, dtype=np.int32)
    rgba_ids = np.asarray(plan.rgba_shape_list, dtype=np.int32)

    if use_kernel:
        from . import bc7_kernel
        interp = jax.default_backend() not in ("tpu", "axon")
        pix_flat64 = jnp.stack(
            [pixels[px][ch] for px in range(16) for ch in range(4)],
            axis=-1)
        rgb_base, rgb_offset, static_alpha_error_rgb = bc7_kernel.shape_pca(
            pix_flat64, geom.shape_masks()[rgb_ids], 3, cw, uniform, True,
            interpret=interp)
        rgba4_base, rgba4_offset = bc7_kernel.shape_pca(
            pix_flat64, geom.shape_masks()[rgba_ids], 4, cw, uniform,
            False, interpret=interp)
    else:
        rgb_base, rgb_offset = _shape_pca(pw_pixels, rgb_ids, 3, cw)
        rgba4_base, rgba4_offset = _shape_pca(pw_pixels, rgba_ids, 4, cw)

    # RGBA endpoints: per lane, PCA4 when hasAlpha || !allowRGB, else
    # ExpandTo<4>(255) of the RGB line (BC67.cpp:1117-1143)
    use_pca4 = (has_alpha | ~allow_rgb)[:, None]
    rgb_col_of = np.full(243, -1, dtype=np.int32)
    rgb_col_of[rgb_ids] = np.arange(len(rgb_ids))
    rgba_from_rgb_cols = rgb_col_of[rgba_ids]
    # A shape can be in the RGBA list but not the RGB list (e.g. shape 0 at
    # quality<=5). The reference then expands an UNINITIALIZED RGB UFEP
    # (SinglePlaneTemporaries is stack garbage, BC67.cpp:803-812, expand at
    # :1142); under the zero-initialized oracle build this is a zero UFEP
    # (base=offset=0, alpha filled 255 by ExpandTo). Replicate that.
    missing = jnp.asarray((rgba_from_rgb_cols < 0)[None, :])
    safe_cols = np.maximum(rgba_from_rgb_cols, 0)
    rgba_base, rgba_offset = [], []
    for ch in range(4):
        if ch < 3:
            exp_b = jnp.take(rgb_base[ch], jnp.asarray(safe_cols), axis=1)
            exp_o = jnp.take(rgb_offset[ch], jnp.asarray(safe_cols), axis=1)
            exp_b = jnp.where(missing, np.float32(0.0), exp_b)
            exp_o = jnp.where(missing, np.float32(0.0), exp_o)
        else:
            exp_b = jnp.full((n, len(rgba_ids)), np.float32(255.0))
            exp_o = jnp.zeros((n, len(rgba_ids)), dtype=jnp.float32)
        rgba_base.append(jnp.where(use_pca4, rgba4_base[ch], exp_b))
        rgba_offset.append(jnp.where(use_pca4, rgba4_offset[ch], exp_o))

    # Static alpha error per RGB shape (BC67.cpp:1250-1263): sum over member
    # pixels of (255 - alpha)^2, then weighted finalize. Zero for opaque
    # lanes. (The kernel path computes this inside shape_pca.)
    if not use_kernel:
        masks_rgb = geom.shape_masks()[rgb_ids]  # [S,16]
        alpha_agg = jnp.zeros((n, len(rgb_ids)), dtype=jnp.int32)
        for px in range(16):
            d = 255 - pixels[px][3]
            term = (d * d)[:, None]
            m = jnp.asarray(masks_rgb[:, px][None, :])
            alpha_agg = alpha_agg + jnp.where(m, term, 0)
        if uniform:
            static_alpha_error_rgb = lanes.to_float(alpha_agg)
        else:
            static_alpha_error_rgb = lanes.to_float(alpha_agg) * cw_sq[3]

    mode_winners = []

    for mode_pos, mode in enumerate([0, 1, 2, 3, 6, 7]):
        info = MODE_INFO[mode]
        is_rgb = mode < 4
        num_subsets = info["num_subsets"]
        index_bits = info["index_bits"]
        index_range = 1 << index_bits
        num_real_channels = 3 if is_rgb else 4

        if info["pbit"] == "per_ep":
            parity_max = 4
        elif info["pbit"] == "per_subset":
            parity_max = 2
        else:
            parity_max = 1

        # Mode shape list (BC67.cpp:1202-1226), plan-filtered
        if num_subsets == 1:
            mode_shape_list = geom.SHAPE_LIST_1
        elif num_subsets == 2:
            mode_shape_list = geom.SHAPE_LIST_2
        elif (1 << info["partition_bits"]) == 16:
            mode_shape_list = geom.SHAPE_LIST_3_SHORT
        else:
            mode_shape_list = geom.SHAPE_LIST_3

        seeds_all = (plan.seed_points_for_shape_rgb if is_rgb
                     else plan.seed_points_for_shape_rgba)
        shape_ids = np.asarray([s for s in mode_shape_list
                                if seeds_all[s] > 0], dtype=np.int32)
        if mode == 6 and not plan.mode6_enabled:
            shape_ids = shape_ids[:0]
        if shape_ids.size == 0:
            continue
        seeds = np.asarray([min(seeds_all[s], MAX_TWEAK_ROUNDS)
                            for s in shape_ids], dtype=np.int32)

        s_count = len(shape_ids)
        masks = geom.shape_masks()[shape_ids]  # [S,16]

        # Per-shape unfinished endpoints for this mode's shape set
        if is_rgb:
            src_ids, src_base, src_offset = rgb_ids, rgb_base, rgb_offset
        else:
            src_ids, src_base, src_offset = rgba_ids, rgba_base, rgba_offset
        col_of = np.full(243, 0, dtype=np.int32)
        col_of[src_ids] = np.arange(len(src_ids))
        cols = jnp.asarray(col_of[shape_ids])
        base = [jnp.take(b, cols, axis=1) for b in src_base]
        offset = [jnp.take(o, cols, axis=1) for o in src_offset]

        # Candidate axis layout (grid path): all (tweak, parity)
        # combinations are ONE axis C of size T*P as the second-minor dim,
        # with shapes S minor: arrays are [N, C, S]. c = t*P + p. The
        # kernel path packs plan-valid candidates instead (see
        # _single_plane_kernel_best).
        t_count = MAX_TWEAK_ROUNDS
        c_count = t_count * parity_max
        c_t = np.arange(c_count) // parity_max   # tweak index per candidate
        c_p = np.arange(c_count) % parity_max    # parity index per candidate

        # punchthrough invalidations per parity (BC67.cpp:1281-1303)
        pti = []  # [P] of [N] bool
        for p_iter in range(parity_max):
            if respect_punch_through and mode in (6, 7):
                if p_iter == 0:
                    pti.append(is_punch_through & has_nonzero_alpha)
                elif p_iter == parity_max - 1:
                    pti.append(is_punch_through & has_alpha)
                else:
                    pti.append(is_punch_through)
            else:
                pti.append(jnp.zeros((n,), dtype=bool))
        pti_arr = jnp.stack(pti, axis=-1)  # [N,P]
        pti_c = jnp.take(pti_arr, jnp.asarray(c_p), axis=1)[:, :, None]

        p0c = jnp.asarray((c_p & 1).astype(np.int32))[:, None]        # [C,1]
        p1c = jnp.asarray(((c_p >> 1) & 1).astype(np.int32))[:, None]

        cfg = dict(fast_indexing=fast_indexing, uniform=uniform, cw_sq=cw_sq,
                   num_real_channels=num_real_channels,
                   index_range=index_range)

        def accumulate_error(selector, shape_like, members, fps, ips,
                             with_refiner=None, pwps=None, keep_indexes=False):
            return bc7_common.accumulate_error(
                selector, shape_like, members, fps, ips, cfg,
                with_refiner=with_refiner, pwps=pwps,
                keep_indexes=keep_indexes)

        # visitation rank (p-major, then tweak, then refine): rank_c = p*T+t
        base_rank_c = (c_p * t_count + c_t).astype(np.int32)  # [C]

        # --- candidate evaluation over C x refine rounds ---
        # The LexBest payload carries only the winning endpoints: the
        # winner's 16 pixel indexes are a pure function of (endpoints,
        # pixels, mode constants), so they are recomputed ONCE per subset
        # after partition combine on [N]-sized arrays instead of
        # materializing [N,S,16] index planes every refine round
        # (identical arithmetic; BC67.cpp:1346-1363).
        if use_kernel:
            alpha_s = (jnp.take(static_alpha_error_rgb, cols, axis=1)
                       if is_rgb else None)
            best, col_stride = _single_plane_kernel_best(
                mode, n, pixels, base, offset, seeds, parity_max, alpha_s,
                pti_arr, masks, cfg, cw, num_refine_rounds, s_count,
                is_rgb)
        else:
            best = _single_plane_grid_best(
                mode, n, float_pixels, pixels, pw_pixels, base, offset,
                seeds, c_t, c_p, pti_c, p0c, p1c, cw, cfg, base_rank_c,
                num_refine_rounds, s_count, c_count,
                static_alpha_error_rgb, cols, is_rgb, masks)
            col_stride = 1

        # --- TrySingleColor (BC67.cpp:1435-1569) ---
        if try_single_color:
            _try_single_color(mode, best, pixels, cw_sq, uniform, shape_ids,
                              masks, static_alpha_error_rgb, cols if is_rgb
                              else None, is_rgb, pti_arr, parity_max, n,
                              s_count, flags, col_stride)

        # --- Partition combine (BC67.cpp:1571-1660) ---
        winner = _combine_partitions(
            mode, mode_pos, best, shape_ids, plan, n, has_alpha, allow_rgb,
            col_stride)
        if winner is not None:
            # Recompute the winner's pixel indexes from its endpoints: one
            # [N]-sized selector pass per subset (<=3), replacing the
            # [N,S,16] per-round index payload (identical arithmetic).
            owner = winner.pop("owner")
            fp_n = [[float_pixels[px][ch] for ch in range(4)]
                    for px in range(16)]
            ip_n = [[pixels[px][ch] for ch in range(4)] for px in range(16)]
            ones_n = [jnp.ones((n,), dtype=bool)] * 16
            zero_n = jnp.zeros((n,), dtype=jnp.float32)
            idx_by_subset = []
            for subset in range(num_subsets):
                sub_ep = [[winner["ep"][subset][epi][ch] for ch in range(4)]
                          for epi in range(2)]
                sel = IndexSelector(cw, sub_ep, index_range, 4)
                _, sub_idx = accumulate_error(
                    sel, zero_n, ones_n, fp_n, ip_n, keep_indexes=True)
                idx_by_subset.append(sub_idx)
            indexes = []
            for px in range(16):
                if num_subsets == 1:
                    indexes.append(idx_by_subset[0][px])
                else:
                    stack = jnp.stack([idx_by_subset[s][px]
                                       for s in range(num_subsets)], axis=-1)
                    indexes.append(_gather_last(stack, owner[px]))
            winner["indexes"] = indexes
            mode_winners.append(winner)

    return mode_winners


def _try_single_color(mode, best, pixels, cw_sq, uniform, shape_ids, masks,
                      static_alpha_error_rgb, rgb_cols, is_rgb, pti_arr,
                      parity_max, n, s_count, flags, col_stride=1):
    """TrySingleColorRGBAMultiTable per shape (BC67.cpp:940-1040).

    col_stride > 1 (the kernel path) means `best` carries per-shape
    values replicated over col_stride-lane segments; the candidate is
    evaluated on the same width so the update stays elementwise.

    NOTE: replicates the reference's average computation quirk: the average
    uses pixels[pxi] (the first shapeLength pixels), not the shape's pixels
    (BC67.cpp:1448-1451).
    """
    num_real_channels = 3 if is_rgb else 4

    w_cols = best.error.shape[1]
    if col_stride == 1:
        masks_w = masks
    else:
        masks_w = np.zeros((w_cols, 16), dtype=bool)
        masks_w[:s_count * col_stride] = np.repeat(masks, col_stride,
                                                   axis=0)
    masks = masks_w
    s_count = w_cols

    # The reference's table-selection loop NEVER commits a candidate: the
    # update gate is `better = AndNot(pti, better)` (BC67.cpp:1002-1003),
    # and AndNot(a, b) computes a & ~b in both builds (ParallelMath.h:901
    # SSE2 via _mm_andnot_si128(b, a), :1648 scalar `a && !b`) -- the
    # arguments are swapped at this one call site, so the gate is
    # pti & ~(avgError < FLT_MAX) == false for every table. The effective
    # single-color candidate is therefore always the INITIAL state: black
    # endpoints/reconstruction with alpha 255 and index 0 (BC67.cpp:951-961).
    # The BC7SC tables (regenerated in tables/bc7_single_color.py and
    # regression-tested) are dead weight at runtime as a result.
    index = jnp.zeros((n, s_count), dtype=jnp.int32)
    eps = [[jnp.zeros((n, s_count), dtype=jnp.int32) if ch < 3 else
            jnp.full((n, s_count), 255, dtype=jnp.int32) for ch in range(4)]
           for _ in range(2)]
    recon = [jnp.zeros((n, s_count), dtype=jnp.int32) if ch < 3 else
             jnp.full((n, s_count), 255, dtype=jnp.int32) for ch in range(4)]

    agg = [jnp.zeros((n, s_count), dtype=jnp.int32) for _ in range(4)]
    for px in range(16):
        m = jnp.asarray(masks[:, px][None, :])
        for ch in range(num_real_channels):
            agg[ch] = agg[ch] + jnp.where(
                m, lanes.sq_diff_int(recon[ch], pixels[px][ch][:, None]), 0)
    if uniform:
        tot = agg[0]
        for e in agg[1:]:
            tot = tot + e
        error = lanes.to_float(tot)
    else:
        error = lanes.to_float(agg[0]) * cw_sq[0]
        for ch in range(1, 4):
            error = error + lanes.to_float(agg[ch]) * cw_sq[ch]

    if is_rgb:
        al = jnp.take(static_alpha_error_rgb, rgb_cols, axis=1)
        if col_stride > 1:
            al = jnp.broadcast_to(
                al[:, :, None],
                (n, al.shape[1], col_stride)).reshape(n, -1)
            if al.shape[1] < s_count:
                al = jnp.concatenate(
                    [al, jnp.zeros((n, s_count - al.shape[1]), al.dtype)],
                    axis=1)
        error = error + al

    # single-color candidates come after all tweak/parity candidates.
    # No index payload: black ep0==ep1 endpoints make the post-combine
    # index recompute a degenerate axis (len_sq==0 -> axis 0 -> index 0,
    # and +-1 retests reconstruct the same color), reproducing the
    # reference's index 0 (BC67.cpp:951-961).
    if "eppk0" in best.payload:
        # kernel path carries packed endpoint words
        payload = {}
        for epi in range(2):
            pk = eps[epi][0]
            for ch in range(1, 4):
                pk = pk | (eps[epi][ch] << (8 * ch))
            payload[f"eppk{epi}"] = pk
    else:
        payload = {f"ep{epi * 4 + ch}": eps[epi][ch]
                   for epi in range(2) for ch in range(4)}
    rank = jnp.full((n, s_count), BIG_RANK - 1, dtype=jnp.int32)
    best.update(error, rank, payload)


def _combine_partitions(mode, mode_pos, best, shape_ids, plan, n, has_alpha,
                        allow_rgb, col_stride=1):
    """Per-partition error combine + winner materialization
    (BC67.cpp:1571-1660). col_stride > 1 means `best` carries per-shape
    values replicated over col_stride-lane segments (the kernel path);
    shape s is read at static column s * col_stride."""
    info = MODE_INFO[mode]
    num_subsets = info["num_subsets"]
    num_partitions = 1 << info["partition_bits"]
    is_rgb = mode < 4

    col_of = np.full(243, -1, dtype=np.int32)
    col_of[shape_ids] = np.arange(len(shape_ids)) * col_stride

    if mode in (0, 1, 2, 3):
        enabled_bits = [plan.mode0_partition_enabled,
                        plan.mode1_partition_enabled,
                        plan.mode2_partition_enabled,
                        plan.mode3_partition_enabled][mode]
    elif mode == 6:
        enabled_bits = 1 if plan.mode6_enabled else 0
    else:
        # mode 7: the reference's combine loop iterates ALL partitions due to
        # assigning the wrong variable (BC67.cpp:1590-1597 writes
        # partitionEnabledBits, not partitionsEnabledBits) — replicated.
        enabled_bits = (1 << num_partitions) - 1

    parts = [p for p in range(num_partitions) if (enabled_bits >> p) & 1]
    # keep only partitions whose shapes were all evaluated
    def shapes_of(p):
        if num_subsets == 1:
            return [0]
        if num_subsets == 2:
            return [int(geom.SHAPES_2[p][k]) for k in range(2)]
        return [int(geom.SHAPES_3[p][k]) for k in range(3)]

    parts = [p for p in parts
             if all(col_of[s] >= 0 for s in shapes_of(p))]
    if not parts:
        return None

    totals = []
    for p in parts:
        cols = [col_of[s] for s in shapes_of(p)]
        tot = best.error[:, cols[0]]
        for c in cols[1:]:
            tot = tot + best.error[:, c]
        totals.append(tot)
    total_error = jnp.stack(totals, axis=-1)  # [N, parts]

    # per-lane validity (scalar-build semantics)
    valid = jnp.ones((n, len(parts)), dtype=bool)
    if is_rgb:
        valid = valid & allow_rgb[:, None]
    if mode == 7:
        # In the scalar build the in-loop RGB-partition filter
        # (BC67.cpp:1625-1635) is a no-op: it is guarded by anyBlockHasAlpha,
        # which per-lane equals blockHasNonMaxAlpha, so the mask it applies is
        # always true. The only per-lane gate is whether mode 7 ran at all:
        # allowMode7 = hasAlpha || mode7RGBPartitionEnabled != 0.
        if plan.mode7_rgb_partition_enabled == 0:
            valid = valid & has_alpha[:, None]

    cand = jnp.where(valid, total_error, INF)
    err, win = _ordered_argmin(cand)
    win_part = _lut(np.asarray(parts, dtype=np.int32), win)

    # materialize winner payload
    ep = [[[jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]
           for _ in range(2)] for _ in range(3)]
    if num_subsets == 1:
        col = jnp.full((n,), col_of[0], dtype=jnp.int32)
        cols_per_subset = [col]
    else:
        table = np.asarray([[col_of[s] for s in shapes_of(p)] for p in parts],
                           dtype=np.int32)  # [parts, subsets]
        cols_per_subset = [_lut(table[:, k], win)
                           for k in range(num_subsets)]

    for subset in range(num_subsets):
        c = cols_per_subset[subset]
        if "eppk0" in best.payload:
            # kernel path: two packed words per winner, unpacked on [N]
            for epi in range(2):
                pk = _gather_cols(best.payload[f"eppk{epi}"], c)
                for ch in range(4):
                    ep[subset][epi][ch] = (pk >> (8 * ch)) & 0xFF
        else:
            for epi in range(2):
                for ch in range(4):
                    ep[subset][epi][ch] = _gather_cols(
                        best.payload[f"ep{epi * 4 + ch}"], c)

    # indexes: gather from the owning subset's shape per pixel
    if num_subsets == 1:
        owner = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(16)]
    elif num_subsets == 2:
        pmap = _lut(geom.PARTITION_MAP_2.astype(np.int32), win_part)
        owner = [(pmap >> px) & 1 for px in range(16)]
    else:
        pmap = _lut(geom.PARTITION_MAP_3.astype(np.int64), win_part)
        owner = [((pmap >> (2 * px)) & 3).astype(jnp.int32)
                 for px in range(16)]

    rank = mode_pos * 64 + win_part
    return dict(mode=mode, error=err, rank=rank, partition=win_part, ep=ep,
                owner=owner)


# --- Dual-plane search (modes 4/5) -------------------------------------------

def _dual_plane_combos(plan: BC7EncodingPlan):
    """Plan-valid (mode, rotation, index-selector) combos in the
    reference's visitation (sequence) order (BC67.cpp:1664-1758)."""
    combos = []
    seq = 0
    for mode in (4, 5):
        for rotation in range(4):
            num_sp = (list(plan.mode4_sp[rotation]) if mode == 4
                      else [plan.mode5_sp[rotation]] * 2)
            if num_sp[0] == 0 and num_sp[1] == 0:
                seq += (2 if mode == 4 else 1)
                continue
            max_isel = 2 if mode == 4 else 1
            for isel in range(max_isel):
                this_seq = seq
                seq += 1
                if num_sp[isel] <= 0:
                    continue
                combos.append(dict(mode=mode, rot=rotation, isel=isel,
                                   num_tweak=min(num_sp[isel],
                                                 MAX_TWEAK_ROUNDS),
                                   seq=this_seq))
    return combos


def _dual_plane_kernel_candidates(pixels, channel_weights, flags,
                                  plan: BC7EncodingPlan,
                                  num_refine_rounds: int, n: int):
    """Dual-plane search via the Pallas kernel (bc7_kernel.dual_plane_best);
    per-combo winner selection happens here on [N, Q] arrays."""
    from . import bc7_kernel

    cw = [np.float32(w) for w in channel_weights]
    fast_indexing = bool(flags & Flags.BC7_FAST_INDEXING)
    uniform = bool(flags & Flags.UNIFORM)
    t_cap = MAX_TWEAK_ROUNDS

    combos = _dual_plane_combos(plan)
    if not combos:
        return []

    pix_flat = jnp.stack([pixels[px][ch] for px in range(16)
                          for ch in range(4)], axis=-1)
    interp = jax.default_backend() not in ("tpu", "axon")
    out = bc7_kernel.dual_plane_best(pix_flat, combos, cw,
                                     num_refine_rounds, uniform,
                                     fast_indexing, interpret=interp)
    kl = out["k_len"]
    q_count = len(combos)

    def grp(arr):
        return arr[:, :q_count * t_cap].reshape(n, q_count, t_cap)

    def reduce4(err_k, rank_k, payload_arrs):
        """Per-combo (error, rank) lex winner over the 4 tweak lanes;
        the winner lane is unique because ranks differ per lane."""
        e = grp(err_k)
        r = grp(rank_k)
        m = jnp.min(e, axis=-1)
        rm = jnp.min(jnp.where(e == m[..., None], r, BIG_RANK), axis=-1)
        sel = (e == m[..., None]) & (r == rm[..., None])
        outs = []
        for arr in payload_arrs:
            g = grp(arr)
            v = g[..., 0]
            for j in range(1, t_cap):
                v = jnp.where(sel[..., j], g[..., j], v)
            outs.append(v)
        return m, outs

    rgb_eps = [out["rgb_ep"][:, i * kl:(i + 1) * kl] for i in range(6)]
    rgb_idxs = [out["rgb_idx"][:, i * kl:(i + 1) * kl] for i in range(16)]
    a_eps = [out["a_ep"][:, i * kl:(i + 1) * kl] for i in range(2)]
    a_idxs = [out["a_idx"][:, i * kl:(i + 1) * kl] for i in range(16)]

    rgb_err_q, rgb_pl = reduce4(out["rgb_err"], out["rgb_rank"],
                                rgb_eps + rgb_idxs)
    a_err_q, a_pl = reduce4(out["a_err"], out["a_rank"], a_eps + a_idxs)

    candidates = []
    for q, cb in enumerate(combos):
        combined = rgb_err_q[:, q] + a_err_q[:, q]
        ep = [[[jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]
               for _ in range(2)] for _ in range(3)]
        for epi in range(2):
            for ch in range(3):
                ep[0][epi][ch] = rgb_pl[epi * 3 + ch][:, q]
            ep[0][epi][3] = a_pl[epi][:, q]
        rgb_indexes = [rgb_pl[6 + px][:, q] for px in range(16)]
        alpha_indexes = [a_pl[2 + px][:, q] for px in range(16)]
        if cb["isel"]:
            indexes, indexes2 = alpha_indexes, rgb_indexes
        else:
            indexes, indexes2 = rgb_indexes, alpha_indexes
        candidates.append(dict(
            mode=cb["mode"], error=combined, rank=8 * 64 + cb["seq"],
            partition=None, ep=ep, indexes=indexes, indexes2=indexes2,
            rotation=cb["rot"], isel=cb["isel"]))
    return candidates


def try_dual_plane(pixels, float_pixels, channel_weights, flags,
                   plan: BC7EncodingPlan, num_refine_rounds: int):
    """TryDualPlane (BC67.cpp:1664-1965). Returns candidate dicts.

    Batched over the tweak axis; the per-rotation PCA is hoisted and shared
    across modes and index-selector values (the reference recomputes it with
    identical inputs per combination)."""
    num_refine_rounds = max(num_refine_rounds, 1)

    n = pixels[0][0].shape[0]
    if _use_pallas_kernel() and n % 8 == 0:
        return _dual_plane_kernel_candidates(
            pixels, channel_weights, flags, plan, num_refine_rounds, n)
    cw = [np.float32(w) for w in channel_weights]
    cw_sq = [w * w for w in cw]
    fast_indexing = bool(flags & Flags.BC7_FAST_INDEXING)
    uniform = bool(flags & Flags.UNIFORM)

    n = pixels[0][0].shape[0]
    t_count = MAX_TWEAK_ROUNDS
    candidates = []
    seq = 0

    # hoisted per-rotation data
    rot_cache = {}
    for rotation in range(4):
        alpha_ch = (rotation + 3) & 3
        rgb_chs = (3 if rotation == 1 else 0, 3 if rotation == 2 else 1,
                   3 if rotation == 3 else 2)
        rot_rgb = [[pixels[px][c] for c in rgb_chs] for px in range(16)]
        rot_frgb = [[float_pixels[px][c] for c in rgb_chs]
                    for px in range(16)]
        rot_cw = [cw[c] for c in rgb_chs]
        rot_cw_sq = [cw_sq[c] for c in rgb_chs]
        pw_rot = [[rot_frgb[px][ch] * rot_cw[ch] for ch in range(3)]
                  for px in range(16)]

        ones = [jnp.ones((n,), dtype=jnp.float32)] * 16
        cen, dirn, mn_d, mx_d = pca.endpoint_selector(pw_rot, ones, 3)
        base, offset = pca.get_endpoints(cen, dirn, mn_d, mx_d, rot_cw, 3)

        alpha_min = pixels[0][alpha_ch]
        alpha_max = pixels[0][alpha_ch]
        for px in range(1, 16):
            alpha_min = jnp.minimum(pixels[px][alpha_ch], alpha_min)
            alpha_max = jnp.maximum(pixels[px][alpha_ch], alpha_max)

        rot_cache[rotation] = dict(
            alpha_ch=alpha_ch, rot_rgb=rot_rgb, rot_frgb=rot_frgb,
            rot_cw=rot_cw, rot_cw_sq=rot_cw_sq, pw_rot=pw_rot,
            base=base, offset=offset, alpha_min=alpha_min,
            alpha_max=alpha_max)

    for mode in (4, 5):
        for rotation in range(4):
            rc = rot_cache[rotation]
            alpha_ch = rc["alpha_ch"]
            if mode == 4:
                num_sp = list(plan.mode4_sp[rotation])
            else:
                num_sp = [plan.mode5_sp[rotation]] * 2

            if num_sp[0] == 0 and num_sp[1] == 0:
                seq += (2 if mode == 4 else 1)
                continue

            max_isel = 2 if mode == 4 else 1
            for index_selector in range(max_isel):
                num_tweak = num_sp[index_selector]
                this_seq = seq
                seq += 1
                if num_tweak <= 0:
                    continue
                num_tweak = min(num_tweak, MAX_TWEAK_ROUNDS)

                if mode == 4:
                    rgb_prec = 3 if index_selector else 2
                    alpha_prec = 2 if index_selector else 3
                else:
                    rgb_prec = alpha_prec = 2
                rgb_range = 1 << rgb_prec
                alpha_range = 1 << alpha_prec

                # tweak-axis initial endpoints [N, T]
                rf0 = np.zeros(t_count, dtype=np.float32)
                rf1 = np.zeros(t_count, dtype=np.float32)
                af0 = np.zeros(t_count, dtype=np.float32)
                af1 = np.zeros(t_count, dtype=np.float32)
                for t in range(t_count):
                    rf0[t], rf1[t] = lanes.compute_tweak_factors(t, rgb_range)
                    af0[t], af1[t] = lanes.compute_tweak_factors(t,
                                                                 alpha_range)
                rgb_ep = [[], []]
                for ch in range(3):
                    b = rc["base"][ch][:, None]
                    o = rc["offset"][ch][:, None]
                    rgb_ep[0].append(lanes.round_and_convert_to_int_nearest(
                        lanes.clamp(b + o * jnp.asarray(rf0), 0.0, 255.0)))
                    rgb_ep[1].append(lanes.round_and_convert_to_int_nearest(
                        lanes.clamp(b + o * jnp.asarray(rf1), 0.0, 255.0)))
                a_base = lanes.to_float(rc["alpha_min"])[:, None]
                a_offs = lanes.to_float(rc["alpha_max"])[:, None] - a_base
                alpha_ep = [
                    lanes.round_and_convert_to_int_nearest(
                        lanes.clamp(a_base + a_offs * jnp.asarray(af0),
                                    0.0, 255.0)),
                    lanes.round_and_convert_to_int_nearest(
                        lanes.clamp(a_base + a_offs * jnp.asarray(af1),
                                    0.0, 255.0)),
                ]

                tweak_valid = jnp.asarray(
                    np.arange(t_count) < num_tweak)[None, :]

                rgb_best = LexBest.empty((n,), {"ep": (2, 3), "idx": (16,)})
                alpha_best = LexBest.empty((n,), {"ep": (2,), "idx": (16,)})

                fp_alpha = [float_pixels[px][alpha_ch][:, None]
                            for px in range(16)]
                frgb_b = [[rc["rot_frgb"][px][ch][:, None] for ch in range(3)]
                          for px in range(16)]
                irgb_b = [[rc["rot_rgb"][px][ch][:, None] for ch in range(3)]
                          for px in range(16)]
                ia_b = [pixels[px][alpha_ch][:, None] for px in range(16)]
                pw_b = [[rc["pw_rot"][px][ch][:, None] for ch in range(3)]
                        for px in range(16)]

                for refine in range(num_refine_rounds):
                    # CompressEndpoints4/5 (BC67.cpp:908-923)
                    if mode == 4:
                        rgb_ep = [_unquantize(_quantize(e, 5, 3), 5, 3)
                                  for e in rgb_ep]
                        alpha_ep = [
                            _unquantize(_quantize([a], 6, 1), 6, 1)[0]
                            for a in alpha_ep]
                    else:
                        rgb_ep = [_unquantize(_quantize(e, 7, 3), 7, 3)
                                  for e in rgb_ep]

                    rgb_sel = IndexSelector(rc["rot_cw"], rgb_ep, rgb_range,
                                            3)
                    a_sel = IndexSelector([1.0], [[alpha_ep[0]],
                                                  [alpha_ep[1]]],
                                          alpha_range, 1)
                    zero_nt = jnp.zeros((n, t_count), dtype=jnp.float32)
                    rgb_refiner = EndpointRefiner(zero_nt, 3, rgb_range,
                                                  rc["rot_cw"])
                    a_refiner = EndpointRefiner(zero_nt, 1, alpha_range,
                                                [1.0])

                    error_rgb = zero_nt
                    error_a = zero_nt
                    agg_rgb = [jnp.zeros((n, t_count), dtype=jnp.int32)
                               for _ in range(3)]
                    agg_a = jnp.zeros((n, t_count), dtype=jnp.int32)

                    rgb_idx, a_idx = [], []
                    for px in range(16):
                        ri = rgb_sel.select_index_ldr(frgb_b[px])
                        ai = a_sel.select_index_ldr([fp_alpha[px]])

                        if fast_indexing:
                            rr = rgb_sel.reconstruct_ldr_bc7(ri)
                            ra = a_sel.reconstruct_ldr_bc7(ai)[0]
                            for ch in range(3):
                                agg_rgb[ch] = agg_rgb[ch] + \
                                    lanes.sq_diff_int(rr[ch], irgb_b[px][ch])
                            agg_a = agg_a + lanes.sq_diff_int(ra, ia_b[px])
                        else:
                            def rgb_err(iv, px=px):
                                rr = rgb_sel.reconstruct_ldr_bc7(iv)
                                errs = [lanes.sq_diff_int(rr[c],
                                                          irgb_b[px][c])
                                        for c in range(3)]
                                if uniform:
                                    t = errs[0] + errs[1]
                                    t = t + errs[2]
                                    return lanes.to_float(t)
                                t = lanes.to_float(errs[0]) \
                                    * rc["rot_cw_sq"][0]
                                for c in range(1, 3):
                                    t = t + lanes.to_float(errs[c]) \
                                        * rc["rot_cw_sq"][c]
                                return t

                            def a_err(iv, px=px):
                                ra = a_sel.reconstruct_ldr_bc7(iv)[0]
                                e = lanes.sq_diff_int(ra, ia_b[px])
                                if uniform:
                                    return lanes.to_float(e)
                                return lanes.to_float(e) * cw_sq[alpha_ch]

                            re = rgb_err(ri)
                            ae = a_err(ai)
                            r_alt = (jnp.maximum(ri, 1) - 1,
                                     jnp.minimum(ri + 1, rgb_range - 1))
                            a_alt = (jnp.maximum(ai, 1) - 1,
                                     jnp.minimum(ai + 1, alpha_range - 1))
                            for ii in range(2):
                                are = rgb_err(r_alt[ii])
                                aae = a_err(a_alt[ii])
                                rb = are < re
                                ab = aae < ae
                                re = jnp.minimum(are, re)
                                ae = jnp.minimum(aae, ae)
                                ri = jnp.where(rb, r_alt[ii], ri)
                                ai = jnp.where(ab, a_alt[ii], ai)
                            error_rgb = error_rgb + re
                            error_a = error_a + ae

                        if refine != num_refine_rounds - 1:
                            rgb_refiner.contribute_unweighted_pw(pw_b[px], ri)
                            a_refiner.contribute_unweighted_pw([fp_alpha[px]],
                                                               ai)
                        rgb_idx.append(ri)
                        a_idx.append(ai)

                    if fast_indexing:
                        if uniform:
                            t = agg_rgb[0] + agg_rgb[1]
                            t = t + agg_rgb[2]
                            error_rgb = lanes.to_float(t)
                            error_a = lanes.to_float(agg_a)
                        else:
                            error_rgb = lanes.to_float(agg_rgb[0]) \
                                * rc["rot_cw_sq"][0]
                            for c in range(1, 3):
                                error_rgb = error_rgb + lanes.to_float(
                                    agg_rgb[c]) * rc["rot_cw_sq"][c]
                            error_a = lanes.to_float(agg_a) * cw_sq[alpha_ch]

                    # reduce over the tweak axis (rank = t*R + refine)
                    rank_row = jnp.asarray(
                        (np.arange(t_count) * num_refine_rounds
                         + refine).astype(np.int32))[None, :]
                    for best_obj, err, eps_list, idxs in (
                        (rgb_best, error_rgb, rgb_ep, rgb_idx),
                        (alpha_best, error_a, alpha_ep, a_idx),
                    ):
                        cand_err = jnp.where(tweak_valid, err, INF)
                        win_err, win = _ordered_argmin(cand_err)
                        win_rank = _gather_last(
                            jnp.broadcast_to(rank_row, cand_err.shape), win)
                        if best_obj is rgb_best:
                            payload = {
                                "ep": jnp.stack(
                                    [jnp.stack([_gather_last(eps_list[e][c],
                                                             win)
                                                for c in range(3)], axis=-1)
                                     for e in range(2)], axis=-2),
                                "idx": jnp.stack(
                                    [_gather_last(idxs[px], win)
                                     for px in range(16)], axis=-1)}
                        else:
                            payload = {
                                "ep": jnp.stack(
                                    [_gather_last(eps_list[e], win)
                                     for e in range(2)], axis=-1),
                                "idx": jnp.stack(
                                    [_gather_last(idxs[px], win)
                                     for px in range(16)], axis=-1)}
                        best_obj.update(win_err, win_rank, payload)

                    if refine != num_refine_rounds - 1:
                        r0, r1 = rgb_refiner.get_refined_endpoints_ldr()
                        rgb_ep = [list(r0), list(r1)]
                        aa0, aa1 = a_refiner.get_refined_endpoints_ldr()
                        alpha_ep = [aa0[0], aa1[0]]

                combined = rgb_best.error + alpha_best.error

                ep = [[[jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]
                       for _ in range(2)] for _ in range(3)]
                for epi in range(2):
                    for ch in range(3):
                        ep[0][epi][ch] = rgb_best.payload["ep"][:, epi, ch]
                    ep[0][epi][3] = alpha_best.payload["ep"][:, epi]

                rgb_indexes = [rgb_best.payload["idx"][:, px]
                               for px in range(16)]
                alpha_indexes = [alpha_best.payload["idx"][:, px]
                                 for px in range(16)]
                # work.m_indexes gets alpha when indexSelector else RGB
                # (BC67.cpp:1950-1954)
                if index_selector:
                    indexes, indexes2 = alpha_indexes, rgb_indexes
                else:
                    indexes, indexes2 = rgb_indexes, alpha_indexes

                candidates.append(dict(
                    mode=mode, error=combined,
                    rank=8 * 64 + this_seq, partition=None, ep=ep,
                    indexes=indexes, indexes2=indexes2,
                    rotation=rotation, isel=index_selector))

    return candidates


# --- Top level ----------------------------------------------------------------

def pack(pixels_u8, flags: int, channel_weights, plan: BC7EncodingPlan,
         num_refine_rounds: int):
    """BC7Computer::Pack (BC67.cpp:1975-2204). Returns uint8 [N, 16]."""
    p = jnp.asarray(pixels_u8, dtype=jnp.int32)
    n = p.shape[0]

    pixels = [[p[:, px, ch] for ch in range(4)] for px in range(16)]
    float_pixels = [[lanes.to_float(c) for c in row] for row in pixels]
    cw = [np.float32(w) for w in channel_weights]
    pw_pixels = [[float_pixels[px][ch] * cw[ch] for ch in range(4)]
                 for px in range(16)]

    # alpha classification (BC67.cpp:1054-1078), per lane (scalar semantics)
    max_alpha = pixels[0][3]
    min_alpha = pixels[0][3]
    is_pt = (pixels[0][3] == 0) | (pixels[0][3] == 255)
    for px in range(1, 16):
        a = pixels[px][3]
        max_alpha = jnp.maximum(max_alpha, a)
        min_alpha = jnp.minimum(min_alpha, a)
        is_pt = is_pt & ((a == 0) | (a == 255))
    alpha_info = dict(
        has_non_max_alpha=min_alpha < 255,
        has_non_zero_alpha=max_alpha > 0,
        allow_rgb=min_alpha > 250,
        is_punch_through=is_pt,
    )

    sp = try_single_plane(pixels, float_pixels, pw_pixels, channel_weights,
                          flags, plan, num_refine_rounds, alpha_info)
    dp = try_dual_plane(pixels, float_pixels, channel_weights, flags, plan,
                        num_refine_rounds)

    # merge all candidates lexicographically (= the reference's sequential
    # strict-improvement update over TrySinglePlane then TryDualPlane)
    zero = jnp.zeros((n,), dtype=jnp.int32)
    work = dict(
        error=jnp.full((n,), lanes.FLT_MAX, dtype=jnp.float32),
        rank=jnp.full((n,), BIG_RANK, dtype=jnp.int32),
        mode=zero, partition=zero, rotation=zero, isel=zero,
        ep=[[[zero for _ in range(4)] for _ in range(2)] for _ in range(3)],
        indexes=[zero] * 16, indexes2=[zero] * 16,
    )

    for cand in sp + dp:
        rank = cand["rank"] if isinstance(cand["rank"], jnp.ndarray) \
            else jnp.full((n,), cand["rank"], dtype=jnp.int32)
        better = (cand["error"] < work["error"]) | (
            (cand["error"] == work["error"]) & (rank < work["rank"]))
        work["error"] = jnp.where(better, cand["error"], work["error"])
        work["rank"] = jnp.where(better, rank, work["rank"])
        work["mode"] = jnp.where(better, cand["mode"], work["mode"])
        if cand.get("partition") is not None:
            work["partition"] = jnp.where(better, cand["partition"],
                                          work["partition"])
            # reference: m_partition and m_isr share a union; dual-plane
            # writes rotation/isel into the same storage
        if "rotation" in cand:
            work["isel"] = jnp.where(better, cand["isel"], work["isel"])
            work["rotation"] = jnp.where(better, cand["rotation"],
                                         work["rotation"])
            work["partition"] = jnp.where(better, 0, work["partition"])
        else:
            work["isel"] = jnp.where(better, 0, work["isel"])
            work["rotation"] = jnp.where(better, 0, work["rotation"])
        for s in range(3):
            for e in range(2):
                for ch in range(4):
                    src = cand["ep"][s][e][ch]
                    work["ep"][s][e][ch] = jnp.where(better, src,
                                                     work["ep"][s][e][ch])
        for px in range(16):
            work["indexes"][px] = jnp.where(better, cand["indexes"][px],
                                            work["indexes"][px])
            i2 = cand.get("indexes2")
            if i2 is not None:
                work["indexes2"][px] = jnp.where(better, i2[px],
                                                 work["indexes2"][px])

    return _pack_bits(work, n)


# --- Bit packing (BC67.cpp:2003-2203) -----------------------------------------

def _pack_var(words, value, offset, bits: int):
    """Append `value` (bits wide) at variable bit `offset` into 4 i32 words."""
    for j in range(4):
        sh = offset - 32 * j
        in_lo = (sh >= 0) & (sh < 32)
        in_hi = (sh < 0) & (sh > -bits)
        lo = jnp.where(in_lo, value << jnp.clip(sh, 0, 31), 0)
        hi = jnp.where(in_hi, value >> jnp.clip(-sh, 0, 31), 0)
        words[j] = words[j] | lo | hi
    return words


def _pack_mode_bits(mode: int, work, n):
    """Pack all blocks under `mode`'s layout; returns 4 [N] i32 words."""
    info = MODE_INFO[mode]
    num_subsets = info["num_subsets"]
    ib = info["index_bits"]
    aib = info["alpha_index_bits"]
    separate = info["alpha"] == "separate"
    combined = info["alpha"] == "combined"

    partition = work["partition"]
    indexes = list(work["indexes"])
    indexes2 = list(work["indexes2"])
    # endpoints as [subset][ep][ch] copies
    ep = [[[work["ep"][s][e][ch] for ch in range(4)] for e in range(2)]
          for s in range(3)]

    if separate:
        flip_rgb = (indexes[0] & (1 << (ib - 1))) != 0
        flip_alpha = (indexes2[0] & (1 << (aib - 1))) != 0
        hi_rgb = (1 << ib) - 1
        hi_a = (1 << aib) - 1
        indexes = [jnp.where(flip_rgb, hi_rgb - v, v) for v in indexes]
        indexes2 = [jnp.where(flip_alpha, hi_a - v, v) for v in indexes2]
        if info["has_index_selector"]:
            isel = work["isel"] != 0
            flip_rgb, flip_alpha = (
                jnp.where(isel, flip_alpha, flip_rgb),
                jnp.where(isel, flip_rgb, flip_alpha))
        for ch in range(3):
            a, b = ep[0][0][ch], ep[0][1][ch]
            ep[0][0][ch] = jnp.where(flip_rgb, b, a)
            ep[0][1][ch] = jnp.where(flip_rgb, a, b)
        a, b = ep[0][0][3], ep[0][1][3]
        ep[0][0][3] = jnp.where(flip_alpha, b, a)
        ep[0][1][3] = jnp.where(flip_alpha, a, b)
        fix1 = jnp.zeros((n,), dtype=jnp.int32)
        fix2 = jnp.zeros((n,), dtype=jnp.int32)
    else:
        if num_subsets == 2:
            fix1 = _lut(geom.FIXUP_INDEXES_2, partition)
            fix2 = jnp.zeros((n,), dtype=jnp.int32)
        elif num_subsets == 3:
            fix1 = _lut(geom.FIXUP_INDEXES_3[:, 0], partition)
            fix2 = _lut(geom.FIXUP_INDEXES_3[:, 1], partition)
        else:
            fix1 = jnp.zeros((n,), dtype=jnp.int32)
            fix2 = jnp.zeros((n,), dtype=jnp.int32)

        # owner subset per pixel
        if num_subsets == 2:
            pmap = _lut(geom.PARTITION_MAP_2.astype(np.int32), partition)
            owner = [(pmap >> px) & 1 for px in range(16)]
        elif num_subsets == 3:
            pmap = _lut(geom.PARTITION_MAP_3, partition)
            owner = [((pmap >> (2 * px)) & 3).astype(jnp.int32)
                     for px in range(16)]
        else:
            owner = [jnp.zeros((n,), dtype=jnp.int32)] * 16

        hi_idx = (1 << ib) - 1
        fixups = [jnp.zeros((n,), dtype=jnp.int32), fix1, fix2]
        flips = []
        for subset in range(3):
            if subset < num_subsets:
                fx = fixups[subset]
                stack = jnp.stack(indexes, axis=-1)
                idx_at_fix = _gather_cols(stack, fx)
                flips.append((idx_at_fix & (1 << (ib - 1))) != 0)
            else:
                flips.append(jnp.zeros((n,), dtype=bool))
        flips_stack = jnp.stack(flips, axis=-1)
        for px in range(16):
            f = _gather_last(flips_stack, owner[px])
            indexes[px] = jnp.where(f, hi_idx - indexes[px], indexes[px])
        max_ch = 4 if combined else 3
        for subset in range(num_subsets):
            for ch in range(max_ch):
                a, b = ep[subset][0][ch], ep[subset][1][ch]
                ep[subset][0][ch] = jnp.where(flips[subset], b, a)
                ep[subset][1][ch] = jnp.where(flips[subset], a, b)

    words = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]
    off = 0

    def pack_static(value, bits):
        nonlocal off, words
        if bits == 0:
            return
        j = off // 32
        sh = off % 32
        words[j] = words[j] | ((value << sh) if sh < 32 else 0)
        if sh + bits > 32:
            words[j + 1] = words[j + 1] | (value >> (32 - sh))
        off += bits

    pack_static(jnp.full((n,), 1 << mode, dtype=jnp.int32), mode + 1)
    if info["partition_bits"]:
        pack_static(partition, info["partition_bits"])
    if separate:
        pack_static(work["rotation"], 2)
    if info["has_index_selector"]:
        pack_static(work["isel"], 1)

    rgb_bits = info["rgb_bits"]
    for ch in range(3):
        for subset in range(num_subsets):
            for e in range(2):
                pack_static(ep[subset][e][ch] >> (8 - rgb_bits), rgb_bits)
    alpha_bits = info["alpha_bits"]
    if alpha_bits:
        for subset in range(num_subsets):
            for e in range(2):
                pack_static(ep[subset][e][3] >> (8 - alpha_bits), alpha_bits)

    if info["pbit"] == "per_subset":
        for subset in range(num_subsets):
            pack_static((ep[subset][0][0] >> (7 - rgb_bits)) & 1, 1)
    elif info["pbit"] == "per_ep":
        for subset in range(num_subsets):
            for e in range(2):
                pack_static((ep[subset][e][0] >> (7 - rgb_bits)) & 1, 1)

    # index fields: widths depend on data (fixup positions), so offsets are
    # computed per block
    base_off = jnp.full((n,), off, dtype=jnp.int32)
    cum = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        offset = base_off + cum
        words = _pack_var(words, indexes[px], offset, ib)
        width = ib - ((px == 0) * 1) \
            - jnp.where((fix1 == px) & (px != 0), 1, 0) \
            - jnp.where((fix2 == px) & (px != 0), 1, 0)
        cum = cum + width

    if separate:
        off2 = base_off + cum
        for px in range(16):
            words = _pack_var(words, indexes2[px], off2, aib)
            off2 = off2 + (aib - (1 if px == 0 else 0))

    return words


def _pack_bits(work, n):
    """Select each block's packed words by its winning mode; emit bytes."""
    words_by_mode = {m: _pack_mode_bits(m, work, n) for m in range(8)}
    final = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(4)]
    for m in range(8):
        sel = work["mode"] == m
        for j in range(4):
            final[j] = jnp.where(sel, words_by_mode[m][j], final[j])

    byte_cols = []
    for j in range(4):
        for b in range(4):
            byte_cols.append((final[j] >> (b * 8)) & 0xFF)
    return jnp.stack(byte_cols, axis=-1).astype(jnp.uint8)
