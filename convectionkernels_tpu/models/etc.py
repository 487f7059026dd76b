"""ETC1 / ETC2 / EAC encoders.

TPU-native reimplementation of the reference's ETCComputer
(/root/reference/ConvectionKernels_ETC.cpp), redesigned for dense batched
evaluation:

- The ETC1 "modified cluster fit" (ETC.cpp:2624-2882, etc_notes.txt:1-14)
  evaluates every table x offset candidate as array axes; the reference's
  per-lane adjacent dedup is unnecessary because duplicate candidates carry
  identical payloads, and unique-index ranks (prefix sums of change flags)
  reproduce its tie-breaking exactly.
- The differential pair resolution (FindBestDifferentialCombination,
  ETC.cpp:219-362) — deliberately scalar in the reference — becomes a dense
  masked pair-argmin over table-pair chunks, reproducing the sequential
  scan's committed winner including its fast path and its floating-point
  re-acceptance of equal-total ties (see _resolve_differential).
- T/H/planar mode searches batch their candidate scans; final 64-bit block
  emission is vectorized bit math, with the per-stage winner selected by
  (error, stage-rank) lexicographic argmin (strict-less update order).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import lanes
from ..ops.exact_math import exact_divide, exact_sqrt
from ..options import Flags, Options
from ..tables import etc_tables

FLIP_TABLES = np.array([
    [[0, 1, 4, 5, 8, 9, 12, 13], [2, 3, 6, 7, 10, 11, 14, 15]],
    [[0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 12, 13, 14, 15]],
], dtype=np.int32)  # g_flipTables (ETC.cpp:47-57)

INF = np.float32(np.inf)
FLT_MAX = lanes.FLT_MAX


def _weights(options: Options):
    return [np.float32(options.red_weight), np.float32(options.green_weight),
            np.float32(options.blue_weight)]


def compute_error(recon, pixels, pw_pixels, options: Options):
    """ComputeError{Uniform,Weighted,FakeBT709} (ETC.cpp:59-92).

    recon: 3 int32 arrays; pixels: 3 int32; pw_pixels: 3 float32 arrays.
    """
    if options.flags & Flags.ETC_USE_FAKE_BT709:
        yuv = convert_to_fake_bt709([lanes.to_float(c) for c in recon])
        d0 = yuv[0] - pw_pixels[0]
        d1 = yuv[1] - pw_pixels[1]
        d2 = yuv[2] - pw_pixels[2]
        return d0 * d0 + d1 * d1 + d2 * d2
    if options.flags & Flags.UNIFORM:
        err = None
        for ch in range(3):
            d = lanes.to_float(pixels[ch] - recon[ch])
            e = d * d
            err = e if err is None else err + e
        return err
    w = _weights(options)
    dr = lanes.to_float(recon[0]) * w[0] - pw_pixels[0]
    dg = lanes.to_float(recon[1]) * w[1] - pw_pixels[1]
    db = lanes.to_float(recon[2]) * w[2] - pw_pixels[2]
    return dr * dr + dg * dg + db * db


def convert_to_fake_bt709(rgb):
    """ConvertToFakeBT709 (ETC.cpp:2337-2347)."""
    r, g, b = rgb
    y = (r * np.float32(0.368233989135369)
         + g * np.float32(1.23876274963149)
         + b * np.float32(0.125054068802017))
    u = (r * np.float32(0.5) - g * np.float32(0.4541529)
         - b * np.float32(0.04584709))
    v = (r * np.float32(-0.081014709086133)
         - g * np.float32(0.272538676238785)
         + b * np.float32(0.353553390593274))
    return [y, u, v]


def convert_from_fake_bt709(yuv):
    """ConvertFromFakeBT709 (ETC.cpp:2349-2359)."""
    yy = yuv[0] * np.float32(0.57735026466774571071)
    u, v = yuv[1], yuv[2]
    r = yy + u * np.float32(1.5748000207960953486)
    g = (yy - u * np.float32(0.46812425854364753669)
         - v * np.float32(0.26491652528157560861))
    b = yy + v * np.float32(2.6242146882856944069)
    return [r, g, b]


def extract_blocks(pixels_u8, options: Options):
    """ExtractBlocks (ETC.cpp:2128-2155): pixels + preweighted pixels."""
    p = jnp.asarray(pixels_u8, dtype=jnp.int32)
    pixels = [[p[:, px, ch] for ch in range(3)] for px in range(16)]
    if options.flags & Flags.ETC_USE_FAKE_BT709:
        pw = [convert_to_fake_bt709([lanes.to_float(c) for c in row])
              for row in pixels]
    elif options.flags & Flags.UNIFORM:
        pw = [[lanes.to_float(c) for c in row] for row in pixels]
    else:
        w = _weights(options)
        pw = [[lanes.to_float(row[ch]) * w[ch] for ch in range(3)]
              for row in pixels]
    return pixels, pw


class StageBest:
    """Cross-stage winner: (error, stage-rank) lexicographic minimum over
    emitted 64-bit blocks (hi/lo u32 words)."""

    def __init__(self, n):
        self.error = jnp.full((n,), FLT_MAX, dtype=jnp.float32)
        self.rank = jnp.full((n,), 2**30, dtype=jnp.int32)
        self.hi = jnp.zeros((n,), dtype=jnp.int32)
        self.lo = jnp.zeros((n,), dtype=jnp.int32)
        self.lane_mask = None  # per-lane gate for subsequent updates

    def update(self, error, rank: int, hi, lo, valid=None):
        better = (error < self.error) | ((error == self.error)
                                         & (rank < self.rank))
        if valid is not None:
            better = better & valid
        if self.lane_mask is not None:
            better = better & self.lane_mask
        self.error = jnp.where(better, error, self.error)
        self.rank = jnp.where(better, rank, self.rank)
        self.hi = jnp.where(better, hi, self.hi)
        self.lo = jnp.where(better, lo, self.lo)

    def reset_where(self, mask):
        """ConditionalSet(bestError, mask, FLT_MAX) — punchthrough restart."""
        self.error = jnp.where(mask, FLT_MAX, self.error)
        self.rank = jnp.where(mask, 2**30, self.rank)

    def to_bytes(self):
        cols = []
        for w in (self.hi, self.lo):
            for i in range(4):
                cols.append((w >> (24 - i * 8)) & 0xFF)
        return jnp.stack(cols, axis=-1).astype(jnp.uint8)


# --- ETC1 search ---------------------------------------------------------------

def _padded_offsets():
    """[8, 81] offsets per table, short tables padded with their last value
    (padding duplicates produce identical candidates, which is harmless)."""
    out = np.zeros((8, etc_tables.MAX_POTENTIAL_OFFSETS), dtype=np.int32)
    counts = np.zeros(8, dtype=np.int32)
    for t in range(8):
        offs = etc_tables.potential_offsets(t)
        counts[t] = len(offs)
        out[t, :len(offs)] = offs
        out[t, len(offs):] = offs[-1]
    return out, counts


def _quantize_etc1_base(cu, differential: bool):
    """Quantize candidate base colors (ETC.cpp:2718-2735). cu: int32 0..2040."""
    if differential:
        return ((cu << 5) - cu + (cu >> 3) + 1024) >> 11
    return ((cu << 5) - (cu << 1) + (cu >> 3) + 2048) >> 12


# Run-deduplicated candidate slot axis for the ETC1 scan.
#
# Within one modifier table, the quantized base color is a run-structured
# function of the (sorted) offset list: each channel's 5-bit quantization
# is monotone in the shared scalar offset, so consecutive offsets collapse
# into runs of identical colors, and error/selectors depend only on
# (table, color) — each run is exactly ONE unique attempt (the reference's
# per-lane adjacent dedup, ETC.cpp:2768-2791). The counts below are the
# EXACT worst-case run counts per table: brute-forced over every cum value
# in [0, 2040] per channel, taking the maximum 3-channel union of
# quantization-boundary sets (tests/test_etc.py:test_etc1_run_bounds
# re-derives them). A static [sum(K)] slot axis therefore losslessly
# replaces the dense [8*81] candidate axis: 286 slots vs 648 for the
# differential quantizer, 175 vs 648 for the individual one — shrinking
# the O(A^2) differential pair resolve ~5x and the TestHalfBlock error
# scan ~2.3x with bit-identical results.
ETC1_RUN_BOUNDS = {
    True: (7, 14, 23, 31, 42, 48, 45, 76),   # differential quantizer
    False: (4, 7, 13, 16, 23, 29, 37, 46),   # individual quantizer
}
_EMPTY_COLOR = np.int32(1 << 15)  # packed colors are 15-bit; sentinel above


def _slot_layout(differential: bool):
    """(run bounds, per-slot table ids [A], per-slot modifier rows [A,4])."""
    kb = ETC1_RUN_BOUNDS[differential]
    slot_tables = np.repeat(np.arange(8, dtype=np.int32), kb)
    mods_a = np.repeat(np.asarray(etc_tables.ETC1_MODIFIER_TABLES,
                                  dtype=np.int32), kb, axis=0)
    return kb, slot_tables, mods_a


def _etc1_candidates_dedup(cum, sector_pixels, sector_pw, differential: bool,
                           options: Options):
    """One (flip, sector, d) candidate set on the run-slot axis.

    cum: 3 x [N] int32 channel sums of the 8 sector pixels. Returns
    (error [N,A], color [N,A], selectors [N,A], table [N,A]), where A =
    sum(ETC1_RUN_BOUNDS[differential]) and slots are in (table, run)
    order — the reference's deduped visitation order. Empty slots carry
    INF error (and color 0), so they can never win a reduction nor be
    chosen as a differential partner.
    """
    n = cum[0].shape[0]
    offsets, _ = _padded_offsets()
    kb, slot_tables, mods_a = _slot_layout(differential)

    cum_b = [c[:, None, None] for c in cum]
    offs_b = jnp.asarray(offsets)[None, :, :]          # [1,8,81]
    cu = [jnp.clip(c + offs_b, 0, 2040) for c in cum_b]
    quant = [_quantize_etc1_base(c, differential) for c in cu]
    packed = quant[0] | (quant[1] << 5) | (quant[2] << 10)   # [N,8,81]

    # per-table run ids (prefix count of color changes)
    prev = jnp.concatenate(
        [jnp.full((n, 8, 1), -1, dtype=jnp.int32), packed[:, :, :-1]],
        axis=-1)
    u = jnp.cumsum((packed != prev).astype(jnp.int32), axis=-1) - 1

    # compact each table's runs into its K_t slots (masked min; a run's
    # elements all carry the same color, so min == the run color). Slot
    # axis on SUBLANES, offset axis minor: the [N, K_t, 81] grids live
    # only inside their reduce fusions (a concatenated one-grid variant
    # materialized [N, 81, A] broadcasts — ~1 GB of HBM traffic), and
    # only the small [N, K_t] outputs pad.
    ucolors = []
    for t in range(8):
        ks = jnp.arange(kb[t], dtype=jnp.int32)
        m = u[:, t, None, :] == ks[None, :, None]      # [N, K_t, 81]
        ucolors.append(jnp.min(
            jnp.where(m, packed[:, t, None, :], _EMPTY_COLOR), axis=2))
    ucolor = jnp.concatenate(ucolors, axis=1)          # [N, A]
    is_empty = ucolor == _EMPTY_COLOR
    ucolor = jnp.where(is_empty, 0, ucolor)

    error, selectors = _test_half_block_flat(
        ucolor, sector_pixels, sector_pw, mods_a, differential, options)
    error = jnp.where(is_empty, INF, error)
    table = jnp.broadcast_to(jnp.asarray(slot_tables)[None, :], error.shape)
    return error, ucolor, selectors, table


def _test_half_block(packed, sector_pixels, sector_pw, modifiers,
                     differential: bool, options: Options):
    """TestHalfBlock (ETC.cpp:94-149), batched over candidate axes.

    packed: int32 [..., T, C]; modifiers: [T, 4] static np array.
    sector_pixels/sector_pw: 8 x 3 lists of [N] arrays.
    Returns (error [N,T,C] f32, selectors [N,T,C] i32).
    """
    quant = [(packed >> (ch * 5)) & 31 for ch in range(3)]
    if differential:
        unquant = [(q << 3) | (q >> 2) for q in quant]
    else:
        unquant = [(q << 4) | q for q in quant]

    # Modifier axis OUTER (position 1): [N,4,T,C] keeps the TPU (8,128)
    # register tiling on the trailing (T, C) dims; the previous [N,T,C,4]
    # layout padded a 4-wide minor axis to 128 lanes (32x VREG waste).
    mods = jnp.asarray(modifiers).T[None, :, :, None]  # [1,4,T,1]
    modified = [jnp.clip(u[:, None, :, :] + mods, 0, 255) for u in unquant]
    # modified[ch]: [N,4,T,C]

    selectors = None
    total_error = None
    for px in range(8):
        pix = [sector_pixels[px][ch][:, None, None, None] for ch in range(3)]
        pw = [sector_pw[px][ch][:, None, None, None] for ch in range(3)]
        err = compute_error(modified, pix, pw, options)  # [N,4,T,C]
        # per-pixel best selector: strict-less, first wins == ordered argmin
        sel = lanes.first_argmin(err, 1).astype(jnp.int32)
        best = jnp.min(err, axis=1)
        total_error = best if total_error is None else total_error + best
        s = sel << (px * 2)
        selectors = s if selectors is None else selectors | s
    return total_error, selectors


def _test_half_block_flat(packed, sector_pixels, sector_pw, mods_a,
                          differential: bool, options: Options):
    """_test_half_block on a flat candidate axis with PER-SLOT modifier
    rows (the run-slot layout): packed [N, A] int32, mods_a [A, 4] static.
    Identical arithmetic to _test_half_block (same dtypes and op order),
    so slot errors are bit-identical to the dense axis entries they
    deduplicate.

    The 8-pixel loop is an ARRAY axis (position -2: an exact sublane
    tile), so the whole error scan is one [N,4,8,A] fused reduce instead
    of 8 small per-pixel fusions (per-op launch overhead dominated the
    op-level profile); the per-pixel error sum stays a sequential
    Python-loop chain over slices for the reference's f32 accumulation
    order."""
    quant = [(packed >> (ch * 5)) & 31 for ch in range(3)]
    if differential:
        unquant = [(q << 3) | (q >> 2) for q in quant]
    else:
        unquant = [(q << 4) | q for q in quant]

    mods = jnp.asarray(mods_a).T[None, :, None, :]     # [1,4,1,A]
    modified = [jnp.clip(u[:, None, None, :] + mods, 0, 255)
                for u in unquant]                      # [N,4,1,A]

    pix = [jnp.stack([sector_pixels[px][ch] for px in range(8)],
                     axis=1)[:, None, :, None] for ch in range(3)]
    pw = [jnp.stack([sector_pw[px][ch] for px in range(8)],
                    axis=1)[:, None, :, None] for ch in range(3)]
    err = compute_error(modified, pix, pw, options)    # [N,4,8,A]
    best, sel = lanes.lex_min_with_index(err, 1)       # [N,8,A] each

    selectors = None
    total_error = None
    for px in range(8):
        b = best[:, px, :]
        total_error = b if total_error is None else total_error + b
        s = sel[:, px, :] << (px * 2)
        selectors = s if selectors is None else selectors | s
    return total_error, selectors


def _unique_rank(colors, table_axis_len: int, per_table: int):
    """Unique-attempt index per lane matching the reference's deduped storage
    order: prefix count of color-change flags, resetting at table boundaries.

    colors: int32 [N, T*C] in (table-major, offset order).
    """
    n = colors.shape[0]
    flat = colors.reshape(n, table_axis_len, per_table)
    prev = jnp.concatenate([jnp.full((n, table_axis_len, 1), -1,
                                     dtype=jnp.int32), flat[:, :, :-1]],
                           axis=-1)
    is_new = (flat != prev).astype(jnp.int32)
    # global unique index = cumulative count across the flattened axis - 1
    new_flat = is_new.reshape(n, -1)
    return jnp.cumsum(new_flat, axis=-1) - 1  # [N, T*C]


def compress_etc1_internal(stage: StageBest, rank_base: int, pixels, pw,
                           options: Options, punchthrough_min_d: bool):
    """CompressETC1BlockInternal (ETC.cpp:2624-2882)."""
    n = pixels[0][0].shape[0]
    offsets, _counts = _padded_offsets()
    c_count = offsets.shape[1]
    modifiers = np.asarray(etc_tables.ETC1_MODIFIER_TABLES)
    fake = bool(options.flags & Flags.ETC_USE_FAKE_BT709)
    accurate = bool(options.flags & Flags.ETC_FAKE_BT709_ACCURATE)

    min_d = 1 if punchthrough_min_d else 0

    for flip in range(2):
        sector_pixels = [[], []]
        sector_pw = [[], []]
        sector_cum = [[], []]
        for sector in range(2):
            cum = [None] * 3
            for px in range(8):
                src = int(FLIP_TABLES[flip][sector][px])
                sector_pixels[sector].append(pixels[src])
                sector_pw[sector].append(pw[src])
                for ch in range(3):
                    v = pixels[src][ch]
                    cum[ch] = v if cum[ch] is None else cum[ch] + v
            sector_cum[sector] = cum

        ind_best = [None, None]   # per-sector individual-mode best
        diff_data = [None, None]  # per-sector differential candidates

        for d in range(min_d, 2):
            for sector in range(2):
                if not fake:
                    # run-deduplicated slot axis (see ETC1_RUN_BOUNDS): on
                    # slots every attempt is unique, so the visitation
                    # rank IS the slot position
                    error, colors, selectors, tables_b = \
                        _etc1_candidates_dedup(
                            sector_cum[sector], sector_pixels[sector],
                            sector_pw[sector], d == 1, options)
                    kb = ETC1_RUN_BOUNDS[d == 1]
                    urank = jnp.broadcast_to(
                        jnp.arange(error.shape[1],
                                   dtype=jnp.int32)[None, :], error.shape)
                    row_chunks = tuple(
                        (int(s), int(s + k))
                        for s, k in zip(np.cumsum((0,) + kb[:-1]), kb))
                else:
                    # FakeBT709's octant-corrected quantizer is not
                    # run-structured in the offset, so the static slot
                    # bound does not apply: keep the dense axis
                    cum_b = [sector_cum[sector][ch][:, None, None]
                             for ch in range(3)]
                    offs_b = jnp.asarray(offsets)[None, :, :]  # [1,T,C]
                    cu = [jnp.clip(c + offs_b, 0, 2040) for c in cum_b]
                    quant = _resolve_fake_bt709_rounding(cu, d == 1,
                                                         accurate)
                    packed = quant[0] | (quant[1] << 5) | (quant[2] << 10)

                    error, selectors = _test_half_block(
                        packed, sector_pixels[sector], sector_pw[sector],
                        modifiers, d == 1, options)

                    table_ids = jnp.broadcast_to(
                        jnp.arange(8, dtype=jnp.int32)[None, :, None],
                        packed.shape)
                    colors = jnp.broadcast_to(packed,
                                              error.shape).reshape(n, -1)
                    tables_b = jnp.broadcast_to(table_ids,
                                                error.shape).reshape(n, -1)
                    error = error.reshape(n, -1)
                    selectors = selectors.reshape(n, -1)
                    urank = _unique_rank(colors, 8, c_count)
                    per = c_count
                    row_chunks = tuple((t * per, (t + 1) * per)
                                       for t in range(8))

                if d == 0:
                    # individual: per-sector lex-argmin in (table, offset) order
                    win_err, win = lanes.lex_min_with_index(error, -1)

                    def gather(x, win=win):
                        return lanes.take_winner(x, win)

                    ind_best[sector] = dict(
                        error=win_err,
                        color=gather(colors),
                        selectors=gather(selectors),
                        table=gather(tables_b),
                    )
                else:
                    diff_data[sector] = dict(
                        error=error,
                        color=colors,
                        selectors=selectors,
                        table=tables_b,
                        urank=urank,
                        row_chunks=row_chunks,
                    )

            if d == 0:
                total = ind_best[0]["error"] + ind_best[1]["error"]
                hi, lo = _emit_etc1(flip, 0, [ind_best[0], ind_best[1]], n,
                                    transparent=False)
                stage.update(total, rank_base + flip * 2, hi, lo)
            else:
                win = _resolve_differential(diff_data, n, stage.error)
                hi, lo = _emit_etc1(flip, 1, win, n, transparent=False)
                stage.update(win[0]["total"], rank_base + flip * 2 + 1, hi,
                             lo)

    return stage


def _resolve_differential(diff_data, n, best_in, can_ignore=None):
    """Dense equivalent of FindBestDifferentialCombination (ETC.cpp:219-362).

    The reference's scan is sequential with floating-point acceptance
    quirks; this reproduces its committed winner with dense reductions:

    - Within a row i (sector-0 candidate), the best legal partner j
      minimizes (err1, uidx1) independently of err0: f32 addition is
      monotone in each operand, so lex (e0[i]+e1[j], e1, u1) over j
      equals lex (e1, u1); the winning total is then recomputed from
      the same two operands (bit-identical sum).
    - The 3-channel legality window (per-channel diff in (-5, 4)) is one
      SWAR subtract on 10-bit packed fields: guard bit 9 per field makes
      the subtraction borrow-proof (fields can never go negative), so
      `(B - A) & mask == pattern` tests all three channels at once.
    - Unique ranks strictly increase across table boundaries (the rank
      cumsum flags every table's first entry as new), so equal
      (u0) => same sector-0 table & color, equal (e1, u1) => same
      sector-1 table & color, and any full-key tie carries an identical
      payload: the reference scan visits unique attempts exactly in
      (err, urank) sorted order.
    - Fast path (ETC.cpp:258-273): when the per-sector unconstrained
      lex-min attempts form a legal pair and their f32 sum beats the
      incoming best, the reference commits THAT pair without scanning —
      modeled explicitly (a later scan row tied on total must not win).
    - Re-acceptance (ETC.cpp:326-346): the slow scan's acceptance test is
      `err1 < fl(best - err0)` against a RUNNING best, so after the
      minimal total T is first reached, any later row r in (e0, u0) scan
      order with mine1[r] < fl(T - e0[r]) REPLACES the winner even though
      its total ties T (fl(e0+e1) rounded up above the exact sum). The
      committed winner is therefore the LAST such row when any exists,
      else the first row reaching T (= lex-min (total, e0, u0)).

    Residual ulp caveat (documented, not observed): if two LEGAL pairs
    have distinct f32 totals within 1 ulp of each other (or of best_in),
    the reference's running-best trajectory can skip the smaller one in
    ways only a sequential replay reproduces. Equal-total ties — the
    case that occurs in practice (identical arithmetic values) — are
    exact here.

    best_in: [N] f32, the stage's best error entering this resolve
    (blockBestTotalError at the reference call site).
    """
    e0 = diff_data[0]["error"]
    e1 = diff_data[1]["error"]
    c0 = diff_data[0]["color"]
    c1 = diff_data[1]["color"]
    u0 = diff_data[0]["urank"]
    u1 = diff_data[1]["urank"]
    a_count = e0.shape[1]
    row_chunks = diff_data[0].get("row_chunks")
    if row_chunks is None:
        per_table = a_count // 8
        row_chunks = tuple((t * per_table, (t + 1) * per_table)
                           for t in range(8))
    big = jnp.int32(2**30)

    unit = 1 | (1 << 10) | (1 << 20)

    def swar_fields(c):
        return (c & 31) | (((c >> 5) & 31) << 10) | (((c >> 10) & 31) << 20)

    fields0 = swar_fields(c0)                              # [N,A]
    # +4 bias centers the (-5, 4) window at [0, 7]; +512 guard per field
    fields1 = swar_fields(c1) + jnp.int32(516 * unit)
    swar_mask = jnp.int32(0x3F8 * unit)
    swar_legal = jnp.int32(512 * unit)

    ignore_any = None
    if can_ignore is not None:
        ignore_any = (can_ignore[0] | can_ignore[1])[:, None, None]

    # packed (uidx1, j): u1 < a_count, so u1*a_count + j orders by
    # (u1, j); j ties carry identical payloads (duplicate candidates).
    jj = jnp.arange(a_count, dtype=jnp.int32)
    u1j = u1 * a_count + jj[None, :]                       # [N,A]

    # Per-row (sector-0 candidate) min legal partner ERROR only, i-axis
    # chunked by table to bound the fused [N, rows, A] grids. The O(A^2)
    # pair grid is compute-bound on the VPU, so the hot reduce carries NO
    # index payload (5 ops/pair: SWAR sub, and, cmp, select, min) — the
    # winning row's partner index is reconstructed afterwards on a single
    # [N, A] pass (its legality row + e1 == mine1[win], then min u1j,
    # which is exactly the (e1, u1j) lex-min the scan commits).
    mine1_rows = []
    for (c0a, c0b) in row_chunks:
        f0s = fields0[:, c0a:c0b][:, :, None]
        diff = fields1[:, None, :] - f0s
        ok = (diff & swar_mask) == swar_legal              # [N,rows,A]
        if ignore_any is not None:
            ok = ok | ignore_any
        e1b = jnp.broadcast_to(e1[:, None, :], ok.shape)
        mine1_rows.append(jnp.min(jnp.where(ok, e1b, INF), axis=2))

    mine1 = jnp.concatenate(mine1_rows, axis=1)            # [N,A]
    total = e0 + mine1                                     # [N,A]

    # First row reaching the minimal total T in (e0, u0) scan order:
    # lex-min (total, e0, u0) (full-key ties are payload-identical).
    tmin = jnp.min(total, axis=-1)
    m = total == tmin[:, None]
    ke0 = jnp.min(jnp.where(m, e0, INF), axis=-1)
    m = m & (e0 == ke0[:, None])
    ku0 = jnp.min(jnp.where(m, u0, big), axis=-1)
    m = m & (u0 == ku0[:, None])
    wini = jnp.min(jnp.where(m, jj[None, :], big), axis=-1)  # iota: no ties
    wini = jnp.minimum(wini, a_count - 1)

    # Re-acceptance override (see docstring): the LAST row in (e0, u0)
    # scan order whose min legal partner beats fl(T - e0) replaces the
    # first achiever. Rows in this set necessarily tie total == T.
    reacc = mine1 < (tmin[:, None] - e0)
    ge0 = jnp.max(jnp.where(reacc, e0, -INF), axis=-1)
    mr = reacc & (e0 == ge0[:, None])
    gu0 = jnp.max(jnp.where(mr, u0, -1), axis=-1)
    mr = mr & (u0 == gu0[:, None])
    s_wini = jnp.max(jnp.where(mr, jj[None, :], -1), axis=-1)
    wini = jnp.where(s_wini >= 0, s_wini, wini)

    # Fast path: per-sector unconstrained lex-min (err, urank) attempts;
    # committed outright when their sum beats best_in and the pair is
    # legal (or a sector is ignorable). The fast pair's partner IS row
    # bd0's min legal partner (the global min is legal for it), so only
    # the row index needs overriding.
    bd0e = jnp.min(e0, axis=-1)
    mf = e0 == bd0e[:, None]
    bd0u = jnp.min(jnp.where(mf, u0, big), axis=-1)
    mf = mf & (u0 == bd0u[:, None])
    bd0i = jnp.minimum(jnp.min(jnp.where(mf, jj[None, :], big), axis=-1),
                       a_count - 1)
    bd1e = jnp.min(e1, axis=-1)
    mf = e1 == bd1e[:, None]
    bd1uj = jnp.min(jnp.where(mf, u1j, big), axis=-1)
    bd1j = jnp.minimum(bd1uj % a_count, a_count - 1)
    bd0c = lanes.take_winner(fields0, bd0i)
    bd1c = lanes.take_winner(fields1, bd1j)  # pre-biased fields (+516/unit)
    pair_legal = ((bd1c - bd0c) & swar_mask) == swar_legal
    if ignore_any is not None:
        pair_legal = pair_legal | ignore_any[:, 0, 0]
    enable = (bd0e + bd1e) < best_in
    wini = jnp.where(enable & pair_legal, bd0i, wini)

    def g0(x):
        return lanes.take_winner(x, wini)

    win_total = g0(total)
    valid = jnp.isfinite(win_total)
    # post-hoc partner reconstruction (see hot-loop comment)
    win_f0 = g0(fields0)
    win_mine1 = g0(mine1)
    okw = ((fields1 - win_f0[:, None]) & swar_mask) == swar_legal
    if ignore_any is not None:
        okw = okw | ignore_any[:, :, 0]
    mw = okw & (e1 == win_mine1[:, None])
    winj_uj = jnp.min(jnp.where(mw, u1j, big), axis=-1)
    winj = jnp.where(valid, jnp.minimum(winj_uj, big - 1) % a_count, 0)

    def g1(x):
        return lanes.take_winner(x, winj)

    def vz(x):
        return jnp.where(valid, x, 0)

    color0 = vz(g0(c0))
    color1 = vz(g1(c1))
    sel0 = vz(g0(diff_data[0]["selectors"]))
    sel1 = vz(g1(diff_data[1]["selectors"]))
    table0 = vz(g0(diff_data[0]["table"]))
    table1 = vz(g1(diff_data[1]["table"]))

    if can_ignore is not None:
        # ignored sector adopts the other sector's color (ETC.cpp:249-252)
        color0 = jnp.where(can_ignore[0], color1, color0)
        color1 = jnp.where(can_ignore[1] & ~can_ignore[0], color0, color1)
    win0 = dict(total=win_total, color=color0, selectors=sel0, table=table0)
    win1 = dict(color=color1, selectors=sel1, table=table1)
    return [win0, win1]


def _resolve_fake_bt709_rounding(cu, differential, accurate):
    """ResolveHalfBlockFakeBT709Rounding{Accurate,Fast} (ETC.cpp:2157-2285)."""
    if accurate:
        if differential:
            quant = [((c << 5) - c + (c >> 3)) >> 11 for c in cu]
        else:
            quant = [((c << 5) - (c << 1) + (c >> 3)) >> 12 for c in cu]
        low = []
        high = []
        for ch in range(3):
            q = quant[ch]
            if differential:
                unq = (q << 3) | (q >> 2)
                qn = jnp.minimum(31, q + 1)
                unq_next = (qn << 3) | (qn >> 2)
            else:
                unq = (q << 4) | q
                unq_next = jnp.minimum(255, unq + 17)
            low.append(lanes.to_float(unq << 3))
            high.append(lanes.to_float(unq_next << 3))
        cum_yuv = convert_to_fake_bt709([lanes.to_float(c) for c in cu])
        best_err = None
        best_octant = None
        for octant in range(8):
            rgb = [high[ch] if (octant >> ch) & 1 else low[ch]
                   for ch in range(3)]
            oy = convert_to_fake_bt709(rgb)
            d = [oy[ch] - cum_yuv[ch] for ch in range(3)]
            # NOTE: replicates the reference's error expression including its
            # d1+d1 (instead of d1*d1) quirk (ETC.cpp:2225)
            err = d[0] * d[0] + d[1] + d[1] + d[2] * d[2]
            if best_err is None:
                best_err = err
                best_octant = jnp.zeros_like(cu[0])
            else:
                better = err < best_err
                best_octant = jnp.where(better, octant, best_octant)
                best_err = jnp.minimum(err, best_err)
        return [quant[ch] + ((best_octant >> ch) & 1) for ch in range(3)]

    # fast path: octant lookup table (ETC.cpp:2233-2285)
    fill = [c + (c >> 8) for c in cu]
    table = jnp.asarray(etc_tables.fake_bt709_rounding16())
    if differential:
        r_off = (fill[0] << 6) & 0xF00
        g_off = (fill[1] << 4) & 0x0F0
        b_off = (fill[2] >> 2) & 0x00F
        base = [f >> 6 for f in fill]
        upper = 31
    else:
        r_off = (fill[0] << 5) & 0xF00
        g_off = (fill[1] << 1) & 0x0F0
        b_off = (fill[2] >> 3) & 0x00F
        base = [f >> 7 for f in fill]
        upper = 15
    octant = jnp.take(table, r_off | g_off | b_off)
    return [jnp.minimum(base[ch] + ((octant >> ch) & 1), upper)
            for ch in range(3)]


# --- T / H / planar searches ----------------------------------------------------

def _div_exact_int(numer, divisor):
    """Per-lane exact integer floor division with divisor-0 -> 0 (the
    reference's scalar loops, e.g. ETC.cpp:438-446).

    Both operands are non-negative with numer < 2^24 and divisor < 2^13
    at every call site. s32 divide lowers to a long multi-op sequence on
    TPU; a native f32 divide plus a +-1 integer fixup is ~3x cheaper and
    unconditionally exact: f32 represents both operands exactly, the
    native quotient is within ~ulp-scale of the rational value (so within
    1 of the true floor), and the fixup corrects any +-1 estimate to the
    true floor using exact integer products."""
    safe = jnp.maximum(divisor, 1)
    q = jnp.trunc(numer.astype(jnp.float32)
                  / safe.astype(jnp.float32)).astype(jnp.int32)
    q = q + jnp.where((q + 1) * safe <= numer, 1, 0)
    q = q - jnp.where(q * safe > numer, 1, 0)
    return jnp.where(divisor == 0, 0, q)


def encode_tmode(stage: StageBest, rank_base: int, is_isolated, pixels, pw,
                 options: Options):
    """EncodeTMode (ETC.cpp:396-648). is_isolated: 16 bool [N] arrays."""
    n = pixels[0][0].shape[0]
    fake = bool(options.flags & Flags.ETC_USE_FAKE_BT709)

    iso_total = [None] * 3
    line_total = [None] * 3
    num_iso = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        sel = is_isolated[px]
        for ch in range(3):
            t = jnp.where(sel, pixels[px][ch], 0)
            iso_total[ch] = t if iso_total[ch] is None else iso_total[ch] + t
            line_total[ch] = pixels[px][ch] if line_total[ch] is None \
                else line_total[ch] + pixels[px][ch]
        num_iso = num_iso + sel.astype(jnp.int32)
    line_total = [line_total[ch] - iso_total[ch] for ch in range(3)]
    num_line = 16 - num_iso

    divisors = num_iso * 34
    addend = (num_iso << 4) | num_iso
    iso_avg_q = []
    iso_targets = []
    for ch in range(3):
        numerator = iso_total[ch] + iso_total[ch]
        if not fake:
            numerator = numerator + addend
        iso_avg_q.append(_div_exact_int(numerator, divisors))
        iso_targets.append(numerator)
    if fake:
        iso_avg_q = _resolve_th_fake_bt709(iso_avg_q, iso_targets, num_iso)

    iso_color = [(q) | (q << 4) for q in iso_avg_q]
    iso_error = []
    for px in range(16):
        iso_error.append(compute_error(iso_color, pixels[px], pw[px],
                                       options))

    # line-color candidate scan: premultiplier in [-16,16] (per-lane clamped
    # to +-numLine; clamp duplicates carry identical payloads). The 8
    # modifier tables x 33 offsets form ONE flattened table-major candidate
    # axis (K=264) — see the virtual-T docstring for why this layout and
    # why first_argmin over it preserves the reference's (table, offset)
    # first-wins tie order.
    line_divisors = num_line * 34
    line_addend = (num_line << 4) | num_line
    th_mods = np.asarray(etc_tables.TH_MODIFIER_TABLE, dtype=np.int32)
    n_offs = 33
    K = 8 * n_offs

    offs = np.arange(-16, 17, dtype=np.int32)  # [33]
    offs_b = jnp.asarray(offs)[None, :]
    clamped = jnp.maximum(-num_line[:, None],
                          jnp.minimum(num_line[:, None], offs_b))  # [N,33]
    mod_addend = (clamped[:, None, :]
                  * (2 * th_mods)[None, :, None]).reshape(n, K)
    mod_k = jnp.asarray(np.repeat(th_mods, n_offs))[None, :]       # [1,K]

    quantized = []
    targets = []
    for ch in range(3):
        if fake:
            base = line_total[ch] + line_total[ch]
        else:
            base = line_total[ch] + line_total[ch] + line_addend
        numer = jnp.maximum(0, base[:, None] + mod_addend)
        q = jnp.minimum(15, _div_exact_int(numer, line_divisors[:, None]))
        quantized.append(q)
        targets.append(numer)
    if fake:
        quantized = _resolve_th_fake_bt709(quantized, targets,
                                           num_line[:, None])
        quantized = [jnp.minimum(15, q) for q in quantized]
    packed = quantized[0] | (quantized[1] << 5) | (quantized[2] << 10)

    # per-candidate: line colors (16ths expansion +- modifier)
    unq = [((packed >> (ch * 5)) & 15) for ch in range(3)]
    unq = [(q << 4) | q for q in unq]
    line_colors = [
        [jnp.minimum(255, unq[ch] + mod_k) for ch in range(3)],
        [unq[ch] for ch in range(3)],
        [jnp.maximum(0, unq[ch] - mod_k) for ch in range(3)],
    ]

    # NOTE: line-color errors use Uniform/Weighted even under FakeBT709
    # (EncodeTMode, ETC.cpp:607-612) — under the fake flag the weighted
    # error then compares RGB*weights against YUV-preweighted pixels,
    # replicating the reference's behavior.
    opts_no_fake = Options(
        flags=options.flags & ~Flags.ETC_USE_FAKE_BT709,
        red_weight=options.red_weight, green_weight=options.green_weight,
        blue_weight=options.blue_weight)
    error = None
    selectors = None
    for px in range(16):
        pix = [pixels[px][ch][:, None] for ch in range(3)]
        pwp = [pw[px][ch][:, None] for ch in range(3)]
        px_err = jnp.broadcast_to(iso_error[px][:, None], packed.shape)
        px_sel = jnp.zeros_like(packed)
        for i in range(3):
            e = compute_error(line_colors[i], pix, pwp, opts_no_fake)
            better = e < px_err
            px_err = jnp.minimum(e, px_err)
            px_sel = jnp.where(better, i + 1, px_sel)
        error = px_err if error is None else error + px_err
        sel_shift = px_sel << (px * 2)
        selectors = sel_shift if selectors is None \
            else selectors | sel_shift

    # candidate reduce in dense (table, offset) order == unique order;
    # one-pass (value, index) reduce over a barriered error array so the
    # 16-pixel error chain is computed exactly once (not re-fused into
    # each reduction pass)
    import jax as _jax
    error, selectors, packed = _jax.lax.optimization_barrier(
        (error, selectors, packed))
    win_err, win = lanes.lex_min_with_index(error, -1)

    def g(x, win=win):
        return lanes.take_winner(x, win)

    best = dict(error=win_err, packed=g(packed), selectors=g(selectors),
                table=win // n_offs)

    line_color = [(best["packed"] >> (ch * 5)) & 15 for ch in range(3)]
    hi, lo = _emit_tmode(line_color, iso_avg_q, best["selectors"],
                         best["table"], True, n)
    stage.update(best["error"], rank_base, hi, lo)


def _resolve_th_fake_bt709(quantized, targets, granularity):
    """ResolveTHFakeBT709Rounding (ETC.cpp:2286-2327)."""
    low = []
    high = []
    for ch in range(3):
        unq = (quantized[ch] << 4) | quantized[ch]
        unq_next = jnp.minimum(255, unq + 17)
        low.append(lanes.to_float((unq * granularity) << 1))
        high.append(lanes.to_float((unq_next * granularity) << 1))
    cum_yuv = convert_to_fake_bt709([lanes.to_float(t) for t in targets])
    best_err = None
    best_octant = None
    for octant in range(8):
        rgb = [high[ch] if (octant >> ch) & 1 else low[ch] for ch in range(3)]
        oy = convert_to_fake_bt709(rgb)
        d = [oy[ch] - cum_yuv[ch] for ch in range(3)]
        # replicates the reference's d1+d1 quirk (ETC.cpp:2318)
        err = d[0] * d[0] + d[1] + d[1] + d[2] * d[2]
        if best_err is None:
            best_err = err
            best_octant = jnp.zeros_like(quantized[0])
        else:
            better = err < best_err
            best_octant = jnp.where(better, octant, best_octant)
            best_err = jnp.minimum(err, best_err)
    return [quantized[ch] + ((best_octant >> ch) & 1) for ch in range(3)]


def encode_hmode(stage: StageBest, rank_base: int, groupings, pixels, pw,
                 options: Options):
    """EncodeHMode (ETC.cpp:649-886).

    Restructured for TPU bandwidth: the 8 modifier tables flatten into
    one flat candidate-color axis (as in encode_tmode), everything is
    laid out BLOCK-MINOR (candidate/pixel axes leading, the 4096-block
    axis on the 128-lane tile dim, so nothing pads), and the (i1, i0)
    pair scan accumulates ONLY the pair total as a barriered
    [8, 33, 33, N] chain resolved by a one-pass (value, index)
    lexicographic reduce. The winner's per-pixel sector/sign bits are
    recomputed afterwards from the winning pair's colors on [N, 16]
    arrays: bit-identical to the grid's decisions because the same
    compute_error inputs reproduce the same f32 values. The flat
    (table, i1-major, i0) order equals the reference's strict-improvement
    combo walk (ETC.cpp:797-815) over tables then unique pair indexes.
    """
    n = pixels[0][0].shape[0]

    totals = [[None] * 3, [None] * 3]
    count1 = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        for ch in range(3):
            v = pixels[px][ch]
            totals[0][ch] = v if totals[0][ch] is None else totals[0][ch] + v
            g = jnp.where(groupings[px], v, 0)
            totals[1][ch] = g if totals[1][ch] is None else totals[1][ch] + g
        count1 = count1 + groupings[px].astype(jnp.int32)
    totals[0] = [totals[0][ch] - totals[1][ch] for ch in range(3)]
    counts = [16 - count1, count1]

    th_mods = np.asarray(etc_tables.TH_MODIFIER_TABLE, dtype=np.int32)
    n_offs = 33
    K = 8 * n_offs

    # candidate colors per sector: premultiplier in [-16,16] clamped,
    # built BLOCK-MINOR [264, 33x8 flat table-major, N] directly (a
    # [N,264] build + .T cost two materialized transposes per sector in
    # the op profile)
    offs_c = jnp.asarray(np.arange(-16, 17, dtype=np.int32))[:, None]
    sector_colors_t = []
    for sector in range(2):
        clamped = jnp.maximum(-counts[sector][None, :],
                              jnp.minimum(counts[sector][None, :], offs_c))
        mod_addend = (clamped[None, :, :]
                      * (2 * th_mods)[:, None, None]).reshape(K, n)
        quantized = []
        for ch in range(3):
            numer = jnp.maximum(
                0, (totals[sector][ch] * 2 + counts[sector] * 17)[None, :]
                + mod_addend)
            q = jnp.minimum(15, _div_exact_int(
                numer, (counts[sector] * 34)[None, :]))
            quantized.append(q)
        sector_colors_t.append((quantized[0] << 10) | (quantized[1] << 5)
                               | quantized[2])          # [264, N]

    # per-candidate-color per-pixel best error over the +-modifier signs,
    # computed BLOCK-MINOR ([8, 33, 16px, N]): the block axis is a full
    # lane tile and the pixel axis a full sublane tile, so neither the
    # error arrays nor the pair grid below pad (the former [N,8,33,33]
    # grid padded its minor 33 up to a 128-lane tile — ~4x wasted VPU
    # work — and ran 16 per-pixel fusions where one suffices).
    mod_kt = jnp.asarray(np.repeat(th_mods, n_offs))[:, None, None]

    def color_errors_t(pt):
        unq = [(pt >> ((2 - ch) * 5)) & 15 for ch in range(3)]
        unq = [((q << 4) | q)[:, None, :] for q in unq]  # [264,1,N]
        plus = [jnp.minimum(255, unq[ch] + mod_kt) for ch in range(3)]
        minus = [jnp.maximum(0, unq[ch] - mod_kt) for ch in range(3)]
        pix = [jnp.stack([pixels[px][ch] for px in range(16)],
                         axis=0)[None, :, :] for ch in range(3)]  # [1,16,N]
        pwp = [jnp.stack([pw[px][ch] for px in range(16)],
                         axis=0)[None, :, :] for ch in range(3)]
        e0 = compute_error(plus, pix, pwp, options)     # [264,16,N]
        e1 = compute_error(minus, pix, pwp, options)
        return jnp.minimum(e0, e1).reshape(8, n_offs, 16, n)

    errs0 = color_errors_t(sector_colors_t[0])          # [8,33,16,N]
    errs1 = color_errors_t(sector_colors_t[1])

    # unique ranks resetting at table boundaries (the reference dedups
    # consecutive candidates per table)
    def table_rank(ct):
        f = ct.reshape(8, n_offs, n)
        prev = jnp.concatenate(
            [jnp.full((8, 1, n), -1, dtype=jnp.int32), f[:, :-1, :]],
            axis=1)
        return jnp.cumsum((f != prev).astype(jnp.int32), axis=1) - 1

    u0 = table_rank(sector_colors_t[0])  # [8,33,N]
    u1 = table_rank(sector_colors_t[1])
    # The reference's combo walk (ETC.cpp:797-815) pre-increments index0,
    # so the (0,0) pair is only reached by wrapping -- which happens iff
    # sector 1 has exactly one unique color (then index1 clamps to 0).
    # With >1 unique colors in sector 1, (0,0) is never visited.
    nu1 = jnp.max(u1, axis=1) + 1  # [8,N] unique counts, sector 1

    # pair totals: broadcast accumulation over [8, 33(i1), 33(i0), N];
    # min(e1, e0) == where(e1 < e0, e1, e0) exactly (non-negative f32).
    # The one-pass (value, index) reduce is the grid's ONLY consumer, so
    # the whole 16-pixel chain fuses into it and is computed exactly
    # once, with no materialized pair grid (a barrier variant that
    # materialized the [8,33,33,N] grid measured 0.7 ms slower).
    total = None
    for px in range(16):
        e0k = errs0[:, None, :, px, :]
        e1k = errs1[:, :, None, px, :]
        t = jnp.minimum(e1k, e0k)
        total = t if total is None else total + t       # [8,33,33,N]

    skip = ((u0[:, None, :, :] == 0) & (u1[:, :, None, :] == 0)
            & (nu1[:, None, None, :] > 1))
    total = jnp.where(skip, INF, total)

    err, win = lanes.lex_min_with_index(total, (0, 1, 2))  # [N]
    table = win // (n_offs * n_offs)
    rem = win % (n_offs * n_offs)
    i1 = rem // n_offs
    i0 = rem % n_offs
    color0 = lanes.take_winner_t(sector_colors_t[0], table * n_offs + i0)
    color1 = lanes.take_winner_t(sector_colors_t[1], table * n_offs + i1)

    # winner's per-pixel decisions, recomputed on [N, 16] (pixel axis)
    modifier = lanes.take_winner(
        jnp.broadcast_to(jnp.asarray(th_mods)[None, :], (n, 8)), table)
    pix_s = [jnp.stack([pixels[px][ch] for px in range(16)], axis=1)
             for ch in range(3)]
    pw_s = [jnp.stack([pw[px][ch] for px in range(16)], axis=1)
            for ch in range(3)]

    def lane_errors(packed):
        unq = [(packed >> ((2 - ch) * 5)) & 15 for ch in range(3)]
        unq = [(q << 4) | q for q in unq]
        plus = [jnp.minimum(255, unq[ch] + modifier)[:, None]
                for ch in range(3)]
        minus = [jnp.maximum(0, unq[ch] - modifier)[:, None]
                 for ch in range(3)]
        e0 = compute_error(plus, pix_s, pw_s, options)
        e1 = compute_error(minus, pix_s, pw_s, options)
        return jnp.minimum(e0, e1), e1 < e0

    e0p, s0 = lane_errors(color0)
    e1p, s1 = lane_errors(color1)
    pick1 = e1p < e0p  # [N,16]
    bitrow = jnp.asarray((1 << np.arange(16)).astype(np.int32))[None, :]
    sector_bits = jnp.sum(jnp.where(pick1, bitrow, 0), axis=1)
    sign_bits = jnp.sum(jnp.where(jnp.where(pick1, s1, s0), bitrow, 0),
                        axis=1)

    hi, lo = _emit_hmode([color0, color1], sector_bits, sign_bits,
                         table, True, n)
    stage.update(err, rank_base, hi, lo, valid=jnp.isfinite(err))


def encode_planar(stage: StageBest, rank_base: int, pixels, pw,
                  options: Options):
    """EncodePlanar (ETC.cpp:1274-1663): algebraic least-squares plane fit."""
    n = pixels[0][0].shape[0]
    fake = bool(options.flags & Flags.ETC_USE_FAKE_BT709)
    uniform = bool(options.flags & Flags.UNIFORM)
    w = _weights(options)

    # Host-side constant normal matrix terms (pixel coordinates only).
    # The reference accumulates fho/fhv/fov TWICE per pixel through the
    # aliased references foh/fvh/fvo (ETC.cpp:1305-1327: `float &foh = fho;`
    # etc.), matching the 2x factors of the error-gradient system; fhh/fvv/
    # foo accumulate once.
    f = np.float32
    fhh = fho = fhv = foo = fov = fvv = f(0)
    for px in range(16):
        x, y = f(px % 4), f(px // 4)
        fhh = f(fhh + x * x)
        fhv = f(f(fhv + x * y) + y * x)
        fho = f(f(fho + x) + x)
        fvv = f(fvv + y * y)
        fov = f(f(fov + y) + y)
        foo = f(foo + 1)

    o = [None] * 3
    h = [None] * 3
    v = [None] * 3
    for ch in range(3):
        fh = jnp.zeros((n,), dtype=jnp.float32)
        fv = jnp.zeros((n,), dtype=jnp.float32)
        fo = jnp.zeros((n,), dtype=jnp.float32)
        for px in range(16):
            x, y = f(px % 4), f(px // 4)
            c = pw[px][ch] if fake else lanes.to_float(pixels[px][ch])
            # the reference subtracts c*x / c*y / c twice per pixel
            # (ETC.cpp:1330-1343) — the factor 2 folds into the derivatives
            fh = fh - c * x
            fv = fv - c * y
            fo = fo - c
            fh = fh - c * x
            fv = fv - c * y
            fo = fo - c

        d = f(2.0) * fhh
        e = fho
        ff = fhv
        g_d = fh
        i = fhv
        j = fov
        k = f(2.0) * fvv
        l_d = fv
        m = fho
        nn = f(2.0) * foo
        p = fov
        q_d = fo

        r0to1 = f(-i / d)
        r0to2 = f(-m / d)
        j1 = f(j + r0to1 * e)
        k1 = f(k + r0to1 * ff)
        l1_d = l_d + g_d * r0to1
        n1 = f(nn + r0to2 * e)
        p1 = f(p + r0to2 * ff)
        q1_d = q_d + g_d * r0to2
        r1to2 = f(-p1 / k1)
        n2 = f(n1 + r1to2 * j1)
        q2_d = q1_d + l1_d * r1to2
        o[ch] = exact_divide(-q2_d, jnp.full((n,), n2))
        r2to1 = f(-j1 / n2)
        l2_d = l1_d + q2_d * r2to1
        elim2 = f(-ff / k1)
        elim1 = f(-e / n2)
        g2_d = g_d + l2_d * elim2 + q2_d * elim1
        h[ch] = exact_divide(-g2_d, jnp.full((n,), d))
        v[ch] = exact_divide(-l2_d, jnp.full((n,), k1))

        h[ch] = h[ch] * f(4.0) + o[ch]
        v[ch] = v[ch] * f(4.0) + o[ch]

    best_coeffs = [[None] * 3 for _ in range(3)]  # [ch][o,h,v]
    total_error = jnp.zeros((n,), dtype=jnp.float32)

    if fake:
        o_rgb = convert_from_fake_bt709(o)
        h_rgb = convert_from_fake_bt709(h)
        v_rgb = convert_from_fake_bt709(v)
        for ch in range(3):
            fco = [o_rgb[ch], h_rgb[ch], v_rgb[ch]]
            for c in range(3):
                coeff = jnp.maximum(0.0, fco[c])
                if ch == 1:
                    coeff = jnp.minimum(f(127.0), coeff * f(127.0 / 255.0))
                else:
                    coeff = jnp.minimum(f(63.0), coeff * f(63.0 / 255.0))
                best_coeffs[ch][c] = lanes.round_and_convert_to_int_nearest(
                    coeff)
        recon = [[None] * 3 for _ in range(16)]
        for ch in range(3):
            d_o = _decode_planar_coeff(best_coeffs[ch][0], ch)
            d_h = _decode_planar_coeff(best_coeffs[ch][1], ch)
            d_v = _decode_planar_coeff(best_coeffs[ch][2], ch)
            h_m = d_h - d_o
            v_m = d_v - d_o
            addend = (d_o << 2) + 2
            for px in range(16):
                x, y = px % 4, px // 4
                interp = (x * h_m + y * v_m + addend) >> 2
                recon[px][ch] = jnp.minimum(255, jnp.maximum(0, interp))
        for px in range(16):
            total_error = total_error + compute_error(recon[px], pixels[px],
                                                      pw[px], options)
    else:
        cw_sq = [w[ch] * w[ch] for ch in range(3)]
        for ch in range(3):
            fco = [o[ch], h[ch], v[ch]]
            ranges = []
            for c in range(3):
                coeff = jnp.maximum(0.0, fco[c])
                if ch == 1:
                    coeff = jnp.minimum(f(127.0), coeff * f(127.0 / 255.0))
                else:
                    coeff = jnp.minimum(f(63.0), coeff * f(63.0 / 255.0))
                ranges.append((lanes.round_down_to_int(coeff),
                               lanes.round_up_to_int(coeff)))
            best_ch_err = jnp.full((n,), FLT_MAX, dtype=jnp.float32)
            for io in range(2):
                d_o = _decode_planar_coeff(ranges[0][io], ch)
                addend = (d_o << 2) + 2
                for ih in range(2):
                    d_h = _decode_planar_coeff(ranges[1][ih], ch)
                    h_m = d_h - d_o
                    for iv in range(2):
                        d_v = _decode_planar_coeff(ranges[2][iv], ch)
                        v_m = d_v - d_o
                        err = jnp.zeros((n,), dtype=jnp.float32)
                        for px in range(16):
                            x, y = px % 4, px // 4
                            interp = (x * h_m + y * v_m + addend) >> 2
                            dec = jnp.minimum(255, jnp.maximum(0, interp))
                            delta = lanes.to_float(pixels[px][ch] - dec)
                            err = err + delta * delta
                        better = err < best_ch_err
                        best_ch_err = jnp.minimum(err, best_ch_err)
                        for c, idx in ((0, io), (1, ih), (2, iv)):
                            src = ranges[c][idx]
                            best_coeffs[ch][c] = src if best_coeffs[ch][c] \
                                is None else jnp.where(better, src,
                                                       best_coeffs[ch][c])
            if not uniform:
                best_ch_err = best_ch_err * cw_sq[ch]
            total_error = total_error + best_ch_err

    hi, lo = _emit_planar(best_coeffs, n)
    stage.update(total_error, rank_base, hi, lo)


def _decode_planar_coeff(coeff, ch):
    """DecodePlanarCoeff (ETC.cpp:1266-1272)."""
    if ch == 1:
        return (coeff << 1) | (coeff >> 6)
    return (coeff << 2) | (coeff >> 4)


def _emit_planar(best_coeffs, n):
    """Planar block emission (ETC.cpp:1590-1660)."""
    ro, rh, rv = best_coeffs[0]
    go, gh, gv = best_coeffs[1]
    bo, bh, bv = best_coeffs[2]

    go1 = go >> 6
    go2 = go & 63
    bo1 = bo >> 5
    bo2 = (bo >> 3) & 3
    bo3 = bo & 7
    rh1 = rh >> 1
    rh2 = rh & 1

    fake_r = ro >> 2
    fake_dr = go1 | ((ro & 3) << 1)
    fake_g = go2 >> 2
    fake_dg = ((go2 & 3) << 1) | bo1
    fake_b = bo2
    fake_db = bo3 >> 1

    hi = jnp.zeros((n,), dtype=jnp.int32)
    hi = jnp.where(((fake_dr & 4) != 0) & (fake_r + fake_dr < 8),
                   hi | np.int32(-2147483648), hi)
    hi = jnp.where(((fake_dg & 4) != 0) & (fake_g + fake_dg < 8),
                   hi | (1 << (55 - 32)), hi)
    hi = jnp.where(fake_b + fake_db < 4, hi | (1 << (42 - 32)),
                   hi | (7 << (45 - 32)))
    hi = hi | (ro << (57 - 32)) | (go1 << (56 - 32)) | (go2 << (49 - 32)) \
        | (bo1 << (48 - 32)) | (bo2 << (43 - 32)) | (bo3 << (39 - 32)) \
        | (rh1 << (34 - 32)) | (1 << (33 - 32)) | (rh2 << (32 - 32))
    lo = (gh << 25) | (bh << 19) | (rv << 13) | (gv << 6) | bv
    return hi, lo


# --- Emission -------------------------------------------------------------------

PIXEL_SELECTOR_ORDER = np.array([0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7,
                                 11, 15], dtype=np.int32)
MODIFIER_CODES = np.array([3, 2, 0, 1], dtype=np.int32)


# --- Top-level drivers ----------------------------------------------------------

def chroma_side_axes(options: Options):
    """ETC2CompressionDataInternal ctor (ETC.cpp:3117-3145): weighted chroma
    axes, host-side float32 math."""
    f = np.float32
    cd = [f(options.red_weight), f(options.green_weight),
          f(options.blue_weight)]
    rot = [cd[1], cd[2], cd[0]]
    offs = f(-(rot[0] * cd[0] + rot[1] * cd[1] + rot[2] * cd[2])
             / (cd[0] * cd[0] + cd[1] * cd[1] + cd[2] * cd[2]))
    a0 = [f(rot[i] + cd[i] * offs) for i in range(3)]
    a1u = [f(a0[1] * cd[2] - a0[2] * cd[1]),
           f(a0[2] * cd[0] - a0[0] * cd[2]),
           f(a0[0] * cd[1] - a0[1] * cd[0])]
    l0 = f(a0[0] * a0[0] + a0[1] * a0[1] + a0[2] * a0[2])
    l1 = f(a1u[0] * a1u[0] + a1u[1] * a1u[1] + a1u[2] * a1u[2])
    ratio = f(np.sqrt(np.float64(l0 / l1)))  # std::sqrt on float promotes
    ratio = f(np.float32(np.sqrt(f(l0 / l1))))
    a1 = [f(a1u[i] * ratio) for i in range(3)]
    return a0, a1


def compress_etc1(pixels_u8, options: Options):
    """CompressETC1Block (ETC.cpp:2117-2126). Returns uint8 [N, 8]."""
    pixels, pw = extract_blocks(pixels_u8, options)
    n = pixels[0][0].shape[0]
    stage = StageBest(n)
    compress_etc1_internal(stage, 0, pixels, pw, options,
                           punchthrough_min_d=False)
    return stage.to_bytes()


def _sector_assignments(pixels, pw, options: Options, is_transparent,
                        num_opaque, punchthrough: bool):
    """Chroma-split sector assignment (CompressETC2Block, ETC.cpp:1723-1848)."""
    n = pixels[0][0].shape[0]
    chroma = [[None, None] for _ in range(16)]

    if options.flags & Flags.UNIFORM:
        cc3 = [[pixels[px][0] - pixels[px][2],
                pixels[px][0] - (pixels[px][1] << 1) + pixels[px][2]]
               for px in range(16)]
        centroid = [None, None]
        for px in range(16):
            for ch in range(2):
                centroid[ch] = cc3[px][ch] if centroid[ch] is None \
                    else centroid[ch] + cc3[px][ch]
        if punchthrough:
            for px in range(16):
                for ch in range(2):
                    chroma[px][ch] = lanes.to_float(
                        cc3[px][ch] * num_opaque - centroid[ch])
        else:
            for px in range(16):
                for ch in range(2):
                    chroma[px][ch] = lanes.to_float(
                        (cc3[px][ch] << 4) - centroid[ch])
        rcp_sqrt3 = np.float32(0.57735026918962576450914878050196)
        for px in range(16):
            chroma[px][1] = chroma[px][1] * rcp_sqrt3
    else:
        a0, a1 = chroma_side_axes(options)
        cc3 = []
        for px in range(16):
            p0, p1, p2 = pw[px]
            cc3.append([p0 * a0[0] + p1 * a0[1] + p2 * a0[2],
                        p0 * a1[0] + p1 * a1[1] + p2 * a1[2]])
        centroid = [None, None]
        for px in range(16):
            for ch in range(2):
                centroid[ch] = cc3[px][ch] if centroid[ch] is None \
                    else centroid[ch] + cc3[px][ch]
        if punchthrough:
            num_opaque_f = lanes.to_float(num_opaque)
            for px in range(16):
                for ch in range(2):
                    chroma[px][ch] = cc3[px][ch] * num_opaque_f - centroid[ch]
        else:
            for px in range(16):
                for ch in range(2):
                    chroma[px][ch] = cc3[px][ch] * np.float32(16.0) \
                        - centroid[ch]

    cov_xx = cov_yy = cov_xy = None
    for px in range(16):
        nx, ny = chroma[px]
        xx, yy, xy = nx * nx, ny * ny, nx * ny
        cov_xx = xx if cov_xx is None else cov_xx + xx
        cov_yy = yy if cov_yy is None else cov_yy + yy
        cov_xy = xy if cov_xy is None else cov_xy + xy

    half_trace = (cov_xx + cov_yy) * np.float32(0.5)
    det = cov_xx * cov_yy - cov_xy * cov_xy
    mm = exact_sqrt(jnp.maximum(np.float32(0.0),
                                half_trace * half_trace - det))
    ev = half_trace + mm
    dx = cov_yy - ev + cov_xy
    dy = -(cov_xx - ev + cov_xy)
    all_zero = (dx == 0.0) & (dy == 0.0)
    dx = jnp.where(all_zero, np.float32(1.0), dx)

    return [(chroma[px][0] * dx + chroma[px][1] * dy) < np.float32(0.0)
            for px in range(16)]


def compress_etc2(pixels_u8, options: Options, punchthrough_alpha: bool):
    """CompressETC2Block (ETC.cpp:1664-1887). Returns uint8 [N, 8]."""
    pixels, pw = extract_blocks(pixels_u8, options)
    n = pixels[0][0].shape[0]
    p = jnp.asarray(pixels_u8, dtype=jnp.int32)

    if punchthrough_alpha:
        f_thr = max(min(1.0, options.threshold), 0.0) * 255.0
        thr = int(np.floor(np.float32(f_thr) + 1.0))
        is_transparent = [p[:, px, 3] < thr for px in range(16)]
        any_transparent = is_transparent[0]
        all_transparent = is_transparent[0]
        for px in range(1, 16):
            any_transparent = any_transparent | is_transparent[px]
            all_transparent = all_transparent & is_transparent[px]
        # transparent pixels are zeroed (ETC.cpp:1705-1717)
        for px in range(16):
            for ch in range(3):
                pixels[px][ch] = jnp.where(is_transparent[px], 0,
                                           pixels[px][ch])
                pw[px][ch] = jnp.where(is_transparent[px], np.float32(0.0),
                                       pw[px][ch])
    else:
        is_transparent = [jnp.zeros((n,), dtype=bool) for _ in range(16)]
        any_transparent = jnp.zeros((n,), dtype=bool)
        all_transparent = jnp.zeros((n,), dtype=bool)

    num_opaque = 16 - sum(t.astype(jnp.int32) for t in is_transparent)

    stage = StageBest(n)

    # opaque stages (per-lane skipped when all-transparent)
    encode_planar(stage, 0, pixels, pw, options)
    sectors = _sector_assignments(pixels, pw, options, is_transparent,
                                  num_opaque, punchthrough_alpha)
    encode_tmode(stage, 1, sectors, pixels, pw, options)
    flipped = [~s for s in sectors]
    encode_tmode(stage, 2, flipped, pixels, pw, options)
    encode_hmode(stage, 3, flipped, pixels, pw, options)
    compress_etc1_internal(stage, 4, pixels, pw, options,
                           punchthrough_min_d=True)

    if punchthrough_alpha:
        # punchthrough restart: only lanes with any transparency run the
        # punchthrough stages (per-lane AnySet semantics, ETC.cpp:1866-1886)
        stage.reset_where(any_transparent)
        stage.lane_mask = any_transparent
        encode_virtual_tmode_punchthrough(
            stage, 10, sectors, pixels, pw, is_transparent, options)
        encode_virtual_tmode_punchthrough(
            stage, 11, flipped, pixels, pw, is_transparent, options)
        compress_etc1_punchthrough(stage, 12, pixels, pw, is_transparent,
                                   options)

    return stage.to_bytes()


def compress_etc2_punchthrough_only(pixels_u8, options: Options):
    """Punchthrough-only ETC2 program for blocks with >=1 transparent pixel.

    For any lane with transparency, CompressETC2Block discards every
    opaque-stage result (the bestError reset to FLT_MAX, ETC.cpp:1874) and
    the punchthrough stages always produce a finite error, so the encoded
    block is fully determined by the virtual-T and punchthrough-ETC1
    stages. The host dispatcher (api._etc2_pt_dispatch) routes blocks here
    by their transparency classification — the TPU-native analogue of the
    reference's group-level AnySet/AllSet stage skips (ETC.cpp:1849-1885)
    — which skips the (much larger) opaque candidate scan entirely.
    Opaque lanes (only ever padding) get valid-but-arbitrary output.
    Stage ranks match compress_etc2 so tie resolution is identical.
    """
    pixels, pw = extract_blocks(pixels_u8, options)
    n = pixels[0][0].shape[0]
    p = jnp.asarray(pixels_u8, dtype=jnp.int32)

    f_thr = max(min(1.0, options.threshold), 0.0) * 255.0
    thr = int(np.floor(np.float32(f_thr) + 1.0))
    is_transparent = [p[:, px, 3] < thr for px in range(16)]
    for px in range(16):
        for ch in range(3):
            pixels[px][ch] = jnp.where(is_transparent[px], 0,
                                       pixels[px][ch])
            pw[px][ch] = jnp.where(is_transparent[px], np.float32(0.0),
                                   pw[px][ch])
    num_opaque = 16 - sum(t.astype(jnp.int32) for t in is_transparent)

    stage = StageBest(n)
    sectors = _sector_assignments(pixels, pw, options, is_transparent,
                                  num_opaque, True)
    flipped = [~s for s in sectors]
    encode_virtual_tmode_punchthrough(
        stage, 10, sectors, pixels, pw, is_transparent, options)
    encode_virtual_tmode_punchthrough(
        stage, 11, flipped, pixels, pw, is_transparent, options)
    compress_etc1_punchthrough(stage, 12, pixels, pw, is_transparent,
                               options)
    return stage.to_bytes()


def compress_etc2_alpha(pixels_u8, options: Options):
    """CompressETC2AlphaBlock (ETC.cpp:1889-1900): 8-bit alpha plane."""
    p = jnp.asarray(pixels_u8, dtype=jnp.int32)
    pixels = [p[:, px, 3] for px in range(16)]
    return _compress_alpha_internal(pixels, False, False)


def compress_eac11(pixels_s16, is_signed: bool, options: Options):
    """CompressEACBlock (ETC.cpp:2087-2114): 11-bit single channel."""
    p = jnp.asarray(pixels_s16, dtype=jnp.int16).astype(jnp.int32)
    pixels = []
    for px in range(16):
        v = p[:, px]
        if is_signed:
            v = jnp.maximum(1, jnp.minimum(v, 1023) + 1024)
        else:
            v = jnp.maximum(0, jnp.minimum(v, 2047))
        pixels.append(v)
    return _compress_alpha_internal(pixels, True, is_signed)


def _compress_alpha_internal(pixels, is_11bit: bool, is_signed: bool):
    """CompressETC2AlphaBlockInternal (ETC.cpp:1902-2085).

    The reference's table(16) x range(10) x multiplier(2) loops become one
    320-wide candidate axis; its sequential strict-less update order
    (table-major) is reproduced by first-occurrence argmin."""
    n = pixels[0].shape[0]
    min_a = pixels[0]
    max_a = pixels[0]
    for px in range(1, 16):
        min_a = jnp.minimum(min_a, pixels[px])
        max_a = jnp.maximum(max_a, pixels[px])
    span = max_a - min_a
    mid2 = max_a + min_a

    mod_pos = etc_tables.ALPHA_MODIFIER_TABLE_POSITIVE
    rounding = etc_tables.alpha_rounding_tables()

    # static per-candidate parameters in visitation order
    cand_table = []
    cand_min_off = []
    cand_max_off = []
    cand_mult_off = []
    for table_index in range(16):
        for r in range(10):
            subrange = r % 3
            main_range = r // 3
            max_off = int(mod_pos[table_index][3 - main_range
                                               - (subrange & 1)])
            min_off = -int(mod_pos[table_index][3 - main_range
                                                - ((subrange >> 1) & 1)]) - 1
            for mult_off in range(2):
                cand_table.append(table_index)
                cand_min_off.append(min_off)
                cand_max_off.append(max_off)
                cand_mult_off.append(mult_off)
    cand_table = np.asarray(cand_table, dtype=np.int32)
    cand_min_off = np.asarray(cand_min_off, dtype=np.int32)
    cand_max_off = np.asarray(cand_max_off, dtype=np.int32)
    cand_mult_off = np.asarray(cand_mult_off, dtype=np.int32)
    off_span = cand_max_off - cand_min_off
    c = len(cand_table)

    span_b = span[:, None]
    min_mult = span_b // jnp.asarray(off_span)[None, :]
    if is_11bit:
        min_mult = jnp.minimum(min_mult, 112) & 120
    else:
        min_mult = jnp.maximum(jnp.minimum(min_mult, 14), 1)

    is_second = jnp.asarray((cand_mult_off == 1))[None, :]
    if is_11bit:
        mult = jnp.where(is_second, min_mult + 8, jnp.maximum(min_mult, 1))
    else:
        mult = jnp.where(is_second, min_mult + 1, min_mult)

    min_off_b = jnp.asarray(cand_min_off)[None, :]
    max_off_b = jnp.asarray(cand_max_off)[None, :]
    unclamped2 = mid2[:, None] - mult * max_off_b - mult * min_off_b

    if is_11bit:
        if is_signed:
            unclamped2 = unclamped2 + 8
        min_base2 = 16 if is_signed else 0
        clamped2 = jnp.minimum(jnp.maximum(unclamped2, min_base2), 4095)
        base = (clamped2 >> 1) & 2040
        if not is_signed:
            base = base + 4
    else:
        clamped2 = jnp.minimum(jnp.maximum(unclamped2, 0), 510)
        base = (clamped2 + 1) >> 1

    # per-candidate static lookup rows; lookups resolve via where-chains
    # over the 13 rounding entries / 4 modifier entries (XLA:TPU lowers
    # indexed takes to serial gathers - two per pixel here was ~300 ms of
    # the 305 ms EAC chunk time)
    rounding_rows = rounding[cand_table].astype(np.int32)  # [C, 13]
    mod_pos_rows = mod_pos[cand_table].astype(np.int32)     # [C, 4]

    total = jnp.zeros((n, c), dtype=jnp.int32)
    idx_list = []
    for px in range(16):
        value = pixels[px][:, None]
        offset = value - base
        about_reflector2 = offset + offset + mult
        abs_ar2 = jnp.abs(about_reflector2)
        lookup = (abs_ar2 >> 1) // jnp.maximum(mult, 1)
        lookup = jnp.minimum(lookup,
                             etc_tables.ALPHA_ROUNDING_TABLE_WIDTH - 1)
        pos_index = jnp.asarray(rounding_rows[:, 0])[None, :]
        pos_index = jnp.broadcast_to(pos_index, lookup.shape)
        for r in range(1, etc_tables.ALPHA_ROUNDING_TABLE_WIDTH):
            pos_index = jnp.where(
                lookup == r, jnp.asarray(rounding_rows[:, r])[None, :],
                pos_index)
        pos_offset = jnp.asarray(mod_pos_rows[:, 0])[None, :]
        pos_offset = jnp.broadcast_to(pos_offset, pos_index.shape)
        for r in range(1, 4):
            pos_offset = jnp.where(
                pos_index == r, jnp.asarray(mod_pos_rows[:, r])[None, :],
                pos_offset)
        sign_bits = about_reflector2 >> 31
        offset_unmult = pos_offset ^ sign_bits
        offset_value = base + offset_unmult * mult
        if is_11bit:
            lo = 1 if is_signed else 0
            q = jnp.minimum(2047, jnp.maximum(lo, offset_value))
        else:
            q = jnp.minimum(255, jnp.maximum(0, offset_value))
        d = q - value
        total = total + d * d  # wraps like the reference's i32
        idx_list.append(pos_index + 4 - (sign_bits & 4))

    best_err, win = lanes.lex_min_with_index(total, -1)

    def g(x):
        return lanes.take_winner(x, win)

    best_table = g(jnp.broadcast_to(jnp.asarray(cand_table)[None, :],
                                    total.shape))
    best_base = g(base)
    best_mult = g(mult)
    best_idx = [g(idx_list[px]) for px in range(16)]

    if is_11bit:
        best_mult = best_mult >> 3
        if is_signed:
            best_base = best_base ^ 0x80

    # emission (ETC.cpp:2049-2084)
    byte0 = best_base & 0xFF
    byte1 = (best_mult << 4) | best_table
    # 16 x 3-bit big-endian stream in pixelSelectorOrder
    ordered = [None] * 16
    for px in range(16):
        ordered[int(PIXEL_SELECTOR_ORDER[px])] = best_idx[px]
    stream_hi = jnp.zeros((n,), dtype=jnp.int32)  # bits for bytes 2..7
    stream_lo = jnp.zeros((n,), dtype=jnp.int32)
    for s in range(16):
        bitpos = 45 - 3 * s  # MSB-first 48-bit stream
        if bitpos >= 24:
            stream_hi = stream_hi | (ordered[s] << (bitpos - 24))
        elif bitpos >= 0:
            stream_lo = stream_lo | (ordered[s] << bitpos)
            if bitpos > 21:  # straddles the 24-bit boundary
                stream_hi = stream_hi | (ordered[s] >> (24 - bitpos))
        # (3-bit fields at bitpos 21..0 never straddle below 0)

    cols = [byte0, byte1]
    for k in range(3):
        cols.append((stream_hi >> (16 - 8 * k)) & 0xFF)
    for k in range(3):
        cols.append((stream_lo >> (16 - 8 * k)) & 0xFF)
    return jnp.stack(cols, axis=-1).astype(jnp.uint8)


def _quantize_etc2_alpha(table_index, value, base, mult, is_11bit, is_signed,
                         rounding, mod_pos):
    """QuantizeETC2Alpha (ETC.cpp:2366-2412)."""
    offset = value - base
    offset2 = offset + offset
    about_reflector2 = offset2 + mult
    abs_ar2 = jnp.abs(about_reflector2)
    lookup = (abs_ar2 >> 1) // jnp.maximum(mult, 1)
    lookup = jnp.minimum(lookup, etc_tables.ALPHA_ROUNDING_TABLE_WIDTH - 1)
    pos_index = jnp.take(rounding[table_index], lookup)
    pos_table = jnp.asarray(mod_pos[table_index])
    pos_offset = jnp.take(pos_table, pos_index)

    sign_bits = about_reflector2 >> 31  # 0 or -1
    offset_unmult = pos_offset ^ sign_bits
    quant_offset = offset_unmult * mult
    offset_value = base + quant_offset

    if is_11bit:
        lo = 1 if is_signed else 0
        q = jnp.minimum(2047, jnp.maximum(lo, offset_value))
    else:
        q = jnp.minimum(255, jnp.maximum(0, offset_value))

    index_sub = sign_bits & 4
    out_index = pos_index + 4 - index_sub
    return q, out_index


def encode_virtual_tmode_punchthrough(stage, rank_base, is_isolated_base,
                                      pixels, pw, is_transparent,
                                      options: Options):
    """EncodeVirtualTModePunchthrough (ETC.cpp:888-1264).

    The 8 modifier tables x 17 premultiplier steps form ONE flattened
    table-major candidate axis (K=136): every per-pixel error evaluation
    runs once over [N, K] instead of 8x over [N, 17], which both cuts the
    op count ~8x and fills the TPU's 128-lane registers (17-wide ops pad
    to 128 lanes at 13% utilization). first_argmin over the table-major
    axis reproduces the reference's (table, step) first-wins tie order
    exactly (the old per-table strict-less merge loop).
    """
    n = pixels[0][0].shape[0]
    fake = bool(options.flags & Flags.ETC_USE_FAKE_BT709)

    is_iso = [is_isolated_base[px] & ~is_transparent[px] for px in range(16)]
    is_line = [~is_isolated_base[px] & ~is_transparent[px]
               for px in range(16)]

    iso_total = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(3)]
    line_total = [jnp.zeros((n,), dtype=jnp.int32) for _ in range(3)]
    num_iso = jnp.zeros((n,), dtype=jnp.int32)
    num_line = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        for ch in range(3):
            iso_total[ch] = iso_total[ch] + jnp.where(is_iso[px],
                                                      pixels[px][ch], 0)
            line_total[ch] = line_total[ch] + jnp.where(is_line[px],
                                                        pixels[px][ch], 0)
        num_iso = num_iso + is_iso[px].astype(jnp.int32)
        num_line = num_line + is_line[px].astype(jnp.int32)

    divisors = num_iso * 34
    addend = (num_iso << 4) | num_iso
    th_mods = np.asarray(etc_tables.TH_MODIFIER_TABLE, dtype=np.int32)  # [8]
    # The reference scans 17 steps (ETC.cpp:1015), but step 16 always
    # clamps to the same +L candidate as step 15 for every lane with
    # num_line <= 15 — i.e. every lane with a transparent pixel, the only
    # lanes whose virtual-T result the caller keeps (opaque lanes are
    # masked out by compress_etc2's lane gate / discarded as padding in
    # the punchthrough-only program). Trailing duplicates never win a
    # first-wins argmin, so 16 steps give K = 8*16 = 128: one full TPU
    # register row with zero lane padding.
    n_steps = 16
    K = 8 * n_steps

    iso_avg_q = []
    iso_targets = []
    for ch in range(3):
        numerator = iso_total[ch] + iso_total[ch]
        if not fake:
            numerator = numerator + addend
        iso_avg_q.append(_div_exact_int(numerator, divisors))
        iso_targets.append(numerator)
    if fake:
        iso_avg_q = _resolve_th_fake_bt709(iso_avg_q, iso_targets, num_iso)

    # H-mode isolated colors for all 8 tables at once: [N, 8]
    h_iso_q = []
    for ch in range(3):
        off_total = iso_total[ch][:, None] + th_mods[None, :] * num_iso[:, None]
        h_num = (off_total + off_total) + addend[:, None]
        h_iso_q.append(jnp.minimum(15, _div_exact_int(h_num,
                                                      divisors[:, None])))

    iso_color = [(q) | (q << 4) for q in iso_avg_q]
    iso_error = []
    for px in range(16):
        e = compute_error(iso_color, pixels[px], pw[px], options)
        iso_error.append(jnp.where(is_transparent[px], np.float32(0.0), e))

    line_divisors = num_line * 34
    line_addend = (num_line << 4) | num_line

    opts_no_fake = Options(
        flags=options.flags & ~Flags.ETC_USE_FAKE_BT709,
        red_weight=options.red_weight, green_weight=options.green_weight,
        blue_weight=options.blue_weight)

    # premultiplier scan: -L..L step 2 per lane (ETC.cpp:1015-1044) --
    # the offsets share the parity of the lane's own line-pixel count
    # (clusterMinLine = -numPixelsLine in the scalar build). Steps past
    # +L clamp to +L, duplicating the last candidate (harmless for the
    # first-wins argmin, mirroring the reference's consecutive dedup).
    steps = jnp.asarray(np.arange(0, n_steps, dtype=np.int32))[None, :]
    clamped = jnp.minimum(num_line[:, None],
                          -num_line[:, None] + 2 * steps)  # [N, 17]
    mod_addend = (clamped[:, None, :]
                  * (2 * th_mods)[None, :, None]).reshape(n, K)

    quantized = []
    targets = []
    for ch in range(3):
        if fake:
            base = line_total[ch] * 2
        else:
            base = line_total[ch] * 2 + line_addend
        numer = jnp.maximum(0, base[:, None] + mod_addend)
        q = jnp.minimum(15, _div_exact_int(numer, line_divisors[:, None]))
        quantized.append(q)
        targets.append(numer)
    if fake:
        quantized = _resolve_th_fake_bt709(quantized, targets,
                                           num_line[:, None])
        quantized = [jnp.minimum(15, q) for q in quantized]
    # NOTE: punchthrough T packs channels reversed (r<<10) vs opaque T
    packed = (quantized[0] << 10) | (quantized[1] << 5) | quantized[2]

    # per-candidate static vectors over K
    mod_k = jnp.asarray(np.repeat(th_mods, n_steps))[None, :]       # [1,K]
    tlbz_k = jnp.asarray((np.repeat(np.arange(8), n_steps) & 1)
                         == 0)[None, :]                             # [1,K]

    def per_table_to_k(x):  # [N, 8] -> [N, K] (table-major)
        return jnp.broadcast_to(x[:, :, None],
                                (n, 8, n_steps)).reshape(n, K)

    h_q_k = [per_table_to_k(h_iso_q[ch]) for ch in range(3)]
    h_unq = [(q << 4) | q for q in h_q_k]
    h_color = [jnp.maximum(0, h_unq[ch] - mod_k) for ch in range(3)]
    packed_h2 = (h_q_k[0] << 10) | (h_q_k[1] << 5) | h_q_k[2]       # [N,K]

    h_errors = []
    for px in range(16):
        e = compute_error(h_color, [pixels[px][ch][:, None]
                                    for ch in range(3)],
                          [pw[px][ch][:, None] for ch in range(3)],
                          opts_no_fake)
        h_errors.append(jnp.where(is_transparent[px][:, None],
                                  np.float32(0.0), e))

    # per-candidate line colors (2 selectors: +M, -M)
    unq = [((packed >> (10 - ch * 5)) & 15) for ch in range(3)]
    unq = [(q << 4) | q for q in unq]
    line_colors = [
        [jnp.minimum(255, unq[ch] + mod_k) for ch in range(3)],
        [jnp.maximum(0, unq[ch] - mod_k) for ch in range(3)],
    ]

    t_err = None
    h_err = None
    line_best_err = []
    line_best_sel = []
    for px in range(16):
        pix = [pixels[px][ch][:, None] for ch in range(3)]
        pwp = [pw[px][ch][:, None] for ch in range(3)]
        e0 = compute_error(line_colors[0], pix, pwp, opts_no_fake)
        e1 = compute_error(line_colors[1], pix, pwp, opts_no_fake)
        # scalar LessOrEqual is `<` (ParallelMath.h:1589-1597)
        first_better = e0 < e1
        sel = jnp.where(first_better, 1, 3)
        le = jnp.minimum(e0, e1)
        le = jnp.where(is_transparent[px][:, None], np.float32(0.0), le)
        line_best_err.append(le)
        line_best_sel.append(sel)
        te = jnp.minimum(le, iso_error[px][:, None])
        he = jnp.minimum(le, h_errors[px])
        t_err = te if t_err is None else t_err + te
        h_err = he if h_err is None else h_err + he

    h_less = h_err < t_err
    h_must_zero = packed < packed_h2
    h_legal = h_must_zero == tlbz_k
    use_h = h_less & h_legal
    round_err = jnp.where(use_h, h_err, t_err)

    selectors = None
    for px in range(16):
        sel = line_best_sel[px]
        iso_px_err = jnp.where(use_h, h_errors[px], iso_error[px][:, None])
        iso_better = iso_px_err < line_best_err[px]
        sel = jnp.where(iso_better, 0, sel)
        sel = jnp.where(is_transparent[px][:, None], 2, sel)
        s = sel << (px * 2)
        selectors = s if selectors is None else selectors | s

    win_err, win = lanes.lex_min_with_index(round_err, -1)

    def g(x, win=win):
        return lanes.take_winner(x, win)

    best = dict(error=win_err, packed=g(packed),
                selectors=g(selectors), use_h=g(use_h), h2=g(packed_h2),
                table=win // n_steps)

    # emit: H-mode remap when use_h (ETC.cpp:1240-1260)
    line_color = [(best["packed"] >> (10 - ch * 5)) & 15 for ch in range(3)]
    t_hi, t_lo = _emit_tmode(line_color, iso_avg_q, best["selectors"],
                             best["table"], False, n)

    # selector remaps as bit math (no device table gathers):
    # sector [1,0,1,0] == (sel & 1) ^ 1; sign [1,0,0,1] == gray(sel) ^ 1
    sector_bits = jnp.zeros((n,), dtype=jnp.int32)
    sign_bits = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        sel = (best["selectors"] >> (px * 2)) & 3
        sector_bits = sector_bits | (((sel & 1) ^ 1) << px)
        sign_bits = sign_bits | ((((sel ^ (sel >> 1)) & 1) ^ 1) << px)
    h_hi, h_lo = _emit_hmode([best["packed"], best["h2"]], sector_bits,
                             sign_bits, best["table"], False, n)

    hi = jnp.where(best["use_h"], h_hi, t_hi)
    lo = jnp.where(best["use_h"], h_lo, t_lo)
    stage.update(best["error"], rank_base, hi, lo)


def compress_etc1_punchthrough(stage, rank_base, pixels, pw, is_transparent,
                               options: Options):
    """CompressETC1PunchthroughBlockInternal (ETC.cpp:2884-3058)."""
    n = pixels[0][0].shape[0]
    modifiers = np.asarray([8, 17, 29, 42, 60, 80, 106, 183], dtype=np.int32)

    for flip in range(2):
        sector_pixels = [[], []]
        sector_pw = [[], []]
        sector_cum = [[], []]
        sector_transparent = [[], []]
        for sector in range(2):
            cum = [None] * 3
            for px in range(8):
                src = int(FLIP_TABLES[flip][sector][px])
                sector_pixels[sector].append(pixels[src])
                sector_pw[sector].append(pw[src])
                sector_transparent[sector].append(is_transparent[src])
                for ch in range(3):
                    v = pixels[src][ch]
                    cum[ch] = v if cum[ch] is None else cum[ch] + v
            sector_cum[sector] = cum

        can_ignore = []
        for sector in range(2):
            ig = sector_transparent[sector][0]
            for px in range(1, 8):
                ig = ig & sector_transparent[sector][px]
            can_ignore.append(ig)

        diff_data = [None, None]
        n_offs = 17
        K = 8 * n_offs
        # flattened table-major candidate axis (see the virtual-T docstring:
        # one [N, 136] evaluation replaces 8 [N, 17] ones); candidate order
        # is identical to the former per-table concatenation, so
        # _resolve_differential and _unique_rank see the same layout.
        mod_k = jnp.asarray(np.repeat(modifiers, n_offs))[None, :]  # [1,K]
        table_k = jnp.asarray(np.repeat(np.arange(8, dtype=np.int32),
                                        n_offs))
        for sector in range(2):
            num_opaque = jnp.zeros((n,), dtype=jnp.int32)
            for px in range(8):
                num_opaque = num_opaque + sector_transparent[sector][
                    px].astype(jnp.int32)
            # NOTE: the reference counts *transparent* pixels into
            # sectorNumOpaque (ETC.cpp:2955-2957) — name notwithstanding —
            # replicated exactly.
            denom = jnp.maximum(1, num_opaque) << 8
            add = num_opaque << 7
            cum_max = 255 * num_opaque

            offs = np.arange(-8, 9, dtype=np.int32)  # om in [-8, 8]
            offs_b = jnp.asarray(offs)[None, :]
            clamped = jnp.maximum(-num_opaque[:, None],
                                  jnp.minimum(num_opaque[:, None], offs_b))
            offset = (clamped[:, None, :]
                      * jnp.asarray(modifiers)[None, :, None]).reshape(n, K)

            quant = []
            for ch in range(3):
                cu = jnp.minimum(
                    cum_max[:, None],
                    jnp.maximum(0, sector_cum[sector][ch][:, None] + offset))
                numer = (cu << 5) - cu + (cu >> 3) + add[:, None]
                quant.append(_div_exact_int(numer, denom[:, None]))
            packed = quant[0] | (quant[1] << 5) | (quant[2] << 10)  # [N,K]
            err, sel = _test_half_block_punchthrough(
                packed, sector_pixels[sector], sector_pw[sector],
                sector_transparent[sector], mod_k, options)

            diff_data[sector] = dict(
                error=err,
                color=packed,
                selectors=sel,
                table=jnp.broadcast_to(table_k[None, :], (n, K)),
                urank=_unique_rank(packed, 8, n_offs),
            )

        win = _resolve_differential(diff_data, n, stage.error,
                                    can_ignore=can_ignore)
        hi, lo = _emit_etc1(flip, 1, win, n, transparent=True)
        stage.update(win[0]["total"], rank_base + flip, hi, lo)


def _test_half_block_punchthrough(packed, sector_pixels, sector_pw,
                                  sector_transparent, modifier,
                                  options: Options):
    """TestHalfBlockPunchthrough (ETC.cpp:151-217), batched over the
    candidate axis; `modifier` is a per-candidate [1, K] int32 vector."""
    quant = [(packed >> (ch * 5)) & 31 for ch in range(3)]
    unquant = [(q << 3) | (q >> 2) for q in quant]
    modified = [
        [jnp.maximum(u, modifier) - modifier for u in unquant],
        [u for u in unquant],
        [jnp.minimum(u + modifier, 255) for u in unquant],
    ]

    selectors = None
    total = None
    for px in range(8):
        pix = [sector_pixels[px][ch][:, None] for ch in range(3)]
        pwp = [sector_pw[px][ch][:, None] for ch in range(3)]
        best_err = None
        best_sel = None
        for s in range(3):
            e = compute_error(modified[s], pix, pwp, options)
            if best_err is None:
                best_err = e
                best_sel = jnp.zeros_like(packed)
            else:
                better = e < best_err
                best_sel = jnp.where(better, s, best_sel)
                best_err = jnp.minimum(e, best_err)
        # remap selector (1->2, 2->3); transparent -> selector 1, error 0
        best_sel = jnp.minimum(3, best_sel << 1)
        tr = sector_transparent[px][:, None]
        best_err = jnp.where(tr, np.float32(0.0), best_err)
        best_sel = jnp.where(tr, 1, best_sel)
        total = best_err if total is None else total + best_err
        s_sh = best_sel << (px * 2)
        selectors = s_sh if selectors is None else selectors | s_sh
    return total, selectors


def _emit_etc1(flip: int, d: int, win, n, transparent: bool):
    """EmitETC1Block (ETC.cpp:2565-2622), vectorized. flip/d static here."""
    colors = [[(win[s]["color"] >> (ch * 5)) & 31 for ch in range(3)]
              for s in range(2)]
    hi = jnp.zeros((n,), dtype=jnp.int32)
    if d == 0:
        shifts = [(28, 24), (20, 16), (12, 8)]
        for ch, (s0, s1) in enumerate(shifts):
            hi = hi | (colors[0][ch] << s0) | (colors[1][ch] << s1)
    else:
        shifts = [(27, 24), (19, 16), (11, 8)]
        for ch, (s0, s1) in enumerate(shifts):
            hi = hi | (colors[0][ch] << s0) \
                | (((colors[1][ch] - colors[0][ch]) & 7) << s1)
    hi = hi | (win[0]["table"] << 5) | (win[1]["table"] << 2)
    if not transparent:
        hi = hi | (d << 1)
    hi = hi | flip

    # unpack selectors to full-block order, remap to modifier codes
    # MODIFIER_CODES [3,2,0,1] as bit math (no device table gathers):
    # out_hi = ~s_hi, out_lo = ~gray(s)
    unpacked = [None] * 16
    for sector in range(2):
        sel = win[sector]["selectors"]
        for px in range(8):
            dst = int(FLIP_TABLES[flip][sector][px])
            s = (sel >> (2 * px)) & 3
            unpacked[dst] = ((((s >> 1) ^ 1) << 1)
                             | (((s ^ (s >> 1)) & 1) ^ 1))

    lo = jnp.zeros((n,), dtype=jnp.int32)
    for sb in range(2):
        for px in range(16):
            src = int(PIXEL_SELECTOR_ORDER[px])
            lo = lo | (((unpacked[src] >> sb) & 1) << (px + sb * 16))
    return hi, lo


def _emit_tmode(line_color, isolated_color, selectors, table, opaque, n):
    """EmitTModeBlock (ETC.cpp:2414-2460). line/isolated: 3 arrays of 4-bit
    (line) / 4-bit (isolated) channel values (isolated may be 5-bit when
    called from H-mode fallback)."""
    hi = jnp.zeros((n,), dtype=jnp.int32)
    rh = (isolated_color[0] >> 2) & 3
    rl = isolated_color[0] & 3
    overflow_low = (rh + rl) < 4
    hi = jnp.where(overflow_low, hi | (1 << (58 - 32)), hi | np.int32(-536870912))
    hi = hi | (rh << (59 - 32)) | (rl << (56 - 32))
    hi = hi | (isolated_color[1] << (52 - 32)) | (isolated_color[2] << (48 - 32))
    hi = hi | (line_color[0] << (44 - 32)) | (line_color[1] << (40 - 32)) \
        | (line_color[2] << (36 - 32))
    hi = hi | (((table >> 1) & 3) << (34 - 32))
    if opaque:
        hi = hi | (1 << (33 - 32))
    hi = hi | ((table & 1) << (32 - 32))

    lo = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        sel = (selectors >> (2 * int(PIXEL_SELECTOR_ORDER[px]))) & 3
        lo = lo | ((sel & 1) << px) | (((sel >> 1) & 1) << (16 + px))
    return hi, lo


def _emit_hmode(block_colors, sector_bits, sign_bits, table, opaque, n):
    """EmitHModeBlock (ETC.cpp:2462-2563), incl. the equal-colors T-mode
    fallback, vectorized with a select."""
    same = block_colors[0] == block_colors[1]

    # T-mode fallback for equal colors
    t_line = [(block_colors[0] >> sh) & 0x1F for sh in (10, 5, 0)]
    t_sel = jnp.full((n,), 0x55555555, dtype=jnp.int32)
    for px in range(16):
        t_sel = t_sel | (((sign_bits >> px) & 1) << (px * 2 + 1))
    t_hi, t_lo = _emit_tmode(t_line, t_line, t_sel, table, opaque, n)

    colors = [[(block_colors[s] >> ((2 - ch) * 5)) & 15 for ch in range(3)]
              for s in range(2)]
    swap = ((table & 1) == 1) != (block_colors[0] > block_colors[1])
    c = [[jnp.where(swap, colors[1][ch], colors[0][ch]) for ch in range(3)],
         [jnp.where(swap, colors[0][ch], colors[1][ch]) for ch in range(3)]]
    sector_bits = jnp.where(swap, sector_bits ^ 0xFFFF, sector_bits)

    r1 = c[0][0]
    g1a = c[0][1] >> 1
    g1b = c[0][1] & 1
    b1a = c[0][2] >> 3
    b1b = c[0][2] & 7
    r2, g2, b2 = c[1][0], c[1][1], c[1][2]

    hi = jnp.zeros((n,), dtype=jnp.int32)
    hi = jnp.where(((g1a & 4) != 0) & (r1 + g1a < 8),
                   hi | np.int32(-2147483648), hi)
    fake_dg = b1b >> 1
    fake_g = b1a | (g1b << 1)
    hi = jnp.where(fake_g + fake_dg < 4, hi | (1 << (50 - 32)),
                   hi | (7 << (53 - 32)))
    da = (table >> 2) & 1
    db = (table >> 1) & 1
    hi = hi | (r1 << (59 - 32)) | (g1a << (56 - 32)) | (g1b << (52 - 32)) \
        | (b1a << (51 - 32)) | (b1b << (47 - 32)) | (r2 << (43 - 32)) \
        | (g2 << (39 - 32)) | (b2 << (35 - 32)) | (da << (34 - 32)) \
        | (db << (32 - 32))
    if opaque:
        hi = hi | (1 << (33 - 32))

    lo = jnp.zeros((n,), dtype=jnp.int32)
    for px in range(16):
        src = int(PIXEL_SELECTOR_ORDER[px])
        lo = lo | (((sign_bits >> src) & 1) << px) \
            | (((sector_bits >> src) & 1) << (16 + px))

    return jnp.where(same, t_hi, hi), jnp.where(same, t_lo, lo)
