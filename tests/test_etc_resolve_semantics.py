"""Pins the ETC1 differential-combination resolve semantics against an
independent sequential transcription of the reference scan.

FindBestDifferentialCombination (ETC.cpp:219-362) is a sequential scan
whose acceptance test is `err1 < fl32(runningBest - err0)` — NOT a pure
total-error argmin: when fl32(e0+e1) rounds up above the exact sum, a
later equal-total pair re-replaces the winner (observed on the quality
corpus: a 1-block ETC2 divergence where two pairs had identical (e0,e1)
and the scan committed the LAST one). models/etc._resolve_differential
reproduces this densely (fast path + first achiever + re-acceptance
set); this test cross-checks that formulation against a straight
pure-NumPy sequential emulation on tie-prone candidate sets, with no
JAX and no oracle involved, so a resolve-semantics regression is
localized here instead of surfacing as an end-to-end golden diff.
"""

import numpy as np

from convectionkernels_tpu.tables import etc_tables

f32 = np.float32
MODS = np.asarray(etc_tables.ETC1_MODIFIER_TABLES)  # [8, 4]
# reference default weights (ConvectionKernels.h:92-95, f32 divisions)
W = (f32(np.float32(0.2125) / np.float32(0.7154)), f32(1.0),
     f32(np.float32(0.0721) / np.float32(0.7154)))
FLIP0 = [[0, 1, 4, 5, 8, 9, 12, 13], [2, 3, 6, 7, 10, 11, 14, 15]]

# The quality-corpus block that exposed the re-acceptance quirk
# (detail image, block 9): two sector-0 candidates (table 1 and table 3)
# with bit-identical (e0, e1); the scan commits table 3.
CORPUS_BLOCK_9 = np.array(
    [[141, 194, 105], [141, 192, 101], [143, 188, 98], [143, 180, 95],
     [141, 192, 106], [141, 191, 102], [143, 188, 96], [141, 181, 92],
     [141, 191, 108], [141, 192, 102], [143, 191, 95], [139, 186, 90],
     [145, 193, 107], [143, 194, 101], [142, 195, 95], [139, 191, 90]],
    dtype=np.uint8)


def gen_attempts(pix8):
    """Differential candidates for one sector in the reference's push
    order (table-major, offsets, adjacent-dedup): quantization per
    ETC.cpp:2718-2735, TestHalfBlock error per ETC.cpp:94-149 (f32)."""
    cum = pix8.astype(np.int64).sum(0)
    errs, cols, tabs = [], [], []
    pw = pix8.astype(f32) * np.array(W, f32)[None]
    for t in range(8):
        last = None
        for o in etc_tables.potential_offsets(t):
            cu = np.clip(cum + o, 0, 2040)
            q = ((cu << 5) - cu + (cu >> 3) + 1024) >> 11
            col = int(q[0] | (q[1] << 5) | (q[2] << 10))
            if col == last:
                continue
            last = col
            unq = (q << 3) | (q >> 2)
            tot = f32(0)
            for p in range(8):
                best = f32(np.inf)
                for s in range(4):
                    err = f32(0)
                    for ch in range(3):
                        m = int(np.clip(unq[ch] + MODS[t, s], 0, 255))
                        d = f32(f32(m) * W[ch] - pw[p, ch])
                        err = f32(err + f32(d * d))
                    if err < best:
                        best = err
                tot = f32(tot + best)
            errs.append(tot)
            cols.append(col)
            tabs.append(t)
    return np.array(errs, f32), np.array(cols), np.array(tabs)


def legal(c0, c1):
    for sh in (0, 5, 10):
        d = ((c1 >> sh) & 31) - ((c0 >> sh) & 31)
        if not -5 < d < 4:
            return False
    return True


def sequential_scan(e0, c0, e1, c1, best_in):
    """Straight transcription of the reference scan's control flow."""
    def firstmin(e):
        b, bi = f32(np.inf), -1
        for k in range(len(e)):
            if e[k] < b:
                b, bi = e[k], k
        return b, bi

    bd0, bi0 = firstmin(e0)
    bd1, bi1 = firstmin(e1)
    win, best = None, best_in
    if f32(bd0 + bd1) < best:
        if legal(int(c0[bi0]), int(c1[bi1])):
            return (bi0, bi1, f32(bd0 + bd1))
        idx0 = sorted((i for i in range(len(e0)) if e0[i] < best_in),
                      key=lambda a: (e0[a], a))
        idx1 = sorted((j for j in range(len(e1)) if e1[j] < best_in),
                      key=lambda a: (e1[a], a))
        for i in idx0:
            if e0[i] >= best:
                break
            maxe1 = f32(best - e0[i])
            if maxe1 < bd1:
                break
            for j in idx1:
                if e1[j] >= maxe1:
                    break
                if legal(int(c0[i]), int(c1[j])):
                    best = f32(e0[i] + e1[j])
                    win = (i, j, best)
                    break
    return win


def dense_resolve(e0, c0, e1, c1, best_in):
    """NumPy restatement of _resolve_differential's winner selection
    (fast path + first achiever + re-acceptance override)."""
    leg = np.array([[legal(int(a), int(b)) for b in c1] for a in c0])
    e1b = np.where(leg, e1[None, :], np.inf).astype(f32)
    mine1 = e1b.min(1).astype(f32)
    minj = np.argmin(e1b, axis=1)
    total = (e0 + mine1).astype(f32)
    tmin = total.min()
    if not np.isfinite(tmin):
        return None
    cand = np.where(total == tmin)[0]
    first = cand[e0[cand] == e0[cand].min()][0]
    wini = first
    reacc = np.where(mine1 < (f32(tmin) - e0).astype(f32))[0]
    if len(reacc):
        wini = reacc[e0[reacc] == e0[reacc].max()][-1]

    def firstmin(e):
        b, bi = f32(np.inf), -1
        for k in range(len(e)):
            if e[k] < b:
                b, bi = e[k], k
        return b, bi

    bd0, bi0 = firstmin(e0)
    bd1, bi1 = firstmin(e1)
    if f32(bd0 + bd1) < best_in and legal(int(c0[bi0]), int(c1[bi1])):
        wini = bi0
    return (int(wini), int(minj[wini]), f32(e0[wini] + mine1[wini]))


def _check_block(blk_rgb):
    s0, s1 = blk_rgb[FLIP0[0]], blk_rgb[FLIP0[1]]
    e0, c0, t0 = gen_attempts(s0)
    e1, c1, t1 = gen_attempts(s1)
    best_in = f32(f32(e0.min() + e1.min()) * f32(1.5) + f32(1.0))
    seq = sequential_scan(e0, c0, e1, c1, best_in)
    den = dense_resolve(e0, c0, e1, c1, best_in)
    if seq is None:
        return True
    si, sj, st = seq
    di, dj, dt = den
    return (int(c0[si]) == int(c0[di]) and int(t0[si]) == int(t0[di])
            and int(c1[sj]) == int(c1[dj]) and int(t1[sj]) == int(t1[dj])
            and st == dt)


def test_corpus_block9_reacceptance():
    """The originally-diverging block: the re-acceptance path must fire
    (the sequential winner differs from the naive total-lex argmin)."""
    blk = CORPUS_BLOCK_9
    e0, c0, t0 = gen_attempts(blk[FLIP0[0]])
    e1, c1, t1 = gen_attempts(blk[FLIP0[1]])
    best_in = f32(81.27302)  # individual-mode total for flip 0
    seq = sequential_scan(e0, c0, e1, c1, best_in)
    assert seq is not None
    assert int(t0[seq[0]]) == 3, "tie re-acceptance must commit table 3"
    assert _check_block(blk)


def test_tie_prone_corpora_match_sequential():
    rng = np.random.default_rng(2026)
    bad = 0
    blocks = []
    for _ in range(12):  # 2-color palettes: maximal duplicate-error ties
        pal = rng.integers(0, 256, (2, 3))
        blocks.append(pal[rng.integers(0, 2, 16)].astype(np.uint8))
    for _ in range(12):  # grayscale-ish: channel-coincident errors
        g = rng.integers(0, 256, (16, 1))
        blocks.append(np.clip(g + rng.integers(-3, 4, (16, 3)),
                              0, 255).astype(np.uint8))
    for _ in range(12):  # midrange noise (the corpus detail-image class)
        base = rng.integers(100, 140, (1, 3))
        blocks.append(np.clip(base + rng.integers(-40, 41, (16, 3)),
                              0, 255).astype(np.uint8))
    for blk in blocks:
        if not _check_block(blk):
            bad += 1
    assert bad == 0
