"""Pure-NumPy single-block emulation of reference scalar paths, used only to
debug divergences between the JAX encoders and the CVTT scalar oracle.
Transcribes the scalar semantics (float32 ops, floor(x+0.5) rounding)."""

import numpy as np

f32 = np.float32


def rnd(v):
    return int(np.floor(f32(v) + f32(0.5)))


def clampf(v, lo, hi):
    return max(min(f32(v), f32(hi)), f32(lo))


def tweak_factors(tweak, range_):
    total = range_ - 1
    mn = (tweak >> 1) & 1
    mx = tweak & 1
    inside = total - mn - mx
    return (-f32(mn) / f32(inside), f32(mx) / f32(inside) + f32(1.0))


WEIGHT_RECIP = (0, 0, 32768, 16384, 10923, 8192, 6554, 5461, 4681, 4096,
                3641, 3277, 2979, 2731, 2521, 2341, 2185)


class Sel1:
    """IndexSelector<1> scalar."""

    def __init__(self, ep, range_):
        self.range = range_
        self.max_value = f32(range_ - 1)
        self.ep = ep
        self.origin = f32(ep[0])
        diff = f32(f32(ep[1]) - self.origin) * f32(1.0)
        lensq = f32(diff * diff)
        if lensq == 0.0:
            lensq = f32(1.0)
        self.axis = f32(f32(diff * f32(1.0)) * f32(self.max_value / lensq))

    def select(self, px):
        dist = f32(f32(f32(px) - self.origin) * self.axis)
        return rnd(clampf(dist, 0.0, self.max_value))

    def recon_precise(self, idx):
        w = (WEIGHT_RECIP[self.range] * idx + 64) >> 7
        return ((256 - w) * self.ep[0] + w * self.ep[1] + 128) >> 8


class Refiner1:
    def __init__(self, range_):
        self.tv = f32(0.0)
        self.v = f32(0.0)
        self.tt = f32(0.0)
        self.t = f32(0.0)
        self.w = f32(0.0)
        self.wu = 0
        self.rcp_max = f32(f32(1.0) / f32(range_ - 1))

    def contribute_unweighted(self, val, idx):
        t = f32(f32(idx) * self.rcp_max)
        v = f32(val)
        self.tv = f32(self.tv + f32(t * v))
        self.v = f32(self.v + v)
        self.tt = f32(self.tt + f32(t * t))
        self.t = f32(self.t + t)
        self.wu += 1

    def refined_ldr(self):
        w = f32(self.w + f32(self.wu))
        if w == 0.0:
            w = f32(1.0)
        wrcp = f32(f32(1.0) / w)
        adenom = f32(f32(f32(self.tt * w) - f32(self.t * self.t)) * wrcp)
        azero = adenom == 0.0
        if azero:
            adenom = f32(1.0)
        a = f32(f32(self.tv - f32(f32(self.t * self.v) * wrcp)) / adenom)
        b = f32(f32(self.v - f32(a * self.t)) * wrcp)
        p1, p2 = b, f32(a + b)
        if azero:
            p1 = f32(self.v * wrcp)
            p2 = p1
        return (rnd(clampf(p1, 0.0, 255.0)), rnd(clampf(p2, 0.0, 255.0)))


def pack_interpolated_alpha_block(values, is_signed=False, max_tweak=4,
                                  refine_rounds=8, trace=None):
    """Returns (best_is_full_range, best_ep, best_indexes). values: 16 ints."""
    high_terminal = 254 if is_signed else 255
    pixels = [min(v, high_terminal) if is_signed else v for v in values]
    spx = sorted(pixels)

    best = {"err": np.float32(3.4028234663852886e38), "full": 0,
            "ep": [0, 0], "idx": [0] * 16}

    def consider(err, full, ep, idx, tag):
        if trace is not None:
            trace.append((tag, float(err), full, list(ep), list(idx)))
        if err < best["err"]:
            best["err"] = min(err, best["err"])
            best["full"] = full
            best["ep"] = list(ep)
            best["idx"] = list(idx)

    # full precision
    base, offs = f32(spx[0]), f32(spx[15] - spx[0])
    for tweak in range(min(4, max_tweak)):
        tf = tweak_factors(tweak, 8)
        ep = [rnd(clampf(f32(base + f32(offs * tf[0])), 0.0, 255.0)),
              rnd(clampf(f32(base + f32(offs * tf[1])), 0.0, 255.0))]
        for refine in range(refine_rounds):
            if is_signed:
                ep = [min(e, high_terminal) for e in ep]
            sel = Sel1(ep, 8)
            ref = Refiner1(8)
            agg = 0
            idx = []
            for px in range(16):
                i = sel.select(pixels[px])
                r = sel.recon_precise(i)
                agg += (r - pixels[px]) ** 2
                if refine != refine_rounds - 1:
                    ref.contribute_unweighted(pixels[px], i)
                idx.append(i)
            consider(f32(agg), 1, ep, idx, f"full t{tweak} r{refine}")
            if refine != refine_rounds - 1:
                ep = list(ref.refined_ldr())

    # reduced precision
    bh_min, bh_max = spx[0], spx[15]
    clearance = min(bh_min, high_terminal - bh_max)
    can_clip = clearance * 20 < bh_max - bh_min  # (c<<2)+(c<<4) < range
    if can_clip:
        low_cl = [0] + [spx[i - 1] for i in range(1, 16)]
        high_cl = [0] + [high_terminal - spx[16 - i] for i in range(1, 16)]
        for first in range(16):
            for last in range(first, 16):
                nskip = first + (15 - last)
                if nskip <= 0:
                    continue
                cl = max(high_cl[15 - last], low_cl[first])
                if cl * 20 < spx[last] - spx[first]:
                    bh_min, bh_max = spx[first], spx[last]

    bs_min, bs_max = 1, high_terminal - 1
    for px in range(16):
        if spx[15 - px] > 0:
            bs_min = spx[15 - px]
        if spx[px] < high_terminal:
            bs_max = spx[px]

    for mn in (bs_min, bh_min):
        for mx in (bs_max, bh_max):
            base, offs = f32(mn), f32(mx - mn)
            for tweak in range(min(4, max_tweak)):
                tf = tweak_factors(tweak, 8)
                ep = [rnd(clampf(f32(base + f32(offs * tf[0])), 0.0, 255.0)),
                      rnd(clampf(f32(base + f32(offs * tf[1])), 0.0, 255.0))]
                for refine in range(refine_rounds):
                    if is_signed:
                        ep = [min(e, high_terminal) for e in ep]
                    sel = Sel1(ep, 6)
                    ref = Refiner1(6)
                    err = f32(0.0)
                    idx = []
                    for px in range(16):
                        si = sel.select(pixels[px])
                        r = sel.recon_precise(si)
                        e0 = f32((0 - pixels[px]) ** 2)
                        e255 = f32((high_terminal - pixels[px]) ** 2)
                        es = f32((r - pixels[px]) ** 2)
                        bpe = e0
                        i = 6
                        if e255 < bpe:
                            i = 7
                        bpe = min(bpe, e255)
                        sel_better = es < bpe
                        if sel_better and refine != refine_rounds - 1:
                            ref.contribute_unweighted(pixels[px], si)
                        if sel_better:
                            i = si
                        bpe = min(bpe, es)
                        err = f32(err + bpe)
                        idx.append(i)
                    consider(err, 0, ep,
                             idx, f"red {mn},{mx} t{tweak} r{refine}")
                    if refine != refine_rounds - 1:
                        ep = list(ref.refined_ldr())

    return best
