#!/usr/bin/env python3
"""Pin the Prophet forecaster's SEEDED Monte-Carlo intervals exactly.

`gen_prophet_fixture.py` validates the interval ALGORITHM statistically
(quasi-exact quantiles + replicate-spread tolerance, because prophet
itself is unseeded). This fixture pins the engine's fixed-seed MC path
DETERMINISTICALLY: it reimplements java.util.Random (the 48-bit LCG,
nextDouble, Marsaglia-polar nextGaussian) in Python, replays
TrendSim.draw(seed=42) draw-for-draw (per sample: Knuth/normal-approx
Poisson for the future-changepoint count, uniform changepoints, Laplace
deltas, one Gaussian observation noise — in the Scala evaluation
order), and computes the per-date band edges with the same
base + dev*y_scale + noise*y_scale arithmetic and linear-interpolation
percentile. Every value in the fixture is therefore the EXACT number
the Scala scorer must produce, up to cross-language libm differences:

  - the RNG stream itself (first sample's draws are stored raw) is
    pure 48-bit integer arithmetic -> bit-equal, tolerance 1e-12;
  - band edges include the closed-form yhat base (independently pinned
    at 1e-6 by the prophet fixture) and log/sqrt (<=1 ulp apart
    between fdlibm and libm) -> tolerance 1e-4 absolute, dominated by
    the yhat cross-check, documented in MlScorerSpec.

The engine's divergence from prophet (fixed seed vs unseeded RNG) is
documented in ProphetScorer; THIS fixture makes that seed the model's
last pinned parameter instead of a free one.

Usage: python3 tools/gen_mc_seeded_fixture.py \
           src/main/resources/prophet_model.json \
           src/test/resources/prophet_mc_seeded_fixture.json
"""
import json
import math
import sys

import numpy as np

from gen_prophet_fixture import load_model, yhat

DAYS = 30
SEED = 42
ROWS = [0, 14, 29]  # first / middle / last forecast day


class JavaRandom:
    """java.util.Random: 48-bit LCG + Marsaglia polar gaussian."""

    MULT = 0x5DEECE66D
    ADD = 0xB
    MASK = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ self.MULT) & self.MASK
        self.have_g = False
        self.next_g = 0.0

    def _next(self, bits):
        self.seed = (self.seed * self.MULT + self.ADD) & self.MASK
        return self.seed >> (48 - bits)

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self):
        if self.have_g:
            self.have_g = False
            return self.next_g
        while True:
            v1 = 2.0 * self.next_double() - 1.0
            v2 = 2.0 * self.next_double() - 1.0
            s = v1 * v1 + v2 * v2
            if 0.0 < s < 1.0:
                break
        mult = math.sqrt(-2.0 * math.log(s) / s)
        self.next_g = v2 * mult
        self.have_g = True
        return v1 * mult


def poisson(rng, lam):
    # TrendSim.poisson: Knuth for small lambda, normal approx above 30
    if lam > 30:
        # Java Math.round(double) = floor(x + 0.5)
        return max(0, math.floor(lam + math.sqrt(lam) * rng.next_gaussian()
                                 + 0.5))
    l = math.exp(-lam)
    k, p = 0, 1.0
    while True:
        p *= rng.next_double()
        if p <= l:
            return k
        k += 1


def laplace(rng, b):
    u = rng.next_double() - 0.5
    return -b * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))


def draw(m, horizon_t, seed, n_samples):
    """TrendSim.draw, draw-for-draw."""
    rng = JavaRandom(seed)
    lam = float(np.abs(m["delta"]).sum()) / len(m["delta"]) + 1e-8
    n_cp = len(m["changepoints_t"])
    sims = []
    for _ in range(n_samples):
        n_new = poisson(rng, n_cp * (horizon_t - 1.0)) if horizon_t > 1.0 \
            else 0
        cps = [1.0 + rng.next_double() * (horizon_t - 1.0)
               for _ in range(n_new)]
        dls = [laplace(rng, lam) for _ in range(n_new)]
        noise = rng.next_gaussian() * m["sigma_obs"]
        sims.append((cps, dls, noise))
    return sims


def percentile(sorted_vals, q):
    # TrendSim.percentile: linear interpolation
    idx = q * (len(sorted_vals) - 1)
    lo = int(idx)
    if lo >= len(sorted_vals) - 1:
        return sorted_vals[-1]
    return sorted_vals[lo] + (idx - lo) * (sorted_vals[lo + 1]
                                           - sorted_vals[lo])


def main(model_path, out_path):
    m = load_model(model_path)
    n_samples = m.get("uncertainty_samples", 1000)
    end = np.datetime64(m["history_end"])
    epoch_end_sec = ((end + DAYS).astype("datetime64[s]")
                     .astype(np.int64).astype(float))
    horizon_t = (epoch_end_sec - m["start"]) / m["t_scale"]
    sims = draw(m, horizon_t, SEED, n_samples)

    rows = []
    for i in ROWS:
        ds = end + (i + 1)
        epoch = float(ds.astype("datetime64[s]").astype(np.int64))
        base = float(yhat(m, np.array([epoch]))[0])
        t = (epoch - m["start"]) / m["t_scale"]
        draws = []
        for cps, dls, noise in sims:
            dev = 0.0
            for cp, dl in zip(cps, dls):
                if cp <= t:
                    dev += dl * (t - cp)
            draws.append(base + dev * m["y_scale"] + noise * m["y_scale"])
        draws.sort()
        lo_q = (1.0 - m["interval_width"]) / 2.0
        rows.append({"ds": str(ds), "yhat_lower": percentile(draws, lo_q),
                     "yhat_upper": percentile(draws, 1.0 - lo_q)})

    # raw first-sample draws: the exact-RNG-stream pin (pure integer
    # LCG arithmetic on both sides except the gaussian's log/sqrt)
    cps0, dls0, noise0 = sims[0]
    fixture = {
        "seed": SEED, "days": DAYS, "uncertainty_samples": n_samples,
        "horizon_t": horizon_t,
        "stream_sample0": {"n_new": len(cps0), "cps": cps0, "deltas": dls0,
                           "noise": noise0},
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"wrote {out_path}: horizon_t={horizon_t:.4f}, "
          f"sample0 n_new={len(cps0)}, rows={[r['ds'] for r in rows]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
