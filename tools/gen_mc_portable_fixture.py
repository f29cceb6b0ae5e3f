#!/usr/bin/env python3
"""Pin the Prophet forecaster's PORTABLE-HASH Monte-Carlo intervals.

`gen_prophet_fixture.py` validates the interval ALGORITHM statistically
(quasi-exact quantiles + replicate-spread tolerance, because prophet
itself is unseeded). This fixture pins the engine's portable-hash MC
path DETERMINISTICALLY with an independent reimplementation: every
variate is (hash("mc:seed:s:tag") + 0.5) / (1e9+7) with the polynomial
rolling hash fold(acc*31 + codepoint mod 1e9+7), pushed through the
same inverse transforms TrendSim.drawPortable uses (Poisson CDF table
lookup for the future-changepoint count, uniform changepoint times,
Laplace quantile deltas, Box-Muller observation noise), then
base + dev*y_scale + noise*y_scale per path and the linear-interpolation
percentile. Every value here is the EXACT number the Scala scorer must
produce, up to cross-language libm differences:

  - the hash stream and every comparison (CDF lookup, cp <= t) are
    exact integer / correctly-rounded float arithmetic -> the raw
    sample-0 draws carry tolerance 1e-12 (ln/cos/sqrt magnitudes only);
  - band edges additionally include the closed-form yhat base
    (independently pinned at 1e-6 by the prophet fixture) ->
    tolerance 1e-4 absolute, documented in MlScorerSpec.

The same arithmetic is what the q29 DuckDB oracle replays relationally
(ProphetScorer.mcOracleSql) — this fixture is the third independent
implementation of the draw pipeline.

Usage: python3 tools/gen_mc_portable_fixture.py \
           src/main/resources/prophet_model.json \
           src/test/resources/prophet_mc_portable_fixture.json
"""
import json
import math
import sys

import numpy as np

from gen_prophet_fixture import load_model, yhat

DAYS = 30
SEED = 42
ROWS = [0, 14, 29]  # first / middle / last forecast day

MOD = 1000000007


def portable_u(tag):
    # rolling fold + two Pollard-rho avalanche rounds (the raw fold is
    # affine in trailing characters — mirrors TrendSim.portableU)
    acc = 0
    for ch in tag:
        acc = (acc * 31 + ord(ch)) % MOD
    acc = (acc * acc + 1) % MOD
    acc = (acc * acc + 1) % MOD
    return (acc + 0.5) / float(MOD)


def poisson_cdf(lam):
    term = math.exp(-lam)
    cdf = [term]
    k = 1
    while cdf[-1] < 1.0 - 1e-12 and k < 2048:
        term = term * lam / k
        cdf.append(cdf[-1] + term)
        k += 1
    return cdf


def draw_portable(m, horizon_t, seed, n_samples):
    """TrendSim.drawPortable, draw-for-draw."""
    b = float(np.abs(m["delta"]).sum()) / len(m["delta"]) + 1e-8
    future = horizon_t > 1.0
    cdf = poisson_cdf(len(m["changepoints_t"]) * (horizon_t - 1.0)) \
        if future else []
    sims = []
    for s in range(n_samples):
        pre = "mc:%d:%d" % (seed, s)
        n_new = sum(1 for c in cdf if c < portable_u(pre + ":n")) \
            if future else 0
        cps = [1.0 + portable_u("%s:c%d" % (pre, i + 1)) * (horizon_t - 1.0)
               for i in range(n_new)]
        dls = []
        for i in range(n_new):
            u = portable_u("%s:d%d" % (pre, i + 1))
            dls.append(-b * math.copysign(1.0, u - 0.5)
                       * math.log(1.0 - 2.0 * abs(u - 0.5)))
        noise = (math.sqrt(-2.0 * math.log(portable_u(pre + ":g1")))
                 * math.cos(2.0 * math.pi * portable_u(pre + ":g2"))
                 * m["sigma_obs"])
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
    sims = draw_portable(m, horizon_t, SEED, n_samples)

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

    # raw first-sample draws: the exact-stream pin (integer hash fold +
    # correctly-rounded float ops on both sides except ln/cos/sqrt)
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
    print("wrote %s (n_new sample0=%d, horizon_t=%.6f)"
          % (out_path, len(cps0), horizon_t))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
