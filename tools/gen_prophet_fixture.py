#!/usr/bin/env python3
"""Generate a Prophet forecast parity fixture from the reference model
artifact, WITHOUT prophet installed (sandbox has no egress).

This is an independent numpy reimplementation of prophet-1.1.7's
`predict()` path for the artifact's configuration (linear growth,
additive weekly seasonality fourier_order=3, MAP fit, absmax scaling,
floor=0), following the published algorithm in
prophet/forecaster.py (predict_trend / sample_predictive_trend /
sample_model / predict_uncertainty):

  yhat(ds)   = y_scale * (piecewise_linear(t) + X(ds) @ beta)
  intervals  = per-date [10th, 90th] percentiles over MC sample paths:
               future changepoints ~ Poisson(S * (T - 1)) uniform on
               (1, T]; new deltas ~ Laplace(0, mean|delta| + 1e-8);
               observation noise ~ N(0, sigma_obs) per row.

yhat is deterministic closed form -> exact fixture (tolerance 1e-6).
Intervals are MC: prophet itself uses an UNSEEDED numpy RNG with
uncertainty_samples=1000, so even two prophet runs differ run to run.
The fixture therefore stores quasi-exact quantiles (N_EXACT samples)
plus a per-edge tolerance = 4 x the empirical std-dev of 1000-sample
replicate band edges — i.e. the band any single prophet-1.1.7 run
would produce lies inside the tolerance w.p. ~0.9999, and so must the
engine's fixed-seed 1000-sample band.

Independence: different language, different RNG (numpy MT19937 vs
java.util.Random LCG), different code path from the Scala scorer —
agreement validates the algorithm, not the implementation.

Usage: python3 tools/gen_prophet_fixture.py \
           /root/reference/function-app/prophet_model.json \
           src/test/resources/prophet_forecast_fixture.json
"""
import json
import sys

import numpy as np

DAYS = 30          # matches q29 and the reference demo horizon
N_EXACT = 200_000  # quasi-exact quantile sample count
N_REPL = 50        # 1000-sample replicates for tolerance estimation


def load_model(path):
    with open(path) as f:
        raw = json.load(f)
    p = raw["params"]
    hist = json.loads(raw["history_dates"])["data"]
    return {
        "k": p["k"][0][0],
        "m": p["m"][0][0],
        "delta": np.asarray(p["delta"][0], dtype=float),
        "beta": np.asarray(p["beta"][0], dtype=float),
        "sigma_obs": p["sigma_obs"][0][0],
        "changepoints_t": np.asarray(raw["changepoints_t"], dtype=float),
        "y_scale": float(raw["y_scale"]),
        "start": float(raw["start"]),
        "t_scale": float(raw["t_scale"]),
        "interval_width": float(raw["interval_width"]),
        "period": 7.0,
        "fourier_order": 3,
        "history_end": hist[-1][:10],
    }


def piecewise_linear(t, deltas, k, m, cps):
    # prophet.forecaster.Prophet.piecewise_linear, MAP branch
    deltas_t = (cps[None, :] <= t[..., None]) * deltas
    k_t = deltas_t.sum(axis=-1) + k
    m_t = (deltas_t * -cps).sum(axis=-1) + m
    return k_t * t + m_t


def fourier(days_since_epoch, period, order):
    # prophet.forecaster.fourier_series column order: sin1,cos1,sin2,...
    cols = []
    for n in range(1, order + 1):
        ang = 2.0 * np.pi * n * days_since_epoch / period
        cols.append(np.sin(ang))
        cols.append(np.cos(ang))
    return np.column_stack(cols)


def forecast_dates(m, days):
    end = np.datetime64(m["history_end"])
    ds = end + np.arange(1, days + 1)
    epoch = ds.astype("datetime64[s]").astype(np.int64).astype(float)
    return ds, epoch


def yhat(m, epoch):
    t = (epoch - m["start"]) / m["t_scale"]
    trend = piecewise_linear(t, m["delta"], m["k"], m["m"], m["changepoints_t"])
    X = fourier(epoch / 86400.0, m["period"], m["fourier_order"])
    return m["y_scale"] * (trend + X @ m["beta"])


def sample_bands(m, epoch, n_samples, rng):
    """Per-date [lo, hi] percentiles over n_samples predictive paths
    (prophet sample_predictive_trend + sample_model, vectorized)."""
    t = (epoch - m["start"]) / m["t_scale"]
    T = t.max()
    S = len(m["changepoints_t"])
    lam = np.abs(m["delta"]).mean() + 1e-8
    base = yhat(m, epoch)
    dev = np.zeros((n_samples, len(t)))
    # future-changepoint trend deviation: sum_i delta_i * max(0, t - cp_i)
    n_new = rng.poisson(S * (T - 1.0), size=n_samples) if T > 1 else np.zeros(n_samples, int)
    for i in range(n_samples):
        k = n_new[i]
        if k == 0:
            continue
        cps = 1.0 + rng.random(k) * (T - 1.0)
        dls = rng.laplace(0.0, lam, k)
        dev[i] = ((t[None, :] - cps[:, None]).clip(min=0.0) * dls[:, None]).sum(axis=0)
    noise = rng.normal(0.0, m["sigma_obs"], size=(n_samples, len(t)))
    samples = base[None, :] + (dev + noise) * m["y_scale"]
    lo_p = 100.0 * (1.0 - m["interval_width"]) / 2.0
    return (np.percentile(samples, lo_p, axis=0),
            np.percentile(samples, 100.0 - lo_p, axis=0))


def main(model_path, out_path):
    m = load_model(model_path)
    ds, epoch = forecast_dates(m, DAYS)
    yh = yhat(m, epoch)

    rng = np.random.default_rng(20260812)
    lo_exact, hi_exact = sample_bands(m, epoch, N_EXACT, rng)

    # tolerance: spread of single prophet-run (1000-sample) band edges
    lo_reps, hi_reps = [], []
    for _ in range(N_REPL):
        lo_r, hi_r = sample_bands(m, epoch, 1000, rng)
        lo_reps.append(lo_r)
        hi_reps.append(hi_r)
    lo_sd = np.std(np.array(lo_reps), axis=0)
    hi_sd = np.std(np.array(hi_reps), axis=0)
    tol = np.maximum(4.0 * np.maximum(lo_sd, hi_sd), 1e-6)

    fixture = {
        "source": "independent numpy reimplementation of prophet-1.1.7 "
                  "predict() from function-app/prophet_model.json "
                  "(prophet itself unavailable: no egress)",
        "days": DAYS,
        "n_exact_samples": N_EXACT,
        "n_replicates": N_REPL,
        "rows": [
            {
                "ds": str(ds[i]),
                "yhat": round(float(yh[i]), 9),
                "yhat_lower": round(float(lo_exact[i]), 6),
                "yhat_upper": round(float(hi_exact[i]), 6),
                "edge_tol": round(float(tol[i]), 6),
            }
            for i in range(DAYS)
        ],
    }
    with open(out_path, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"wrote {out_path}: {DAYS} rows; "
          f"band width day1={hi_exact[0]-lo_exact[0]:.2f} "
          f"day{DAYS}={hi_exact[-1]-lo_exact[-1]:.2f}; "
          f"tol range [{tol.min():.2f}, {tol.max():.2f}]")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
