"""Distributed-statistics family: Poisson-bootstrap mechanism checked
against a row-level md5 replica, OLS checked against numpy's lstsq on
the same fixture."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from mpi_word_count_spark.queries.stats_queries import (
    BOOTSTRAP_B,
    _POISSON_CDF,
    q_poisson_bootstrap_ci,
    q_price_ols_model,
)
from tests.conftest import SF_DIR


def _u32(seed: str, value: str) -> float:
    h = int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


def _w(u: float) -> int:
    for k, p in enumerate(_POISSON_CDF):
        if u < float(p):
            return k
    return 6


def test_poisson_bootstrap_matches_rowlevel_replica(spark):
    rows = {r["b"]: r for r in q_poisson_bootstrap_ci(spark, SF_DIR).collect()}
    assert set(rows) == set(range(BOOTSTRAP_B))
    pdf = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    cents = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    keys = pdf["o_orderkey"].astype(str).to_numpy()
    n = len(cents)
    for b in (0, 7, BOOTSTRAP_B - 1):  # exact replica on three replicas
        w = np.array([_w(_u32("boot", f"{k}:{b}")) for k in keys], dtype=np.int64)
        n_eff = int(w.sum())
        mean = (float((w * cents).sum()) / float(n_eff)) / 100.0
        assert rows[b]["n_eff"] == n_eff
        assert abs(rows[b]["boot_mean"] - mean) < 1e-3
    # replica sizes concentrate around n (Poisson(1) sum), means around
    # the true mean — the distribution is a usable CI
    true_mean = float(cents.mean()) / 100.0
    se = float(cents.std()) / 100.0 / math.sqrt(n)
    for r in rows.values():
        assert abs(r["n_eff"] - n) < 6 * math.sqrt(n)
        assert abs(r["boot_mean"] - true_mean) < 8 * se
    # non-degenerate: replicas actually differ
    assert len({r["boot_mean"] for r in rows.values()}) > BOOTSTRAP_B // 2


def test_price_ols_matches_numpy_lstsq(spark):
    row = q_price_ols_model(spark, SF_DIR).collect()[0]
    pdf = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )
    q = np.floor(pdf["l_quantity"].to_numpy() + 0.5)
    d = np.floor(pdf["l_discount"].to_numpy() * 100 + 0.5)
    y = np.floor(pdf["l_extendedprice"].to_numpy() * 100 + 0.5) / 100.0
    X = np.column_stack([np.ones_like(q), q, d])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_rows"] == len(q)
    assert abs(row["beta_intercept"] - beta[0]) < 1e-3 * max(1.0, abs(beta[0]))
    assert abs(row["beta_qty"] - beta[1]) < 1e-3 * max(1.0, abs(beta[1]))
    assert abs(row["beta_disc_pp"] - beta[2]) < 1e-3 * max(1.0, abs(beta[2]))
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(row["r_squared"] - (1.0 - ss_res / ss_tot)) < 1e-6
    assert 0.0 < row["r_squared"] <= 1.0


def test_holt_trend_matches_pandas_replay_and_learns_slope(spark):
    import math

    from mpi_word_count_spark.queries.stats_queries import (
        HOLT_ALPHA,
        HOLT_BETA,
        q_events_holt_trend,
    )

    got = {r["event_type"]: r for r in q_events_holt_trend(spark, SF_DIR).collect()}
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "ts", "value"])
    pdf["h"] = pdf["ts"].dt.floor("h")
    pdf["milli"] = np.floor(pdf["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    hourly = pdf.groupby(["event_type", "h"])["milli"].sum().reset_index()
    for et, grp in hourly.groupby("event_type"):
        ys = [float(m) / 1000.0 for m in grp.sort_values("h")["milli"]]
        lev, tr = ys[0], 0.0
        for y in ys[1:]:
            new_l = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (lev + tr)
            tr = HOLT_BETA * (new_l - lev) + (1 - HOLT_BETA) * tr
            lev = new_l
        row = got[et]
        assert row["n_hours"] == len(ys)
        assert row["level"] == math.floor(lev * 10000.0 + 0.5) / 10000.0
        assert row["trend"] == math.floor(tr * 10000.0 + 0.5) / 10000.0
        assert row["forecast_next"] == math.floor((lev + tr) * 10000.0 + 0.5) / 10000.0
    # sanity on the recurrence itself: a clean linear series converges
    # to its slope
    lev, tr = 10.0, 0.0
    for t in range(1, 200):
        y = 10.0 + 2.0 * t
        new_l = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (lev + tr)
        tr = HOLT_BETA * (new_l - lev) + (1 - HOLT_BETA) * tr
        lev = new_l
    assert abs(tr - 2.0) < 1e-6


def test_price_ols_cv_matches_numpy_per_fold(spark):
    """Replay the 5-fold CV in numpy: same md5 fold assignment,
    lstsq on each complement, residual RMSE on the held-out fold."""
    from mpi_word_count_spark.queries.stats_queries import (
        CV_FOLDS,
        q_price_ols_cv,
    )

    got = {r["fold"]: r for r in q_price_ols_cv(spark, SF_DIR).collect()}
    assert set(got) == set(range(CV_FOLDS))
    pdf = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"],
    )
    fold = np.array(
        [
            int(hashlib.md5(f"cv:{ok}:{ln}".encode()).hexdigest()[:8], 16) % CV_FOLDS
            for ok, ln in zip(pdf["l_orderkey"], pdf["l_linenumber"])
        ]
    )
    q = np.floor(pdf["l_quantity"].to_numpy() + 0.5)
    d = np.floor(pdf["l_discount"].to_numpy() * 100 + 0.5)
    y = np.floor(pdf["l_extendedprice"].to_numpy() * 100 + 0.5) / 100.0
    X = np.column_stack([np.ones_like(q), q, d])
    for f in range(CV_FOLDS):
        tr, te = fold != f, fold == f
        beta, *_ = np.linalg.lstsq(X[tr], y[tr], rcond=None)
        rmse = float(np.sqrt(((y[te] - X[te] @ beta) ** 2).mean()))
        row = got[f]
        assert row["n_test"] == int(te.sum())
        assert abs(row["beta_intercept"] - beta[0]) < 1e-3 * max(1.0, abs(beta[0]))
        assert abs(row["beta_qty"] - beta[1]) < 1e-3 * max(1.0, abs(beta[1]))
        assert abs(row["beta_disc_pp"] - beta[2]) < 1e-3 * max(1.0, abs(beta[2]))
        assert abs(row["rmse_test"] - rmse) < 1e-2 * max(1.0, rmse)


def test_ks_test_matches_numpy_replica(spark):
    from mpi_word_count_spark.queries.stats_queries import q_value_ks_test

    row = q_value_ks_test(spark, SF_DIR).collect()[0]
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    score = np.floor(pdf["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    is1 = (pdf["event_type"] == "purchase").to_numpy()
    s1, s2 = np.sort(score[is1]), np.sort(score[~is1])
    n1, n2 = len(s1), len(s2)
    grid = np.unique(score)
    cdf1 = np.searchsorted(s1, grid, side="right")
    cdf2 = np.searchsorted(s2, grid, side="right")
    dnum = np.abs(cdf1.astype(np.int64) * n2 - cdf2.astype(np.int64) * n1)
    k = int(np.argmax(dnum))  # argmax returns FIRST max = lowest score
    d = dnum[k] / (n1 * n2)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_at_score"] == int(grid[k])
    assert abs(row["ks_d"] - d) < 1e-6
    assert abs(row["ks_stat"] - d * math.sqrt(n1 * n2 / (n1 + n2))) < 1e-6
