"""Privacy family: k-anonymity ladder invariants, Laplace-mechanism
determinism/calibration, randomized-response mechanism exactness
(row-level md5 replica) — the semantics the DuckDB oracle hash alone
doesn't pin down."""

from __future__ import annotations

import hashlib

import pandas as pd

from mpi_word_count_spark.queries.privacy_queries import (
    _DP_EPSILONS,
    K_THRESHOLD,
    q_dp_event_counts,
    q_dp_randomized_response,
    q_k_anonymity_audit,
)
from tests.conftest import SF_DIR

_LADDER = ["nation+segment+band", "nation+segment", "nation", "all"]


def test_k_anonymity_ladder_invariants(spark):
    rows = {r["qi_level"]: r for r in q_k_anonymity_audit(spark, SF_DIR).collect()}
    assert set(rows) == set(_LADDER)
    n_total = rows["all"]["n_rows"]
    # every ladder level partitions the same population
    assert all(r["n_rows"] == n_total for r in rows.values())
    # coarsening the QI can only grow classes: k and l monotone, class
    # count and at-risk mass monotone the other way
    for fine, coarse in zip(_LADDER, _LADDER[1:]):
        assert rows[coarse]["k_anonymity"] >= rows[fine]["k_anonymity"]
        assert rows[coarse]["l_diversity"] >= rows[fine]["l_diversity"]
        assert rows[coarse]["n_classes"] <= rows[fine]["n_classes"]
        assert rows[coarse]["rows_at_risk"] <= rows[fine]["rows_at_risk"]
    # the degenerate release: one class holding everybody
    assert rows["all"]["n_classes"] == 1
    assert rows["all"]["k_anonymity"] == n_total
    assert rows["all"]["rows_at_risk"] == (n_total if n_total < K_THRESHOLD else 0)
    # non-vacuous: the finest level actually has singleton-risk rows
    assert rows["nation+segment+band"]["rows_at_risk"] > 0
    for r in rows.values():
        assert abs(r["pct_at_risk"] - r["rows_at_risk"] / r["n_rows"]) < 1e-3


def test_dp_event_counts_deterministic_and_calibrated(spark):
    a = {r["event_type"]: r for r in q_dp_event_counts(spark, SF_DIR).collect()}
    b = {r["event_type"]: r for r in q_dp_event_counts(spark, SF_DIR).collect()}
    assert a.keys() == b.keys() and len(a) >= 2
    true_n = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # Laplace inverse-CDF of the (k+0.5)/2^32 uniform is bounded by
    # ln(2^31)/eps ≈ 21.5/eps — check the release is within mechanism
    # range of truth, seeded (reproducible), and epsilon-dependent.
    for et in a:
        draws = set()
        for eps in _DP_EPSILONS:
            col = f"noisy_n_eps_{str(eps).replace('.', '_')}"
            assert a[et][col] == b[et][col]
            err = abs(a[et][col] - true_n[et])
            assert err <= 22.0 / eps + 1e-9
            draws.add(a[et][col])
        assert len(draws) == len(_DP_EPSILONS)  # independent salts


def _u32(seed: str, value: str) -> float:
    h = int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


def test_randomized_response_matches_rowlevel_replica(spark):
    """Recompute every event's randomized response in pure Python
    (same md5 coins) and require the cohort aggregates to match the
    distributed mechanism EXACTLY."""
    got = {
        r["cohort"]: r for r in q_dp_randomized_response(spark, SF_DIR).collect()
    }
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "event_type"])
    agg: dict[int, list[int]] = {}
    for eid, uid, et in zip(pdf["event_id"], pdf["user_id"], pdf["event_type"]):
        s = 1 if et == "purchase" else 0
        keep = _u32("rrkeep", str(eid)) < 0.5
        coin = 1 if _u32("rrcoin", str(eid)) < 0.5 else 0
        r = s if keep else coin
        n, yes, true = agg.setdefault(int(uid) % 10, [0, 0, 0])
        agg[int(uid) % 10] = [n + 1, yes + r, true + s]
    assert set(got) == set(agg)
    for cohort, (n, yes, true) in agg.items():
        row = got[cohort]
        assert (row["n"], row["reported_yes"], row["true_yes"]) == (n, yes, true)
        assert row["est_yes"] == 2.0 * yes - n / 2.0
    # mechanism is actually randomizing: someone's response was flipped
    assert any(g["reported_yes"] != g["true_yes"] for g in got.values())
