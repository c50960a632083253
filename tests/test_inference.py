"""Batch model inference (operators/inference.py): exact integer
scoring on planted documents, zero-token handling, and the broadcast
plan shape. Fixture-scale value-hash parity runs in
tests/test_oracle_parity.py (model_quality_scores)."""

from __future__ import annotations

from mpi_word_count_spark.functions.hashing import py_hash32
from mpi_word_count_spark.operators.inference import (
    FEATURE_DIM,
    FEATURE_SEED,
    demo_weight_rows,
    demo_weights,
    hashed_linear_scores,
)


def expected_logit(terms: list[str]) -> int:
    w = dict(demo_weight_rows())
    return sum(w[py_hash32(t, FEATURE_SEED) % FEATURE_DIM] for t in terms)


def score_docs(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = hashed_linear_scores(docs, demo_weights(spark))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_exact_integer_scoring(spark):
    got = score_docs(
        spark,
        [
            (1, "alpha beta beta"),
            (2, "ALPHA, beta! beta."),  # case-fold + delimiters: same bag
            (3, ""),
        ],
    )
    logit = expected_logit(["alpha", "beta", "beta"])
    assert got[1]["logit_milli"] == logit
    assert got[1]["n_tokens"] == 3
    # tokenizer semantics S1/S2 flow through: same bag, same score
    assert got[2] == {**got[1], "doc_id": 2}
    assert got[1]["keep"] == (logit >= 0)
    # empty documents: scored 0.0, kept, not dropped from the output
    assert got[3]["n_tokens"] == 0
    assert got[3]["score"] == 0.0
    assert got[3]["keep"] is True


def test_stateless_variant_identical_and_shuffle_free(spark):
    from mpi_word_count_spark.operators.inference import (
        hashed_linear_scores_stateless,
    )

    rows = [
        (1, "alpha beta beta gamma delta"),
        (2, "Zeta! eta?? theta"),
        (3, "alpha"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    via_join = {
        r["doc_id"]: r.asDict()
        for r in hashed_linear_scores(docs, demo_weights(spark)).collect()
    }
    stateless = hashed_linear_scores_stateless(docs)
    via_expr = {r["doc_id"]: r.asDict() for r in stateless.collect()}
    assert via_expr == via_join
    # the stateless plan must be scan → project: no exchange at all
    plan = stateless._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_plan_broadcasts_weights_no_cartesian(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        hashed_linear_scores(docs, demo_weights(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_scorer_agreement_accounting(spark):
    """All four confusion cells populate on the fixture, counts sum to
    the corpus, and milli shares are the integer-floored ratios."""
    from tests.conftest import SF_DIR

    from mpi_word_count_spark.queries.inference_queries import (
        q_quality_scorer_agreement,
    )
    from mpi_word_count_spark.tables import table

    rows = q_quality_scorer_agreement(spark, SF_DIR).collect()
    assert len(rows) == 4
    n = table(spark, "documents", SF_DIR).count()
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert r["share_milli"] == 1000 * r["n_docs"] // n


def test_wilson_ci_properties(spark):
    """The interval must contain the point estimate, be within [0, 1],
    and SHRINK with n: the largest stratum's interval is narrower than
    the smallest's (at comparable rates near 0.5 on this fixture)."""
    from tests.conftest import SF_DIR

    from mpi_word_count_spark.queries.inference_queries import (
        q_keep_rate_wilson_ci,
    )

    rows = q_keep_rate_wilson_ci(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["keep_rate"] <= r["ci_hi"] <= 1.0
        assert r["n_kept"] <= r["n_docs"]
    widths = {r["lang"]: (r["ci_hi"] - r["ci_lo"], r["n_docs"]) for r in rows}
    biggest = max(widths.values(), key=lambda t: t[1])
    smallest = min(widths.values(), key=lambda t: t[1])
    assert biggest[0] < smallest[0]


def test_value_auc_matches_rank_formula(spark):
    """Midrank AUC replayed via pandas average ranks (the
    Mann-Whitney identity) must match the histogram computation."""
    import math

    import numpy as np
    import pandas as pd

    from mpi_word_count_spark.queries.inference_queries import (
        q_value_auc_audit,
    )
    from tests.conftest import SF_DIR

    row = q_value_auc_audit(spark, SF_DIR).collect()[0]
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    score = np.floor(pdf["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    pos = (pdf["event_type"] == "purchase").to_numpy()
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    ranks = pd.Series(score).rank(method="average").to_numpy()
    auc = (float(ranks[pos].sum()) - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert row["n_scores"] == len(np.unique(score))
    assert row["auc"] == math.floor(auc * 1e6 + 0.5) / 1e6
    assert abs(row["gini"] - (2 * auc - 1)) < 2e-6


def test_woe_bands_match_python_replica(spark):
    import math

    import numpy as np
    import pandas as pd

    from mpi_word_count_spark.queries.inference_queries import (
        WOE_BAND,
        q_woe_value_bands,
    )
    from tests.conftest import SF_DIR

    got = {r["band"]: r for r in q_woe_value_bands(spark, SF_DIR).collect()}
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    band = np.floor(pdf["value"].to_numpy() / WOE_BAND).astype(np.int64)
    good = (pdf["event_type"] == "purchase").to_numpy()
    tg, tb = int(good.sum()), int((~good).sum())
    iv_total = 0.0
    for b in np.unique(band):
        g = int((good & (band == b)).sum())
        bad = int((~good & (band == b)).sum())
        pg, pb = (g + 0.5) / tg, (bad + 0.5) / tb
        woe = math.log(pg / pb)
        row = got[b]
        assert (row["n_good"], row["n_bad"]) == (g, bad)
        assert abs(row["woe"] - woe) < 1e-4
        assert abs(row["iv_term"] - (pg - pb) * woe) < 1e-6
        iv_total += (pg - pb) * woe
    assert iv_total >= 0.0  # IV is a sum of non-negative terms
