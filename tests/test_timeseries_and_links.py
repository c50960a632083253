"""Hand-computed checks for the round-10 session-2 queries: the ACF
integer identity, the dense hour spine, the Markov transition matrix,
Naive Bayes on a separable corpus, and link prediction on a known
backbone. Each builds a tiny parquet fixture dir so the registered
query runs unmodified; the full-SF oracle checks live in
test_oracle_parity.py / sweep.py."""

from __future__ import annotations

import datetime
import os
from fractions import Fraction

from mpi_word_count_spark.queries.graph_queries import (
    q_supplier_link_prediction,
)
from mpi_word_count_spark.queries.inference_queries import (
    q_naive_bayes_confusion,
)
from mpi_word_count_spark.queries.timeseries_queries import (
    q_event_transition_matrix,
    q_events_autocorrelation,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0, "{}")
            for i, (ts, uid, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )


def test_acf_integer_identity():
    # the scaled identity equals the classical mean-centered ACF
    # exactly (checked in rational arithmetic, any series)
    for xs in ([2, 0, 1], [5, 5, 5, 5], [1, 2, 3, 4, 5, 4, 3, 2]):
        n, s, q = len(xs), sum(xs), sum(v * v for v in xs)
        m = Fraction(s, n)
        den_f = sum((Fraction(v) - m) ** 2 for v in xs)
        for k in range(1, len(xs)):
            p = sum(xs[t] * xs[t - k] for t in range(k, n))
            sa = sum(xs[t] for t in range(k, n))
            sb = sum(xs[t - k] for t in range(k, n))
            num = n * n * p - n * s * (sa + sb) + (n - k) * s * s
            den = n * n * q - n * s * s
            num_f = sum(
                (Fraction(xs[t]) - m) * (Fraction(xs[t - k]) - m)
                for t in range(k, n)
            )
            if den_f:
                assert Fraction(num, den) == num_f / den_f
            else:
                assert num == 0 and den == 0  # constant series


def test_acf_query_with_gap_hour(spark, tmp_path):
    # hourly counts [2, 0, 1]: the empty middle hour must come from
    # the dense spine; lag-1 ACF is exactly -1/2
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def at(h, m):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    _write_events(
        spark,
        str(tmp_path),
        [
            (at(0, 5), 1, "view"),
            (at(0, 20), 1, "view"),
            (at(2, 10), 2, "click"),
        ],
    )
    rows = {
        r.lag: r for r in q_events_autocorrelation(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 2}  # lags 3..6 have no aligned pairs
    assert rows[1].n_terms == 2
    assert rows[1].acf_num == -9 and rows[1].acf_den == 18
    assert rows[1].acf == -0.5
    # lag 2: P=2, A=1, B=2, num = 9*2*? -> compute: 9*2 - 3*3*3 + 1*9 = 0
    assert rows[2].acf_num == 0 and rows[2].acf == 0.0


def test_transition_matrix_hand_check(spark, tmp_path):
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    # user 1: a -> b -> a ; user 2: a -> a  (same-ts tie broken by
    # event_id: rows are written in event_id order)
    _write_events(
        spark,
        str(tmp_path),
        [
            (at(0), 1, "a"),
            (at(10), 1, "b"),
            (at(20), 1, "a"),
            (at(5), 2, "a"),
            (at(5), 2, "a"),
        ],
    )
    got = {
        (r.prev_type, r.next_type): (r.n_trans, r.row_total, r.p_milli)
        for r in q_event_transition_matrix(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("a", "b"): (1, 2, 500),
        ("a", "a"): (1, 2, 500),
        ("b", "a"): (1, 1, 1000),
    }


def test_naive_bayes_separable_corpus(spark, tmp_path):
    docs = [
        (1, "cat dog cat", "en"),
        (2, "dog dog cat", "en"),
        (3, "hund katze hund", "de"),
        (4, "katze katze hund", "de"),
    ]
    spark.createDataFrame(
        [(i, t, lang, "test", len(t)) for i, t, lang in docs],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in q_naive_bayes_confusion(spark, str(tmp_path)).collect()
    }
    # disjoint vocabularies -> perfect diagonal
    assert got == {("de", "de"): 2, ("en", "en"): 2}


def test_link_prediction_known_backbone(spark, tmp_path):
    # orders 1-5 pair suppliers (1,2); orders 6-10 pair (1,3):
    # backbone edges (1,2),(1,3) at the support-5 cut. The only
    # non-adjacent wedge pair is (2,3) through mid 1 with deg(1)=2:
    # CN=1, RA=500000 micro.
    rows = []
    for ok in (1, 2, 3, 4, 5):
        rows += [(ok, 1), (ok, 2)]
    for ok in (6, 7, 8, 9, 10):
        rows += [(ok, 1), (ok, 3)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    got = [
        (r.suppkey_a, r.suppkey_b, r.common_neighbors, r.ra_micro)
        for r in q_supplier_link_prediction(spark, str(tmp_path)).collect()
    ]
    assert got == [(2, 3, 1, 500000)]


def test_mad_outliers_hand_check(spark, tmp_path):
    # brand A prices 1.00 2.00 3.00 10.00: median 2.50, MAD 1.00,
    # one point beyond 1.5*MAD (the 10.00)
    spark.createDataFrame(
        [(1, "Brand#A")], "p_partkey long, p_brand string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "part.parquet")
    )
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0), (1, 10.0)],
        "l_partkey long, l_extendedprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    from mpi_word_count_spark.queries.stats_queries import (
        q_brand_price_mad_outliers,
    )

    [r] = q_brand_price_mad_outliers(spark, str(tmp_path)).collect()
    assert (r.brand, r.n, r.median_cents, r.mad_cents, r.n_outliers) == (
        "Brand#A",
        4,
        250.0,
        100.0,
        1,
    )


def test_sssp_hand_check(spark, tmp_path):
    # same backbone as the link-prediction fixture: edges (1,2) and
    # (1,3), support 3 each -> w = 333333; source = min node = 1
    rows = []
    for ok in (1, 2, 3):
        rows += [(ok, 1), (ok, 2)]
    for ok in (4, 5, 6):
        rows += [(ok, 1), (ok, 3)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    from mpi_word_count_spark.queries.graph_queries import q_trade_graph_sssp

    got = [
        (r.suppkey, r.dist_micro)
        for r in q_trade_graph_sssp(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 0), (2, 333333), (3, 333333)]


def test_bellman_ford_shorter_two_hop_wins(spark):
    # direct edge 1->3 costs 10, the 1->2->3 path costs 2+3=5: the
    # round-2 relaxation must lower the round-1 distance
    from mpi_word_count_spark.operators.graph import bellman_ford

    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 2), (2, 3, 3)], "src long, dst long, w long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist for r in bellman_ford(edges, src, rounds=4).collect()
    }
    assert got == {1: 0, 2: 2, 3: 5}


def test_cusum_hand_check(spark, tmp_path):
    # series [5, 5, 0, 1] (hour 2 empty -> spine zero): the regime
    # break after hour 1 is the max-CUSUM split (arithmetic below)
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def at(h, m):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    rows = [(at(h, 2 * i), 1, "view") for h in (0, 1) for i in range(5)]
    rows.append((at(3, 1), 2, "click"))
    # hour 3 has 1 event, hours 0-1 have 5 each, hour 2 empty ->
    # series [5, 5, 0, 1]: S=[5,10,10], n=4, Sn=11
    # ct=1: |20-11|=9; ct=2: |40-22|=18; ct=3: |40-33|=7 -> split ct=2
    _write_events(spark, str(tmp_path), rows)
    from mpi_word_count_spark.queries.timeseries_queries import (
        q_events_cusum_changepoint,
    )

    [r] = q_events_cusum_changepoint(spark, str(tmp_path)).collect()
    h0 = int(t0.timestamp() // 3600)
    assert r.split_hour == h0 + 1
    assert r.n == 4 and r.d_num == 18
    assert r.mean_pre_milli == 5000  # (1000*10) div 2
    assert r.mean_post_milli == 500  # (1000*1) div 2


def test_theil_sen_hand_check(spark, tmp_path):
    # series [0, 2, 4] (hours 0,1,2): slopes 2000,2000,2000 -> median
    # slope 2000 milli/hour over 3 pairs
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def at(h, m):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    rows = [(at(1, i), 1, "view") for i in range(2)]
    rows += [(at(2, i), 1, "view") for i in range(4)]
    rows += [(at(0, 30), 2, "click")]
    # series [1, 2, 4]: slopes (0,1)=1000, (1,2)=2000, (0,2)=1500
    # median = 1500
    _write_events(spark, str(tmp_path), rows)
    from mpi_word_count_spark.queries.timeseries_queries import (
        q_theil_sen_trend,
    )

    [r] = q_theil_sen_trend(spark, str(tmp_path)).collect()
    assert r.n_pairs == 3
    assert r.slope_milli_per_hour == 1500.0


def test_hits_fixed_point_hand_check(spark):
    # bipartite c1->{s10,s20}, c2->{s10}; scale 1024, rescale 2:
    #   a1: s10 = 2048//2 = 1024, s20 = 1024//2 = 512
    #   h1: c1 = (1024+512)//2 = 768, c2 = 1024//2 = 512
    #   a2: s10 = (768+512)//2 = 640, s20 = 768//2 = 384
    from mpi_word_count_spark.operators.graph import hits_fixed_point

    edges = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "src long, dst long"
    )
    auth, hubs = hits_fixed_point(edges, rounds=2, scale=1024, rescale=2)
    assert {r.dst: r.a for r in auth.collect()} == {10: 640, 20: 384}
    assert {r.src: r.h for r in hubs.collect()} == {
        1: (640 + 384) // 2,
        2: 640 // 2,
    }


def test_als_factors_python_replica(spark, tmp_path):
    # 1 customer, suppliers 7 (2 orders) and 9 (1 order): replicate
    # the md5 factors and the Cramer solve in python, term for term
    from mpi_word_count_spark.functions.hashing import py_hash32
    from mpi_word_count_spark.queries.stats_queries import (
        q_als_customer_factors,
    )

    spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )

    def q(s, d):
        return (py_hash32(f"{s}:{d}", "alsq") % 9) - 4

    items = [(7, 2), (9, 1)]  # (supplier, rating)
    a = {}
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            a[i, j] = float(sum(q(s, i) * q(s, j) for s, _ in items))
    b = {i: float(sum(r * q(s, i) for s, r in items)) for i in (1, 2, 3)}
    e11, e22, e33 = a[1, 1] + 1, a[2, 2] + 1, a[3, 3] + 1
    a12, a13, a23 = a[1, 2], a[1, 3], a[2, 3]
    b1, b2, b3 = b[1], b[2], b[3]
    det = (
        e11 * (e22 * e33 - a23 * a23)
        - a12 * (a12 * e33 - a23 * a13)
        + a13 * (a12 * a23 - e22 * a13)
    )
    d1 = (
        b1 * (e22 * e33 - a23 * a23)
        - a12 * (b2 * e33 - a23 * b3)
        + a13 * (b2 * a23 - e22 * b3)
    )
    d2 = (
        e11 * (b2 * e33 - a23 * b3)
        - b1 * (a12 * e33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    d3 = (
        e11 * (e22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - e22 * a13)
    )

    import math

    def r6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    [row] = q_als_customer_factors(spark, str(tmp_path)).collect()
    assert row.custkey == 1 and row.n_items == 2
    assert (row.w1, row.w2, row.w3) == (
        r6(d1 / det),
        r6(d2 / det),
        r6(d3 / det),
    )


def test_mann_kendall_hand_check(spark, tmp_path):
    # series [1, 2, 4] (strictly rising): S = 3 over 3 pairs, no
    # ties, var18 = 3*2*11 = 66, z = 2 / sqrt(66/18)
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def at(h, m):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    rows = [(at(0, 30), 2, "click")]
    rows += [(at(1, i) , 1, "view") for i in range(2)]
    rows += [(at(2, i), 1, "view") for i in range(4)]
    _write_events(spark, str(tmp_path), rows)
    from mpi_word_count_spark.queries.timeseries_queries import (
        q_mann_kendall_trend,
    )
    import math

    [r] = q_mann_kendall_trend(spark, str(tmp_path)).collect()
    assert (r.n, r.n_pairs, r.s_stat, r.var18) == (3, 3, 3, 66)
    expect = math.floor(2.0 / math.sqrt(66.0 / 18.0) * 1e6 + 0.5) / 1e6
    assert r.z_stat == expect


def test_seasonality_python_replica(spark, tmp_path):
    # 49 hourly points: counts = (hod + day) events per hour, so
    # hour-of-day explains most but not all variance; replicate the
    # ANOVA formula term for term in python
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    xs = []
    eid = 0
    for h in range(49):
        c = (h % 24) % 3 + (h // 24)  # 0..2 seasonal + day trend
        xs.append(c)
        for i in range(c):
            rows.append(
                (
                    t0 + datetime.timedelta(hours=h, minutes=i),
                    1,
                    "view",
                )
            )
            eid += 1
    from mpi_word_count_spark.queries.timeseries_queries import (
        q_hourly_seasonality_strength,
    )
    import math

    _write_events(spark, str(tmp_path), rows)
    [r] = q_hourly_seasonality_strength(spark, str(tmp_path)).collect()
    # python replica over the ACTUAL spine (first non-empty..last)
    h_lo = min(h for h in range(49) if xs[h] > 0)
    h_hi = max(h for h in range(49) if xs[h] > 0)
    series = [(h, xs[h]) for h in range(h_lo, h_hi + 1)]
    groups = {}
    for h, v in series:
        groups.setdefault(h % 24, []).append(v)
    n = float(len(series))
    k = float(len(groups))
    s = float(sum(v for _, v in series))
    q = float(sum(v * v for _, v in series))
    ssbq = sum(
        float(sum(vs)) * float(sum(vs)) / float(len(vs))
        for vs in groups.values()
    )
    def r6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    assert r.n_hours == int(n) and r.n_groups == int(k)
    assert r.eta_squared == r6((ssbq - s * s / n) / (q - s * s / n))
    assert r.f_stat == r6(
        ((ssbq - s * s / n) / (k - 1.0)) / ((q - ssbq) / (n - k))
    )


def test_runs_test_hand_check(spark, tmp_path):
    # series [3, 1, 3, 1, 3] (hours 0..4): median 3 -> med2 = 6,
    # equal-to-median hours (the three 3s) are EXCLUDED, leaving
    # [-,-] (the two 1s): n1=0, n2=2, runs=1
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for h, c in enumerate([3, 1, 3, 1, 3]):
        for i in range(c):
            rows.append(
                (t0 + datetime.timedelta(hours=h, minutes=i), 1, "view")
            )
    _write_events(spark, str(tmp_path), rows)
    from mpi_word_count_spark.queries.timeseries_queries import q_runs_test

    [r] = q_runs_test(spark, str(tmp_path)).collect()
    assert (r.n1, r.n2, r.runs) == (0, 2, 1)
