"""Unit tests: similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest

from mpi_word_count_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
    resize_stub,
    sample_frames,
)
from mpi_word_count_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    kmeans_centroids,
    lsh_planes,
)
from mpi_word_count_spark.operators.textanalysis import (
    language_id,
    quality_scores,
    token_stats,
)


def vecs_df(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_topk(spark):
    df = vecs_df(spark)
    q = df.filter("vec_id = 0")
    got = ann_bruteforce_topk(df, q, k=2, vec_col="embedding").collect()
    assert [(r["neighbor_id"], r["rank"]) for r in got] == [(1, 1), (2, 2)]


def test_lsh_planes_deterministic(spark):
    assert lsh_planes(2, 4) == lsh_planes(2, 4)
    assert all(-1.0 <= x < 1.0 for p in lsh_planes(4, 8) for x in p)


def test_lsh_topk_subset_of_bruteforce(spark):
    df = vecs_df(spark)
    q = df.filter("vec_id = 0")
    bf = {r["neighbor_id"] for r in
          ann_bruteforce_topk(df, q, k=3, vec_col="embedding").collect()}
    lsh = {r["neighbor_id"] for r in
           ann_lsh_topk(df, q, k=3, vec_col="embedding", dim=2).collect()}
    assert lsh <= bf | {1, 2, 3}


def test_kmeans_deterministic_and_separating(spark):
    # two tight clusters far apart: k-means must recover them exactly
    rows = [(i, [10.0 + i * 0.01, 0.0]) for i in range(5)] + [
        (i + 5, [-10.0 - i * 0.01, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = kmeans_centroids(df, k=2, iters=3)
    c2 = kmeans_centroids(df, k=2, iters=3)
    assert c1 == c2
    signs = sorted(c[0] > 0 for c in c1)
    assert signs == [False, True]


def test_ivf_recall_vs_bruteforce(spark):
    from tests.conftest import SF_DIR
    from mpi_word_count_spark.tables import table
    from pyspark.sql import functions as F

    emb = table(spark, "embeddings", SF_DIR)
    q = emb.filter(F.col("vec_id") < 10)
    bf = ann_bruteforce_topk(emb, q, k=5).collect()
    ivf = ann_ivf_topk(emb, q, k=5, n_clusters=8, nprobe=2).collect()
    bf_pairs = {(r["q_id"], r["neighbor_id"]) for r in bf}
    ivf_pairs = {(r["q_id"], r["neighbor_id"]) for r in ivf}
    recall = len(bf_pairs & ivf_pairs) / len(bf_pairs)
    assert recall >= 0.5, recall
    # determinism: second run bit-identical
    ivf2 = ann_ivf_topk(emb, q, k=5, n_clusters=8, nprobe=2).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, ivf2))


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "Hello, world! hello")], "doc_id long, text string")
    r = token_stats(df).collect()[0]
    assert r["n_tokens"] == 3 and r["n_unique"] == 2
    assert r["n_bpe_tokens"] == 5  # Hello , world ! hello


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house"), (2, "el gato en la casa es que"), (3, "xyzzy plugh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "unknown"}


def test_quality_scores_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the of and to in it is that for with good text here"),
         (2, "!!! ??? ###")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_scores(df).collect()}
    assert rows[1]["quality_score"] > rows[2]["quality_score"]
    for r in rows.values():
        assert 0.0 <= r["quality_score"] <= 1.0


def test_gopher_quality_flags_rules(spark):
    from mpi_word_count_spark.operators.textanalysis import gopher_quality_flags

    good = (
        "The quick brown fox jumps over the lazy dog and keeps on "
        "running because it wants to be the best fox that anyone has "
        "ever seen in these parts of the forest with plenty of words "
        "to spare beyond the fifty word minimum that the rule demands "
        "so it simply continues until the counter is safely past it."
    )
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipses = "\n".join(f"line {i}..." for i in range(10))
    symbols = "# " * 60
    short = "too short to pass the word count rule"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, ellipses), (4, symbols), (5, short)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert rows[1]["keep"] and all(
        rows[1][f]
        for f in (
            "word_count_ok", "word_len_ok", "symbol_ok", "bullet_ok",
            "ellipsis_ok", "alpha_ok", "stops_ok",
        )
    )
    assert rows[2]["bullet_line_ratio"] == 1.0 and not rows[2]["bullet_ok"]
    assert rows[3]["ellipsis_line_ratio"] == 1.0 and not rows[3]["ellipsis_ok"]
    assert rows[4]["symbol_ratio"] >= 0.1 and not rows[4]["symbol_ok"]
    assert not rows[4]["alpha_ok"]  # '#' words carry no alphabetic char
    assert not rows[5]["word_count_ok"] and not rows[5]["keep"]
    assert rows[1]["n_required_stops"] >= 2


def test_decode_media_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "image/png", fake=False)
    img = decode_media(b"abc", "image/png", fake=True)
    assert img.shape == (16, 16) and img.sum() == 3


def docs_media(spark):
    df = spark.createDataFrame(
        [(1, "hello world", "en", "s1", 11), (2, "spark", "en", "s2", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return media_from_documents(df)


def test_media_feature_pipeline(spark):
    media = docs_media(spark)
    feats = extract_features(media, fake=True).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 11
    assert len(by_id[1]["feature"]) == 16
    # deterministic: same input bytes → same features
    feats2 = extract_features(media, fake=True).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, feats2))


def test_media_resize_and_frames(spark):
    media = docs_media(spark)
    resized = resize_stub(media, 4, 4).collect()
    assert all(len(r["media"]) == 4 * 4 * 4 for r in resized)  # float32 4x4
    frames = sample_frames(media, frame_bytes=4, stride=1).collect()
    assert {r["media_id"] for r in frames} == {1, 2}
    assert max(r["frame_no"] for r in frames if r["media_id"] == 1) == 2


def test_scrub_text_redacts_urls_and_emails(spark):
    from mpi_word_count_spark.operators.textanalysis import scrub_text

    df = spark.createDataFrame(
        [
            (1, "see https://example.com/a?b=1 and mail bob@example.org now"),
            (2, "no   noise \t here"),
            (3, "x@y.io https://a.b c@d.com"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_text(df).collect()}
    assert rows[1]["n_urls"] == 1 and rows[1]["n_emails"] == 1
    assert rows[2]["n_urls"] == 0 and rows[2]["n_emails"] == 0
    assert rows[3]["n_urls"] == 1 and rows[3]["n_emails"] == 2
    # whitespace-normalized scrub is deterministic: doc 2 hash equals
    # md5 of its collapsed text
    import hashlib

    assert rows[2]["clean_hash"] == hashlib.md5(b"no noise here").hexdigest()


def test_ngram_counts_bigrams(spark):
    from mpi_word_count_spark.operators.textanalysis import ngram_counts

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["ngram"]: r["n_occurrences"] for r in ngram_counts(df, n=2).collect()}
    assert out == {"a b": 3, "b a": 1, "b c": 1}


def test_multiprobe_recall_at_least_single_probe(spark):
    from tests.conftest import SF_DIR
    from mpi_word_count_spark.operators.similarity import ann_lsh_multiprobe_topk
    from mpi_word_count_spark.tables import table
    from pyspark.sql import functions as F

    emb = table(spark, "embeddings", SF_DIR)
    q = emb.filter(F.col("vec_id") < 10)
    bf = {(r["q_id"], r["neighbor_id"]) for r in ann_bruteforce_topk(emb, q, k=5).collect()}
    single = {(r["q_id"], r["neighbor_id"]) for r in ann_lsh_topk(emb, q, k=5).collect()}
    multi = {
        (r["q_id"], r["neighbor_id"])
        for r in ann_lsh_multiprobe_topk(emb, q, k=5, nprobes=2).collect()
    }
    # the single-probe bucket is always among the probes → candidate
    # superset → per-query top-k can only improve vs ground truth
    assert len(multi & bf) >= len(single & bf)


def test_pack_chunks_preserves_tokens(spark):
    from mpi_word_count_spark.operators.textanalysis import doc_chunks, pack_chunks
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "tok " * (30 * (i % 7 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    chunks = doc_chunks(df, chunk_size=120, stride=60)
    packed = pack_chunks(chunks, budget=256, n_buckets=4)
    total_chunk_tokens = chunks.agg(F.sum("n_chunk_tokens")).first()[0]
    total_packed = packed.agg(F.sum("n_tokens")).first()[0]
    # packing reassigns, never drops or duplicates tokens
    assert total_packed == total_chunk_tokens
    assert packed.filter(F.col("n_tokens") <= 0).count() == 0


def test_compression_ratio_separates_repetition(spark):
    from mpi_word_count_spark.operators.textanalysis import compression_ratios

    df = spark.createDataFrame(
        [
            (1, "spam spam spam " * 50),                       # repetitive
            (2, "9f2a7c41be05d8e6 3kq8zx0vwy1mjn7u " * 5),     # high entropy
            (3, ""),                                            # empty → NULL
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_ratios(df).collect()}
    assert rows[1]["compression_ratio"] < rows[2]["compression_ratio"]
    assert rows[1]["compression_ratio"] < 0.1
    assert rows[3]["compression_ratio"] is None


def test_kmeans_tiny_corpus_caps_k(spark):
    from mpi_word_count_spark.operators.similarity import kmeans_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_centroids(df, k=8, iters=2)
    assert len(cents) == 3  # capped at corpus size, no IndexError
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmeans_centroids(df.filter("vec_id < 0"), k=4, iters=1)


def test_semantic_dedup_keeps_lowest_id_per_near_group(spark):
    from mpi_word_count_spark.operators.similarity import semantic_dedup

    # ids 0/1/2 point along +x (near-identical), ids 3/4 along +y
    def vec(base, eps):
        v = [0.0] * 8
        v[base] = 1.0
        v[(base + 4) % 8] = eps
        return v

    df = spark.createDataFrame(
        [
            (0, vec(0, 0.0)),
            (1, vec(0, 0.01)),
            (2, vec(0, 0.02)),
            (3, vec(1, 0.0)),
            (4, vec(1, 0.015)),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(df, threshold=0.9, n_clusters=2, kmeans_iters=3).collect()
    }
    assert rows[0]["kept"] and rows[0]["dup_of"] is None
    assert not rows[1]["kept"] and rows[1]["dup_of"] == 0
    assert not rows[2]["kept"] and rows[2]["dup_of"] == 0  # greedy: min id wins
    assert rows[3]["kept"]
    assert not rows[4]["kept"] and rows[4]["dup_of"] == 3
    # the two groups never cross-mark: clusters bound the comparison
    assert rows[1]["cluster"] == rows[0]["cluster"]
    assert rows[3]["cluster"] != rows[0]["cluster"]


def test_repetition_scores_flags_looping_text(spark):
    from mpi_word_count_spark.operators.textanalysis import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),  # one-token loop
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # all unique
            (3, "the cat sat the cat sat the cat sat the cat sat"),  # 3-gram loop
            (4, ""),  # token-less → all zeros, not repetitive
            (5, "one"),  # single token: top_frac 1.0, no n-grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert rows[1]["top_token_frac"] == 1.0 and rows[1]["repetitive"]
    assert rows[2]["top_token_frac"] < 0.2
    assert not rows[2]["repetitive"]
    # "the cat sat" ×4: every 3-gram occurs >1 time except none are unique
    assert rows[3]["dup_3gram_frac"] == 1.0 and rows[3]["repetitive"]
    assert rows[4]["n_tokens"] == 0 and not rows[4]["repetitive"]
    assert rows[4]["top_token_frac"] == 0.0
    assert rows[5]["top_token_frac"] == 1.0
    assert rows[5]["dup_2gram_frac"] == 0.0


def test_pq_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from mpi_word_count_spark.operators.similarity import ann_pq_topk
    from mpi_word_count_spark.tables import table
    from tests.conftest import SF_DIR

    emb = table(spark, "embeddings", SF_DIR)
    q = emb.filter(F.col("vec_id") < 10)
    bf = ann_bruteforce_topk(emb, q, k=5).collect()
    pq = ann_pq_topk(emb, q, k=5, rerank=25).collect()
    bf_pairs = {(r["q_id"], r["neighbor_id"]) for r in bf}
    pq_pairs = {(r["q_id"], r["neighbor_id"]) for r in pq}
    # exact re-rank over 25 ADC candidates: high recall expected
    recall = len(bf_pairs & pq_pairs) / len(bf_pairs)
    assert recall >= 0.6, recall
    # determinism: second run bit-identical
    pq2 = ann_pq_topk(emb, q, k=5, rerank=25).collect()
    assert sorted(map(tuple, pq)) == sorted(map(tuple, pq2))


def test_doc_chunks_udtf_twin_matches_builtin(spark):
    """The Python-UDTF lateral-join surface (SURVEY §2.8) must produce
    bit-identical rows to the builtin sequence/transform/explode path
    — one chunking semantics, two APIs."""
    from pyspark.sql import functions as F

    from mpi_word_count_spark.operators.dedup import tokens_col
    from mpi_word_count_spark.operators.textanalysis import (
        doc_chunks,
        make_doc_chunks_udtf,
    )
    from mpi_word_count_spark.tables import table

    docs = table(spark, "documents", "/root/testdata/sf0.001")
    builtin = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_hash"])
        for r in doc_chunks(docs).collect()
    }

    spark.udtf.register("doc_chunks_udtf", make_doc_chunks_udtf())
    docs.select("doc_id", tokens_col("text").alias("_toks")).createOrReplaceTempView(
        "_chunk_in"
    )
    via_udtf = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_hash"])
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM _chunk_in d, LATERAL doc_chunks_udtf(d._toks) c"
        ).collect()
    }
    assert builtin == via_udtf
    assert len(builtin) > 0


def test_ivfpq_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from mpi_word_count_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivfpq_topk,
    )
    from mpi_word_count_spark.tables import table
    from tests.conftest import SF_DIR

    emb = table(spark, "embeddings", SF_DIR)
    q = emb.filter(F.col("vec_id") < 10)
    bf = ann_bruteforce_topk(emb, q, k=5).collect()
    pq = ann_ivfpq_topk(emb, q, k=5).collect()
    bf_pairs = {(r["q_id"], r["neighbor_id"]) for r in bf}
    pq_pairs = {(r["q_id"], r["neighbor_id"]) for r in pq}
    # double approximation (list pruning AND code quantization) —
    # bounded below by the coarser of the two single approximations'
    # floors, and exact re-rank keeps it near IVF-flat in practice
    recall = len(bf_pairs & pq_pairs) / len(bf_pairs)
    assert recall >= 0.5, recall


def test_skipgram_pmi_window_pairs(spark):
    """±2 window over 'a b c d': adjacent (a,b)(b,c)(c,d) + skip-1
    (a,c)(b,d), canonicalized unordered — 'c a' counts as (a,c)."""
    from mpi_word_count_spark.operators.textanalysis import skipgram_pmi

    df = spark.createDataFrame([("a b c d",), ("c a",)], "text string")
    out = skipgram_pmi(df, window=2, min_count=1, k=None).collect()
    counts = {(r["w1"], r["w2"]): r["n_occurrences"] for r in out}
    assert counts == {
        ("a", "b"): 1,
        ("b", "c"): 1,
        ("c", "d"): 1,
        ("a", "c"): 2,  # skip-1 in doc 1 + adjacent reversed in doc 2
        ("b", "d"): 1,
    }
    # single-token and empty docs contribute no pairs, no errors
    df2 = spark.createDataFrame([("a",), ("",)], "text string")
    assert skipgram_pmi(df2, window=2, min_count=1, k=None).count() == 0


def test_phash_media_bit_semantics(spark):
    """dHash bits on crafted payloads: strictly increasing bytes give
    all-zero bits, strictly decreasing give all-one bands (0xFFFF),
    empty and single-byte payloads are all-zero, identical payloads
    collide exactly."""
    from mpi_word_count_spark.operators.multimodal import phash_dups, phash_media

    rows = [
        (1, bytes(range(65)), ("m", 65, "s")),
        (2, bytes(reversed(range(65))), ("m", 65, "s")),
        (3, b"", ("m", 0, "s")),
        (4, b"x", ("m", 1, "s")),
        (5, bytes(range(65)), ("m", 65, "s")),  # dup of 1
    ]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, media binary, "
        "meta struct<mime:string,n_bytes:bigint,source:string>",
    )
    got = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in phash_media(df).collect()}
    assert got[1] == (0, 0, 0, 0)
    assert got[2] == (0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
    assert got[3] == (0, 0, 0, 0) == got[4]
    assert got[5] == got[1]
    # the banded join pairs every hamming-0 collision exactly once:
    # (1,5) identical payloads plus (3,4) both-degenerate all-zero
    pairs = {(r["media_id_1"], r["media_id_2"]): r["hamming"]
             for r in phash_dups(phash_media(df)).collect()}
    assert pairs == {(1, 5): 0, (1, 3): 0, (1, 4): 0, (3, 4): 0,
                     (3, 5): 0, (4, 5): 0}


def test_positional_index_positions(spark):
    from mpi_word_count_spark.operators.textanalysis import positional_index

    df = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "be")], "doc_id long, text string"
    )
    got = {
        (r["token"], r["doc_id"]): (r["tf"], r["first_pos"], r["positions"])
        for r in positional_index(df).collect()
    }
    # 1-based positions, numerically sorted (not lexically: 10 > 9)
    assert got[("to", 1)] == (2, 1, "1,5")
    assert got[("be", 1)] == (2, 2, "2,6")
    assert got[("or", 1)] == (1, 3, "3")
    assert got[("not", 1)] == (1, 4, "4")
    assert got[("be", 2)] == (1, 1, "1")
    assert len(got) == 5


def test_phrase_search_matches_inline_scan(spark):
    """The index-join phrase matcher must agree with a direct in-row
    scan for the same trigram, and every hit must be a real adjacency
    (first_pos anchored 1-based)."""
    from tests.conftest import SF_DIR

    from mpi_word_count_spark.operators.dedup import tokens_col
    from mpi_word_count_spark.queries.text_queries import q_phrase_search
    from mpi_word_count_spark.tables import table

    rows = q_phrase_search(spark, SF_DIR).collect()
    assert rows
    phrase = rows[0]["phrase"]
    w = phrase.split(" ")
    assert len(w) == 3
    docs = table(spark, "documents", SF_DIR)
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", tokens_col("text").alias("t")).collect()
    }
    expect = {}
    for did, t in toks.items():
        hits = [
            i + 1
            for i in range(len(t) - 2)
            if t[i] == w[0] and t[i + 1] == w[1] and t[i + 2] == w[2]
        ]
        if hits:
            expect[did] = (len(hits), hits[0])
    got = {r["doc_id"]: (r["n_occurrences"], r["first_pos"]) for r in rows}
    assert got == expect


def test_ann_filtered_respects_predicate(spark):
    """Every returned neighbor must share the query's label, and the
    result must equal the bruteforce top-k computed over ONLY the
    label-matching subset (the post-filter-of-unfiltered-topk bug
    this query exists to avoid returns fewer/different rows)."""
    from tests.conftest import SF_DIR

    from mpi_word_count_spark.operators.similarity import ann_bruteforce_topk
    from mpi_word_count_spark.queries.similarity_queries import (
        N_QUERIES,
        TOP_K,
        ann_filtered,
    )
    from mpi_word_count_spark.tables import table
    from pyspark.sql import functions as F

    rows = ann_filtered(spark, SF_DIR).collect()
    assert len(rows) == N_QUERIES * TOP_K
    emb = table(spark, "embeddings", SF_DIR)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert labels[r["q_id"]] == r["label"]
        assert labels[r["neighbor_id"]] == r["label"]

    # per-label bruteforce replication for one query
    q0 = rows[0]["q_id"]
    lab = labels[q0]
    sub = emb.filter(F.col("label") == lab)
    want = {
        (r["q_id"], r["neighbor_id"], r["rank"])
        for r in ann_bruteforce_topk(
            sub, sub.filter(F.col("vec_id") == q0), k=TOP_K
        ).collect()
    }
    got = {
        (r["q_id"], r["neighbor_id"], r["rank"])
        for r in rows
        if r["q_id"] == q0
    }
    assert got == want


def test_margin_alignment_mutual_pairs_and_hubness(spark):
    """Planted two-set alignment: a1<->b1 and a2<->b2 are true mutual
    pairs; b3 is a HUB (moderately close to everything in A) that a
    raw-cosine top-1 could latch onto, but the margin denominator
    (mean top-k cosine) discounts it. True pairs must come back
    mutual with margin > 1; no pair may involve the unmatched a3."""
    from pyspark.sql import functions as F

    from mpi_word_count_spark.operators.similarity import (
        margin_alignment_pairs,
    )

    rows = [
        # set A (label 0)
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [0.0, 0.0, 0.0, 1.0], 0),   # unmatched in B
        # set B (label 1)
        (11, [0.98, 0.02, 0.0, 0.0], 1),   # aligns with 1
        (12, [0.02, 0.98, 0.0, 0.0], 1),   # aligns with 2
        (13, [0.5, 0.5, 0.5, 0.0], 1),     # hub: near everything in A
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["a_id"], r["b_id"]): r["margin"]
        for r in margin_alignment_pairs(
            df, F.col("label") == 0, F.col("label") == 1, k=2
        ).collect()
    }
    assert (1, 11) in got and (2, 12) in got
    assert got[(1, 11)] > 1.0 and got[(2, 12)] > 1.0
    assert not any(a == 3 for a, _ in got)


def test_matrix_lit_bit_exact(spark):
    """_matrix_lit goes through a parsed SQL string; the values that
    come back must be the SAME binary64 doubles (shortest round-trip
    repr + correctly-rounded parse). Probe adversarial values: tiny
    magnitudes in exponent notation, negative zero, many-digit
    fractions, and the actual LSH planes."""
    import numpy as np

    from mpi_word_count_spark.operators.similarity import (
        _matrix_lit,
        lsh_planes,
    )

    rng = np.random.default_rng(17)
    rows = [
        [1e-300, -1e-300, 5e-324, -0.0, 0.1, -0.3333333333333333],
        list(rng.uniform(-1, 1, 8)),
        list(rng.normal(0, 1e-9, 8)),
        [float(np.nextafter(1.0, 2.0)), float(np.nextafter(-1.0, -2.0))],
    ]
    for matrix in (rows[:1], rows[1:3], [rows[3]], lsh_planes(4, 16)):
        got = (
            spark.range(1)
            .select(_matrix_lit(matrix).alias("m"))
            .collect()[0]["m"]
        )
        for want_row, got_row in zip(matrix, got):
            for want, g in zip(want_row, got_row):
                assert g == float(want) and (
                    # -0.0 == 0.0 under ==; pin the sign bit too
                    np.signbit(g) == np.signbit(float(want))
                ), (want, g)


def test_retrieval_eval_matches_numpy_reference(spark):
    """Recompute the full metric suite in numpy with TRUE log2 gains
    and standard AP/MRR formulas: integer columns must match exactly,
    float metrics within the micro-quantization (<2e-4)."""
    import math

    import numpy as np
    import pandas as pd

    from mpi_word_count_spark.queries.similarity_queries import (
        EVAL_K,
        N_QUERIES,
        q_retrieval_eval_metrics,
    )
    from tests.conftest import SF_DIR

    got = {r["q_id"]: r for r in q_retrieval_eval_metrics(spark, SF_DIR).collect()}
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    qm = ids < N_QUERIES
    assert set(got) == set(ids[qm])
    norms = np.linalg.norm(vecs, axis=1)
    for qi in np.where(qm)[0]:
        cm = ids >= N_QUERIES
        cos = np.round(
            (vecs[cm] @ vecs[qi]) / (norms[cm] * norms[qi]), 4
        )
        order = np.lexsort((ids[cm], -cos))[:EVAL_K]
        rel = (labels[cm][order] == labels[qi]).astype(int)
        n_rel = int((labels[cm] == labels[qi]).sum())
        row = got[ids[qi]]
        assert row["n_rel"] == n_rel
        assert row["hits"] == int(rel.sum())
        assert abs(row["precision_at_10"] - rel.sum() / EVAL_K) < 1e-9
        if n_rel:
            assert abs(row["recall_at_10"] - rel.sum() / n_rel) < 1e-3
        first = np.nonzero(rel)[0]
        mrr = 1.0 / (first[0] + 1) if len(first) else 0.0
        assert abs(row["mrr_at_10"] - mrr) < 1e-3
        cum = np.cumsum(rel)
        ap = (
            float((rel * cum / np.arange(1, EVAL_K + 1)).sum())
            / min(n_rel, EVAL_K)
            if n_rel
            else 0.0
        )
        assert abs(row["ap_at_10"] - ap) < 2e-4
        dcg = float((rel / np.log2(np.arange(2, EVAL_K + 2))).sum())
        idcg = sum(
            1.0 / math.log2(i + 2) for i in range(min(n_rel, EVAL_K))
        )
        ndcg = dcg / idcg if n_rel else 0.0
        assert abs(row["ndcg_at_10"] - ndcg) < 2e-4
    # non-vacuous: some query actually retrieves relevant items
    assert any(r["hits"] > 0 for r in got.values())


def test_readability_matches_python_replica(spark):
    import math
    import re

    import pandas as pd

    from mpi_word_count_spark.queries.text_queries import (
        q_readability_scores,
    )
    from mpi_word_count_spark.tokenizer import (
        DEFAULT_DELIMITERS,
        delimiter_regex,
    )
    from tests.conftest import SF_DIR

    got = {r["doc_id"]: r for r in q_readability_scores(spark, SF_DIR).collect()}
    pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    splitter = re.compile(delimiter_regex(DEFAULT_DELIMITERS))
    assert len(got) == len(pdf)
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        s = max(1, len(re.findall(r"[.!?]+", text)))
        w = max(1, sum(1 for t in splitter.split(text.lower()) if t))
        syl = max(1, len(re.findall(r"[aeiouy]+", text.lower())))
        fk = 0.39 * (w / s) + 11.8 * (syl / w) - 15.59
        ease = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        row = got[doc_id]
        assert (row["n_sentences"], row["n_words"], row["n_syllables"]) == (s, w, syl)
        assert row["fk_grade"] == math.floor(fk * 10000.0 + 0.5) / 10000.0
        assert row["reading_ease"] == math.floor(ease * 10000.0 + 0.5) / 10000.0
