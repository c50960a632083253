"""Golden tests for the flagship word count over F1-style corpora
(FIXTURES.md edge cases: case_mix, delim_runs, all_delims, cut_words,
tiny, long_words)."""

from __future__ import annotations

import pytest

from mpi_word_count_spark.operators.wordcount import (
    top_k_words,
    word_count_df,
    word_count_dir,
    word_count_per_file,
)
from mpi_word_count_spark.sinks import show_console, write_word_count_csv


def rows(df):
    return [(r["word"], r["count"]) for r in df.collect()]


def make_corpus(tmp_path, files: dict[str, str]) -> str:
    d = tmp_path / "corpus"
    d.mkdir()
    for name, content in files.items():
        (d / name).write_text(content)
    return str(d)


def test_case_mix(spark, tmp_path):
    # S2: case-insensitive counting, lowercase output (hash_map.c:27-28)
    path = make_corpus(tmp_path, {"a.txt": "Roma ROMA roma\nMilano milano"})
    assert rows(word_count_dir(spark, path)) == [("milano", 2), ("roma", 3)]


def test_delim_runs(spark, tmp_path):
    # runs of delimiters produce no empty words (tokenizer.c:62-64)
    path = make_corpus(tmp_path, {"a.txt": ",,a..b,,  \n\t c;;\n", "b.txt": ";;;,,,"})
    assert rows(word_count_dir(spark, path)) == [("a", 1), ("b", 1), ("c", 1)]


def test_all_delims(spark, tmp_path):
    # every char of the 38-char alphabet separates (is_delimeter)
    text = "w0[w1]w2!w3\"w4#w5$w6%w7&w8'w9(wa)wb*wc+wd,we.wf/wg:wh;wi<wj=wk>wl?wm@wn\\wo^wp_wq`wr|ws{wt}wu~wv-ww"
    path = make_corpus(tmp_path, {"a.txt": text})
    got = rows(word_count_dir(spark, path))
    assert len(got) == 33 and all(c == 1 for _, c in got)


def test_ordering_bytewise(spark, tmp_path):
    # S4: ascending bytewise order (strcmp ≡ binary collation for ASCII)
    path = make_corpus(tmp_path, {"a.txt": "zeta Alpha beta10 beta2"})
    assert [w for w, _ in rows(word_count_dir(spark, path))] == [
        "alpha",
        "beta10",
        "beta2",
        "zeta",
    ]


def test_multi_file_aggregation(spark, tmp_path):
    # corpus abstracted as one bag of words across files (S6 analog)
    path = make_corpus(
        tmp_path, {"a.txt": "x y\n", "b.txt": "y z\n", "c.txt": "z z\n"}
    )
    assert rows(word_count_dir(spark, path)) == [("x", 1), ("y", 2), ("z", 3)]


def test_per_file_lineage(spark, tmp_path):
    path = make_corpus(tmp_path, {"a.txt": "x y\n", "b.txt": "y\n"})
    df = word_count_per_file(spark, path)
    got = {(r["file"].rsplit("/", 1)[-1], r["word"]): r["count"] for r in df.collect()}
    assert got == {("a.txt", "x"): 1, ("a.txt", "y"): 1, ("b.txt", "y"): 1}


def test_top_k(spark):
    df = spark.createDataFrame(
        [("a a a b b c",)], "text string"
    )
    assert rows(top_k_words(df, k=2)) == [("a", 3), ("b", 2)]


def test_empty_dir_errors(spark, tmp_path):
    # reference errors on an empty corpus (word_count_mpi.c:415-422)
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(Exception):
        word_count_dir(spark, str(d)).collect()


def test_csv_sink(spark, tmp_path):
    # S5: CSV header `Word,Count` (word_count_mpi.c:137)
    df = word_count_df(spark.createDataFrame([("b a b",)], "text string"))
    out = str(tmp_path / "csv_results.csv")
    write_word_count_csv(df, out)
    content = open(out).read().splitlines()
    assert content == ["Word,Count", "a,1", "b,2"]


def test_console_sink(spark):
    # seq-oracle format `Key: %s -- Value: %ld` (cell.c:37-39)
    df = word_count_df(spark.createDataFrame([("b a b",)], "text string"))
    assert show_console(df) == ["Key: a -- Value: 1", "Key: b -- Value: 2"]
