"""Aho–Corasick multi-pattern scan: automaton semantics (overlaps,
nested patterns — the cases the replace()-arithmetic oracle can't
express), the borderless invariant the term_scan_census oracle relies
on, and the Spark operator end-to-end."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mpi_word_count_spark.operators.textscan import (
    build_automaton,
    multi_pattern_counts,
    scan_counts,
)
from mpi_word_count_spark.queries.text_queries import TERM_SCAN_LEXICON


def _naive_counts(text: str, patterns) -> list[int]:
    return [
        sum(
            1
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        for p in patterns
    ]


def _ac_counts(text: str, patterns) -> list[int]:
    goto, fail, out = build_automaton(patterns)
    return scan_counts(text, goto, fail, out, len(patterns))


def test_overlapping_occurrences_counted():
    # "aba" occurs at 0 and 2 in "ababa" — overlap the oracle's
    # non-overlapping replace() would miss (it reports 1)
    assert _ac_counts("ababa", ["aba"]) == [2]
    text = "ababa"
    replace_count = (len(text) - len(text.replace("aba", ""))) // 3
    assert replace_count == 1  # why the census lexicon must be borderless


def test_nested_and_shared_prefix_patterns():
    pats = ["tab", "table", "able", "b"]
    assert _ac_counts("a table", pats) == [1, 1, 1, 1]
    assert _ac_counts("tabtab", pats) == [2, 0, 0, 2]


def test_census_lexicon_is_borderless():
    # borderless (no proper prefix == suffix) <=> same-pattern matches
    # cannot overlap <=> replace() arithmetic counts every occurrence
    for p in TERM_SCAN_LEXICON:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], f"{p!r} has border {p[:k]!r}"


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(alphabet="ab ", max_size=60),
    pats=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=4),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
def test_matches_naive_reference(text, pats):
    assert _ac_counts(text, pats) == _naive_counts(text, pats)


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        build_automaton(["a", ""])


def test_duplicate_patterns_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        multi_pattern_counts(df, ["a", "a"])


def test_operator_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "the table of tables"),
            (2, "no hits here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.pattern): r.hits
        for r in multi_pattern_counts(docs, ["table", "tab", "zz"]).collect()
    }
    # zero-hit pairs omitted; nested "tab" counted inside both "table"s
    assert rows == {(1, "table"): 2, (1, "tab"): 2}


def test_long_text_linear_scan(spark):
    # one pass over a repetitive megabyte: every period hit is found
    docs = spark.createDataFrame(
        [(7, "abcde " * 100_000)], "doc_id long, text string"
    )
    out = {
        r.pattern: r.hits
        for r in multi_pattern_counts(docs, ["abcde", "de a"]).collect()
    }
    assert out == {"abcde": 100_000, "de a": 99_999}
