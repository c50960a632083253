"""S1/S2 tokenizer semantics (reference tokenizer.c; FIXTURES.md F1)."""

from __future__ import annotations

import re

from mpi_word_count_spark.tokenizer import (
    DEFAULT_DELIMITERS,
    FILE_DELIMITERS,
    WHITESPACE_DELIMITERS,
    delimiter_regex,
    load_delimiters,
)


def py_split(text: str) -> list[str]:
    """Python-side reference for the engine's split (same regex)."""
    return [t for t in re.split(delimiter_regex(), text) if t != ""]


def test_alphabet_contents():
    # whitespace from tokenizer.c:7 plus every byte of delimiters.txt
    for c in "\n\t\r ":
        assert c in DEFAULT_DELIMITERS
    for c in "[]!\"#$%&'()*+,./:;<=>?@\\^_`|{}~-":
        assert c in DEFAULT_DELIMITERS
    # digits and letters are never delimiters (SURVEY S1)
    for c in "abz09":
        assert c not in DEFAULT_DELIMITERS
    assert set(DEFAULT_DELIMITERS) == set(WHITESPACE_DELIMITERS + FILE_DELIMITERS)


def test_regex_is_valid_and_literal():
    rx = delimiter_regex()
    pat = re.compile(rx)
    # every delimiter char matches; no non-delimiter does
    for c in DEFAULT_DELIMITERS:
        assert pat.fullmatch(c), repr(c)
    for c in "abc019é":
        assert not pat.match(c), repr(c)


def test_maximal_runs_no_empties():
    # delimiter runs yield no empty words (tokenizer.c:62-64)
    assert py_split("a,,b") == ["a", "b"]
    assert py_split(",,a,,") == ["a"]
    assert py_split("") == []
    assert py_split(",.;") == []


def test_brackets_and_dash_are_delimiters():
    # [ ] - are literal delimiters, not regex syntax (tokenizer.c:22-27)
    assert py_split("a[b]c-d") == ["a", "b", "c", "d"]
    assert py_split("x\\y^z") == ["x", "y", "z"]


def test_custom_alphabet(tmp_path):
    # whitespace is ALWAYS part of the alphabet, even with a custom
    # file (end_lines memcpy'd ahead of the file bytes, tokenizer.c:21)
    p = tmp_path / "delims.txt"
    p.write_text(";")
    delims = load_delimiters(str(p))
    assert delims == "\n\t\r ;"
    assert [t for t in re.split(delimiter_regex(delims), "a b;c_d") if t] == [
        "a",
        "b",
        "c_d",
    ]


def test_long_words_not_truncated():
    # reference UB at >=30 chars (cell.h:2); we keep unbounded strings
    w = "x" * 80
    assert py_split(f"{w},{w}") == [w, w]


# --- property-based S1 parity -----------------------------------------
# An independent model of the reference scan loop (tokenizer.c:47-79):
# walk chars, delimiters end the current word, runs yield nothing.
# The engine's regex must agree on arbitrary input.

from hypothesis import given, settings
from hypothesis import strategies as st

_ALPHABET = (
    "ab z09é漢"  # letters/digits/unicode/space
    + "[]!\"#$%&'()*+,./:;<=>?@\\^_`|{}~-"
    + "\n\t\r"
)


def c_model_tokenize(text: str) -> list[str]:
    words, cur = [], []
    for ch in text:
        if ch in DEFAULT_DELIMITERS:
            if cur:
                words.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        words.append("".join(cur))
    return words


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=200))
def test_split_matches_c_model(text):
    assert py_split(text) == c_model_tokenize(text)
