"""Positional phrase search: hand-pinned matches, repeated-term
phrases, overlap semantics, and the no-corpus-shuffle claim."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _docs(spark):
    rows = [
        (1, "the fast table scans the fast table"),
        (2, "fast fast table"),
        (3, "table table table"),
        (4, "nothing relevant here"),
        (5, "fast Table"),  # lowercased by the operator
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, phrases):
    from gotrackmaster_spark.operators.search import phrase_search

    return {
        (r.phrase, r.doc_id): (r.n_matches, r.first_pos)
        for r in phrase_search(_docs(spark), phrases).collect()
    }


def test_simple_and_multiple_matches(spark):
    got = _run(spark, ["fast table"])
    assert got == {
        ("fast table", 1): (2, 1),
        ("fast table", 2): (1, 1),
        ("fast table", 5): (1, 0),
    }


def test_repeated_term_phrase_no_double_count(spark):
    # "table table" needs TWO postings at consecutive positions — a
    # single "table" matching both offsets must not count as a match.
    got = _run(spark, ["table table"])
    # doc 3: "table table table" → overlapping matches at 0 and 1
    assert got == {("table table", 3): (2, 0)}


def test_mixed_lengths_one_pass(spark):
    got = _run(spark, ["fast table", "the fast table", "nothing relevant here"])
    assert got[("the fast table", 1)] == (2, 0)
    assert got[("nothing relevant here", 4)] == (1, 0)
    assert ("the fast table", 2) not in got


def test_phrase_longer_than_doc_absent(spark):
    got = _run(spark, ["table table table table"])
    assert got == {}
