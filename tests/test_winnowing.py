"""Robust winnowing (MOSS) — fingerprint selection + pair matching.

Pins: the k+w-1 match guarantee, rightmost-min tie-break, density
bound, short-document exclusion, and a Python brute-force replay of the
full selection on a deterministic corpus."""

import pytest

from gotrackmaster_spark.operators.dedup import (
    WINNOW_A,
    WINNOW_M,
    WINNOW_P,
    winnow_fingerprints,
    winnow_pairs,
)


def _gram_hash(text, pos, k):
    # 1-based pos, matching the SQL/Spark expression
    return (
        sum(
            ord(text[pos - 1 + j]) * (((j + 1) * WINNOW_A) % WINNOW_M)
            for j in range(k)
        )
        % WINNOW_P
    )


def _brute_winnow(text, k, w):
    n = len(text) - k + 1
    if n < w:
        return set()
    hs = [_gram_hash(text, i, k) for i in range(1, n + 1)]
    sel = set()
    for t in range(w - 1, n):
        window = hs[t - w + 1 : t + 1]
        m = min(window)
        # rightmost minimal
        j = max(idx for idx, h in enumerate(window) if h == m)
        sel.add((t - w + 1 + j + 1, m))  # 1-based position
    return sel


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs please and thanks",
        "abcabcabcabcabcabcabcabcabc",  # periodic: heavy hash ties
        "aaaaaaaaaaaaaaaaaaaaaaaaaa",   # constant: all ties -> rightmost
    ]
    k, w = 5, 4
    got = winnow_fingerprints(_docs(spark, texts), k=k, w=w).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fph))
    for i, t in enumerate(texts):
        assert by_doc.get(i, set()) == _brute_winnow(t, k, w), f"doc {i}"


def test_short_docs_excluded(spark):
    # len < k + w - 1 -> no full window -> no fingerprints
    k, w = 5, 4
    texts = ["x" * (k + w - 2), "y" * (k + w - 1)]
    got = winnow_fingerprints(_docs(spark, texts), k=k, w=w).collect()
    docs = {r.doc_id for r in got}
    assert 0 not in docs and 1 in docs


def test_density_bound(spark):
    # expected selected fraction ~ 2/(w+1) of grams; allow generous slack
    text = "".join(chr(97 + (i * i * 7 + i * 13) % 26) for i in range(400))
    k, w = 5, 8
    got = winnow_fingerprints(_docs(spark, [text]), k=k, w=w).collect()
    n_grams = len(text) - k + 1
    frac = len(got) / n_grams
    assert 0.05 < frac < 0.5


def test_shared_substring_guarantee(spark):
    # two docs sharing a >= k+w-1 char substring MUST share a fingerprint
    k, w = 5, 4
    shared = "zqvxkwpfjmybd"  # k + w - 1 = 8 <= 13 chars
    texts = [
        "leftpad-" + shared + "-onetail",
        "other-prefix-" + shared + "-differenttail",
    ]
    pairs = winnow_pairs(
        _docs(spark, texts), k=k, w=w, max_fp_df=None, min_shared=1
    ).collect()
    assert any(r.doc_a == 0 and r.doc_b == 1 for r in pairs)


def test_stop_fingerprint_cap(spark):
    # a fingerprint present in every doc is dropped by max_fp_df
    k, w = 5, 4
    shared = "zqvxkwpfjmybd"
    texts = [f"doc{i}-" + shared + f"-tail{i * i}" for i in range(6)]
    with_cap = winnow_pairs(
        _docs(spark, texts), k=k, w=w, max_fp_df=2, min_shared=1
    ).collect()
    no_cap = winnow_pairs(
        _docs(spark, texts), k=k, w=w, max_fp_df=None, min_shared=1
    ).collect()
    assert len(no_cap) >= 15  # all C(6,2) pairs share the block
    assert len(with_cap) < len(no_cap)
