"""Integer-quantized Okapi BM25 (operators/search.py).

Pins: a full Python replay of the integer arithmetic, the BM25 laws
(tf monotone, rare-term > common-term, length penalty), and the
matched-terms-only contract."""

import pytest

from gotrackmaster_spark.operators.search import BM25_QUANT, bm25_scores


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, terms, quant=BM25_QUANT):
    toks = [[w for w in t.lower().split(" ") if w] for t in texts]
    n = len(toks)
    tot = sum(len(ws) for ws in toks)
    df = {t: sum(1 for ws in toks if t in ws) for t in terms}
    out = {}
    for i, ws in enumerate(toks):
        score, n_terms = 0, 0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            n_terms += 1
            idf_q = ((n - df[t]) * quant) // df[t]
            score += (idf_q * tf * 44 * tot) // (
                20 * tot * tf + 6 * tot + 18 * len(ws) * n
            )
        if n_terms:
            out[i] = (n_terms, score)
    return out


def _run(spark, texts, terms):
    rows = bm25_scores(_docs(spark, texts), terms).collect()
    return {r.doc_id: (r.n_terms, r.score) for r in rows}


def test_python_replay(spark):
    texts = [
        "alpha beta gamma delta alpha",
        "beta beta beta common words here",
        "gamma alpha alpha alpha longer doc with many extra filler words",
        "totally unrelated content",
        "alpha",
    ]
    terms = ["alpha", "gamma"]
    assert _run(spark, texts, terms) == _brute(texts, terms)


def test_only_matching_docs_emitted(spark):
    texts = ["alpha beta", "no match here", "gamma"]
    got = _run(spark, texts, ["alpha", "gamma"])
    assert set(got) == {0, 2}


def test_tf_monotone_same_length(spark):
    # same doc length, more query-term occurrences -> higher score
    texts = ["alpha pad pad pad", "alpha alpha pad pad", "x y z w"]
    got = _run(spark, texts, ["alpha"])
    assert got[1][1] > got[0][1]


def test_rare_term_outscores_common(spark):
    # 'rare' in 1 of 6 docs, 'common' in 5 of 6; one occurrence each in
    # equal-length probe docs
    texts = [
        "rare pad pad",
        "common pad pad",
        "common a b",
        "common c d",
        "common e f",
        "common g h",
    ]
    got = _run(spark, texts, ["rare", "common"])
    assert got[0][1] > got[1][1]


def test_length_penalty(spark):
    # one occurrence each; longer doc scores lower
    texts = ["alpha pad", "alpha pad pad pad pad pad pad pad", "q r s"]
    got = _run(spark, texts, ["alpha"])
    assert got[0][1] > got[1][1]


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_scores(_docs(spark, ["a"]), [])
