"""Invariants for training-sequence assembly (operators/packing.py):
chunk coverage/reconstruction, packing feasibility + order stability,
and partitioning-invariance of the sharded packer."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def test_chunks_cover_every_token_no_overlap(spark, docs):
    from gotrackmaster_spark.operators.packing import chunk_documents

    # stride == chunk -> a partition of the token stream: per-doc chunk
    # token counts must sum to the doc's token count
    chunks = chunk_documents(docs, chunk_tokens=32, stride_tokens=32)
    got = {
        r["doc_id"]: r["tot"]
        for r in chunks.groupBy("doc_id").agg(F.sum("n_toks").alias("tot")).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            (F.size(F.split("text", " "))).alias("n"),
        ).collect()
    }
    assert got == want


def test_chunk_windows_match_python_reference(spark, docs):
    from gotrackmaster_spark.operators.packing import chunk_documents

    chunk, stride = 16, 8
    rows = chunk_documents(docs, chunk_tokens=chunk, stride_tokens=stride).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    seen = set()
    for r in rows:
        toks = texts[r["doc_id"]].split(" ")
        s = r["chunk_id"] * stride
        assert r["n_toks"] == min(chunk, len(toks) - s)
        seen.add((r["doc_id"], r["chunk_id"]))
    # every expected window present, none extra
    want = {
        (d, s // stride)
        for d, t in texts.items()
        for s in range(0, len(t.split(" ")), stride)
    }
    assert seen == want


def test_packing_feasible_ordered_complete(spark, docs):
    from gotrackmaster_spark.operators.packing import pack_sequences

    budget = 128
    rows = pack_sequences(docs, budget=budget, n_shards=4).collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        fills = {}
        prev_seq = -1
        for r in rs:
            assert r["shard"] == r["doc_id"] % 4
            assert r["seq_id"] >= prev_seq  # non-decreasing in doc order
            prev_seq = r["seq_id"]
            fills[r["seq_id"]] = fills.get(r["seq_id"], 0) + r["n_toks"]
        for seq, fill in fills.items():
            docs_in = [r for r in rs if r["seq_id"] == seq]
            # a sequence over budget is only legal as a single oversize doc
            assert fill <= budget or len(docs_in) == 1
        # greedy tightness: first doc of seq k+1 did NOT fit in seq k
        for seq in sorted(fills)[:-1]:
            nxt = min(
                (r for r in rs if r["seq_id"] == seq + 1),
                key=lambda r: r["doc_id"],
            )
            assert fills[seq] + nxt["n_toks"] > budget


def test_packing_invariant_under_input_partitioning(spark, docs):
    from gotrackmaster_spark.operators.packing import pack_sequences

    a = sorted(map(tuple, pack_sequences(docs, 96, 4).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(13, "text"), 96, 4).collect())
    )
    assert a == b


def test_rejects_invalid_params(spark, docs):
    import pytest as _pytest

    from gotrackmaster_spark.operators.packing import chunk_documents, pack_sequences

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, stride_tokens=24)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, stride_tokens=0)
    with _pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
