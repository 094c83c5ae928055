"""Dedup / text / similarity operators: structural checks + LSH recall
against brute force."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_minhash_lsh_recall(spark):
    """LSH candidates verified with exact Jaccard must find most true
    near-dup pairs (J >= 1/2); false positives are impossible because the
    verify step recomputes exact Jaccard."""
    from gotrackmaster_spark.operators import dedup as D

    docs = _docs(spark)
    truth = {
        (r.a_id, r.b_id) for r in D.jaccard_pairs(docs, 1, 2).collect()
    }
    found = {
        (r.a_id, r.b_id) for r in D.minhash_lsh_dups(docs, 1, 2).collect()
    }
    assert found <= truth  # exact verify ⇒ no false positives
    if truth:
        assert len(found) / len(truth) >= 0.8


def test_embedding_lsh_recall(spark):
    from gotrackmaster_spark.operators import dedup as D

    emb = _emb(spark)
    truth = D.embedding_topk(emb, k=10, query_mod=100).collect()
    approx = D.embedding_lsh_topk(emb, k=10, query_mod=100).collect()
    truth_set = {(r.q_id, r.n_id) for r in truth}
    approx_set = {(r.q_id, r.n_id) for r in approx}
    assert truth_set, "no queries selected"
    # hyperplane LSH with 8 planes on 64-dim random vectors: recall is
    # modest by construction; assert the machinery overlaps meaningfully
    assert len(approx_set & truth_set) / len(truth_set) > 0.05


def test_simhash_pigeonhole_exact(spark):
    """Chunked candidate generation must find EVERY pair within the
    Hamming budget (pigeonhole guarantees it) — compare against the
    all-pairs scan on this small corpus."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators import dedup as D

    docs = _docs(spark)
    sig = D.simhash_signatures(docs)
    a = sig.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sh"))
    b = sig.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sh"))
    ham = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    brute = {
        (r.a_id, r.b_id)
        for r in a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("h", ham)
        .filter(F.col("h") <= 8)
        .collect()
    }
    fast = {(r.a_id, r.b_id) for r in D.simhash_near_dups(docs, max_hamming=8).collect()}
    assert fast == brute


def test_quality_score_bounds(spark):
    from gotrackmaster_spark.functions.text import quality_score_col

    docs = _docs(spark)
    rows = docs.select(quality_score_col("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_embedding_neardup_banded_no_cartesian(spark):
    """The registered near-dup path must be LSH-banded: every pair it
    emits is a true near-dup (exact verify => no false positives), the
    physical plan contains no cartesian/broadcast-nested-loop join, and
    recall vs brute force is measured and bounded below."""
    from gotrackmaster_spark.operators import dedup as D

    emb = _emb(spark)
    banded = D.embedding_near_dups(emb, threshold=0.4)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    truth = {(r.a_id, r.b_id) for r in
             D.embedding_near_dups_bruteforce(emb, threshold=0.4).collect()}
    found = {(r.a_id, r.b_id) for r in banded.collect()}
    assert found <= truth  # exact cosine verify => subset of brute force
    # cos ~ 0.4 pairs of random 64-d vectors are the LSH worst case
    # (per-plane agreement 0.63 vs 0.50 noise); 12 bands x 4 planes was
    # measured at ~0.8 recall on this corpus — bound loosely below
    if truth:
        assert len(found) / len(truth) >= 0.6


def test_embedding_neardup_planted_high_cos(spark):
    """At a realistic near-dup threshold (cos >= 0.9) the band OR-ing
    must reach ~perfect recall: plant exact+jittered duplicates among
    random vectors and require every planted pair found."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators import dedup as D

    emb = _emb(spark)
    # planted near-dups: vec_id+10000 is vec scaled by 1.001 with a tiny
    # deterministic per-dim jitter (cosine ~ 0.9999)
    jitter = F.expr(
        "transform(embedding, (x, i) -> CAST(x AS DOUBLE) * 1.001 + "
        "CAST((vec_id * 64 + i) % 7 AS DOUBLE) / 10000.0)"
    )
    dups = emb.limit(20).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        jitter.alias("embedding"),
    )
    base = emb.select("vec_id", F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"))
    corpus = base.unionByName(dups)
    found = D.embedding_near_dups(
        corpus, threshold=0.9, n_bands=12, planes_per_band=6
    ).collect()
    pairs = {(r.a_id, r.b_id) for r in found}
    planted = {(i, i + 10000) for i in
               [r.vec_id for r in emb.limit(20).collect()]}
    missing = planted - pairs
    assert not missing, f"missed planted near-dups: {sorted(missing)[:5]}"


def test_jaccard_stop_shingle_cap(spark):
    """A single corpus-wide hot shingle must NOT produce quadratic
    candidate pairs: append one common tail phrase to every doc, then
    compare candidate counts with and without the document-frequency cap
    (num=0 threshold admits every pair sharing >= 1 shingle, i.e. the raw
    candidate set of the inverted-index self-join)."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators import dedup as D

    n = 40
    docs = _docs(spark).limit(n).select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" zz common tail phrase repeated in every doc")).alias("text"),
    )
    uncapped = D.jaccard_pairs(docs, 0, 1, max_shingle_df=None).count()
    capped = D.jaccard_pairs(docs, 0, 1, max_shingle_df=10).count()
    assert uncapped == n * (n - 1) // 2  # hot shingles pair everything
    assert capped < uncapped / 4  # cap bounds the candidate blowup


def test_embedding_ivf_recall_and_plan(spark):
    """IVF ANN: no cross join in the plan (probe equi-join only), results
    are a subset of valid neighbors, recall vs exact brute force measured
    and bounded (nprobe/nlist sized for this corpus)."""
    from gotrackmaster_spark.operators import dedup as D

    emb = _emb(spark)
    exact = D.embedding_topk(emb, k=10, query_mod=100).collect()
    ivf = D.embedding_ivf_topk(emb, k=10, query_mod=100)
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = ivf.collect()
    exact_set = {(r.q_id, r.n_id) for r in exact}
    got_set = {(r.q_id, r.n_id) for r in got}
    assert exact_set
    # 4/16 lists probed => ~25% of the corpus scanned per query; random
    # 64-d vectors have weak cluster structure, so bound recall loosely —
    # the determinism/oracle guarantees are the point, measured recall is
    # reported by the assert message if it drifts
    recall = len(got_set & exact_set) / len(exact_set)
    assert recall > 0.2, f"IVF recall collapsed: {recall:.2f}"


def test_embedding_ivf_degenerate_empty_centroids(spark):
    """Degenerate input (too few rows to populate the centroid training
    stratum) must yield a typed EMPTY result, not an analysis error: a
    zero-element array() literal is NULL-typed and used to break
    array_position at analysis time (found by the degenerate-input sweep)."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators import dedup as D

    tiny = _emb(spark).orderBy("vec_id").limit(3)
    assert tiny.filter(
        F.col("vec_id") % D.IVF_CENT_EVERY == D.IVF_CENT_OFF).count() == 0
    out = D.embedding_ivf_topk(tiny)
    assert out.schema.simpleString() == (
        "struct<q_id:bigint,n_id:bigint,cos_r:double,rnk:int>")
    assert out.count() == 0


def test_connected_components_hand_graph(spark):
    """Min-label propagation on a hand graph: two chains and an isolated
    edge; labels must equal each component's minimum node id."""
    from gotrackmaster_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 12), (20, 21), (40, 41), (41, 42)],
        "a_id long, b_id long",
    )
    got = {r.v: r.l for r in connected_components(edges).collect()}
    assert got == {3: 3, 5: 3, 9: 3, 12: 3, 20: 20, 21: 20, 40: 40, 41: 40, 42: 40}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir mode (reliable df.checkpoint for executor-loss
    tolerance at cluster scale) must produce identical labels."""
    from gotrackmaster_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 12), (20, 21), (40, 41), (41, 42)],
        "a_id long, b_id long",
    )
    got = {
        r.v: r.l
        for r in connected_components(
            edges, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == {3: 3, 5: 3, 9: 3, 12: 3, 20: 20, 21: 20, 40: 40, 41: 40, 42: 40}


def test_connected_components_nonconvergence(spark):
    """A chain whose diameter exceeds max_iter must NOT silently return
    wrong labels: default raises; on_nonconverged='warn' logs and returns
    the partial labels."""
    import pytest

    from gotrackmaster_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a_id long, b_id long"
    )
    # max_iter=2 < default jump_after=3: jumping never engages, and the
    # remediation hint must SAY so instead of promising O(log diameter)
    with pytest.raises(ValueError, match="did NOT converge") as exc:
        connected_components(chain, max_iter=2)
    assert "NEVER engaged" in str(exc.value)
    partial = connected_components(chain, max_iter=2, on_nonconverged="warn")
    assert partial.count() == 13  # partial labels returned, loudly
    # with jumping engaged but the budget still too small, the hint
    # points at max_iter (the jump DID run)
    with pytest.raises(ValueError, match="did NOT converge") as exc:
        connected_components(chain, max_iter=2, jump_after=1)
    assert "engaged from round 1" in str(exc.value)
    # and with enough rounds the same chain converges to root 0
    full = {r.v: r.l for r in connected_components(chain, max_iter=20).collect()}
    assert set(full.values()) == {0}


def test_connected_components_log_diameter_convergence(spark):
    """Deferred pointer jumping makes convergence O(log diameter): a
    2000-edge chain (diameter 2000 — plain propagation needs 2000
    rounds) must converge inside the default 50-round cap even though
    the jump only starts at round `jump_after`.  This is the regression
    pin for the sf0.1 `raster_regions` failure, where a contiguous
    raster blob's diameter blew the cap that near-clique dedup graphs
    never approach."""
    from gotrackmaster_spark.operators.graph import connected_components

    n = 2000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    ).repartition(8)
    got = connected_components(chain, max_iter=50)  # raises if unconverged
    roots = {r.l for r in got.collect()}
    assert roots == {0}
    assert got.count() == n + 1


def test_embedding_topk_bounded_q_contract(spark):
    """embedding_topk is the exact brute-force primitive: exceeding
    max_queries must raise, pointing at the LSH/IVF scale paths."""
    import pytest
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.dedup import embedding_topk

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 7).cast("float") + 0.5 for i in range(4)]).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="max_queries"):
        embedding_topk(emb, k=2, query_mod=1, max_queries=5).collect()
    # under the cap (or with the guard disabled) it runs
    assert embedding_topk(emb, k=2, query_mod=20, max_queries=5).count() > 0
    assert embedding_topk(emb, k=2, query_mod=20, max_queries=None).count() > 0


def test_dedup_no_per_doc_broadcast_hints(spark):
    """The O(corpus) per-doc `sizes` table must NOT carry a broadcast
    hint (10⁹-doc OOM at scale).  jaccard_pairs keeps exactly one hint
    (the bounded hot-shingle table), minhash_lsh_dups exactly one (the
    candidate-pair semi-join side)."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.dedup import jaccard_pairs, minhash_lsh_dups

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "), F.col("id").cast("string")).alias("text"),
    )
    # with the (bounded, deliberately broadcast) hot-shingle cap disabled,
    # NO hint may remain anywhere in the jaccard plan — i.e. the per-doc
    # sizes joins are plain joins
    jp = jaccard_pairs(docs, max_shingle_df=None)
    jp_hints = jp._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    assert jp_hints == 0, f"jaccard_pairs(no cap) hints: {jp_hints} (want 0)"
    # minhash keeps exactly one hinted subtree: the bounded candidate-pair
    # semi-join side (referenced once); the sizes joins carry none
    mh = minhash_lsh_dups(docs)
    mh_hints = mh._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    assert mh_hints == 1, f"minhash_lsh_dups hints: {mh_hints} (want 1: candidates only)"


def test_tile_top_terms_ranking_contract(spark):
    """Rank must be (score DESC, term ASC) with the integer-quantized
    tf·Q DIV df score — verified against a Python replay at sf0.001."""
    from gotrackmaster_spark.driver_queries import (
        _TTT_K, _TTT_QUANT, q_tile_top_terms,
    )
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = {}
    for r in q_tile_top_terms(spark, sf).collect():
        got.setdefault(r["tile"], []).append(
            (r["rnk"], r["term"], r["tf"], r["df"], r["score"])
        )
    # python replay
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    dfc = {}
    for k, text in docs:
        for w in text.lower().split(" "):
            if w:
                dfc.setdefault(w, set()).add(k)
    # tile naming is engine-specific — only verify the per-tile ranking laws
    for tile_id, rows in got.items():
        rows = sorted(rows)
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _TTT_K
        for rnk, term, tfv, dfv, score in rows:
            assert score == (tfv * _TTT_QUANT) // dfv
            assert dfv == len(dfc[term])
        # strictly non-increasing score, term-ascending within equal score
        for a, b in zip(rows, rows[1:]):
            assert a[4] > b[4] or (a[4] == b[4] and a[1] < b[1])


def test_ohlc_and_type_runs_laws(spark):
    """OHLC: low ≤ open/close ≤ high, n_events sums to the table size.
    Runs: Σ run_len·n_runs = table size; single-element runs dominate a
    hash-random type column."""
    from gotrackmaster_spark.driver_queries import q_ohlc_bars, q_type_runs

    sf = "/root/testdata/sf0.001"
    bars = q_ohlc_bars(spark, sf).collect()
    n_total = spark.read.parquet(f"{sf}/events.parquet").count()
    assert sum(r["n_events"] for r in bars) == n_total
    for r in bars:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        if r["n_events"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]
    runs = q_type_runs(spark, sf).collect()
    assert sum(r["run_len"] * r["n_runs"] for r in runs) == n_total
    assert all(r["run_len"] >= 1 for r in runs)


def test_type_runs_islands_exactness(spark):
    """The two-row_number trick must reproduce hand-counted islands."""
    from pyspark.sql import functions as F
    from gotrackmaster_spark.operators import timeseries  # noqa: F401 (module import sanity)
    from gotrackmaster_spark import driver_queries as Q

    rows = []
    seq = ["a", "a", "b", "a", "a", "a", "b", "b", "c"]
    for i, t in enumerate(seq):
        rows.append(("u1", i, i, t))
    seq2 = ["b", "b"]
    for i, t in enumerate(seq2):
        rows.append(("u2", i, 100 + i, t))
    df = spark.createDataFrame(rows, "user_id string, ts long, event_id long, event_type string")
    from pyspark.sql import Window

    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        df.select(
            "user_id", "event_type",
            (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count("*").alias("run_len"))
    )
    got = sorted(
        (r["user_id"], r["event_type"], r["run_len"]) for r in runs.collect()
    )
    # u1: a×2, b×1, a×3, b×2, c×1; u2: b×2
    assert got == sorted([
        ("u1", "a", 2), ("u1", "b", 1), ("u1", "a", 3),
        ("u1", "b", 2), ("u1", "c", 1), ("u2", "b", 2),
    ])


def test_benford_digits_laws(spark):
    """Digits 1-9 only, shares sum to 1, expected sums to 1, and a
    hand-built corpus reproduces exact counts."""
    from gotrackmaster_spark.driver_queries import _BENFORD_EXP, q_benford_digits

    rows = q_benford_digits(spark, "/root/testdata/sf0.001").collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(_BENFORD_EXP.values()) - 1.0) < 1e-12
    for r in rows:
        assert r["expected"] == _BENFORD_EXP[r["digit"]]
        assert abs(r["deviation"] - (r["share"] - r["expected"])) < 1e-15
    # exact counts on a constructed table: values 1.00, 19.99, 0.02, 911.0
    import pandas as pd

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"value": [1.00, 19.99, 0.02, 911.0]})
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    got = dict(
        (r["digit"], r["n"])
        for r in df.select(digit.alias("digit")).groupBy("digit").count()
        .withColumnRenamed("count", "n").collect()
    )
    assert got == {1: 2, 2: 1, 9: 1}  # 100->1, 1999->1, 2->2, 91100->9


def test_delta_dedup_sides_and_threshold(spark):
    """Pairs must cross the split (new × old only) and satisfy the exact
    Jaccard threshold; planted copies are found."""
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.dedup import delta_jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, False),              # catalog original
        (1, base + " extra tail", False),
        (2, "totally different words " * 3, False),
        (10, base, True),              # new exact copy of 0 -> pair
        (11, "unrelated fresh content " * 3, True),
        (12, base + " extra tail", True),  # copy of 1 -> pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_new boolean")
    got = {
        (r["new_id"], r["old_id"]) for r in delta_jaccard_pairs(df).collect()
    }
    assert (10, 0) in got and (12, 1) in got
    assert all(n >= 10 > o for n, o in got)  # never new×new or old×old
    # exact copy: inter == s_new == s_old
    row = [r for r in delta_jaccard_pairs(df).collect() if r["new_id"] == 10 and r["old_id"] == 0][0]
    assert row["inter"] == row["s_new"] == row["s_old"] > 0


def test_ngram_novelty_bounds_and_known_values(spark):
    from gotrackmaster_spark.operators.dedup import ngram_novelty

    cat = "one two three four five six seven eight nine ten"
    rows = [
        (0, cat, False),
        (10, cat, True),                       # all shingles seen -> 0.0
        (11, "brand new never seen words here today friends", True),  # all novel -> 1.0
        (12, "tiny", True),                    # < k tokens -> no shingles, no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_new boolean")
    got = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert set(got) == {10, 11}
    assert got[10]["n_unseen"] == 0 and got[10]["novelty"] == 0.0
    assert got[11]["n_unseen"] == got[11]["n_shingles"] and got[11]["novelty"] == 1.0


def test_rolling_active_users_window_law(spark):
    """n_active_7d(day) must equal the exact distinct-user count over
    [day-6, day], replayed in Python at sf0.001."""
    from gotrackmaster_spark.driver_queries import (
        _RAU_WINDOW, _US_PER_DAY, q_rolling_active_users,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["t_day"]: r["n_active_7d"] for r in q_rolling_active_users(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").selectExpr(
        "user_id", f"unix_micros(CAST(ts AS timestamp)) DIV {_US_PER_DAY} AS day"
    ).collect()
    act = {}
    for r in ev:
        act.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(got)
    for d in days:
        exp = set()
        for back in range(_RAU_WINDOW):
            exp |= act.get(d - back, set())
        assert got[d] == len(exp), d
    # trailing days beyond the data (day_max + 6) still carry counts
    assert max(days) == max(act) + _RAU_WINDOW - 1


def test_markov_transitions_row_stochastic(spark):
    from gotrackmaster_spark.driver_queries import q_markov_transitions

    rows = q_markov_transitions(spark, "/root/testdata/sf0.001").collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-12, prev
        tot = sum(r["n"] for r in rs)
        for r in rs:
            assert r["p"] == r["n"] / tot


def test_funnel_steps_hand_built(spark):
    """Order matters: click BEFORE signup must not count as stage 2."""
    from gotrackmaster_spark.driver_queries import q_funnel_steps
    import os
    import tempfile

    rows = [
        # u1: full ordered funnel
        (1, 100, 1, "signup"), (1, 200, 2, "click"), (1, 300, 3, "purchase"),
        # u2: click precedes signup -> stops at stage 1
        (2, 100, 4, "click"), (2, 200, 5, "signup"),
        # u3: signup + click, purchase BEFORE click -> stage 2 only
        (3, 100, 6, "signup"), (3, 150, 7, "purchase"), (3, 200, 8, "click"),
        # u4: never signs up
        (4, 100, 9, "view"),
        # u5: same-ts tie broken by event_id: signup(id10) then click(id11) at equal ts
        (5, 100, 10, "signup"), (5, 100, 11, "click"), (5, 400, 12, "purchase"),
    ]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "tsec", "event_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["tsec"], unit="s")
    df = spark.createDataFrame(pdf[["user_id", "ts", "event_id", "event_type"]])
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = q_funnel_steps(spark, d).collect()[0]
    assert (got["n_users"], got["n_step1"], got["n_step2"], got["n_step3"]) == (
        5, 4, 3, 2,
    )


def test_chi2_contingency_known_table(spark):
    """A hand-built independent table yields chi2 = 0 exactly; a fully
    dependent one yields chi2 = n·min(r-1,c-1) (Cramér's V = 1)."""
    import math as m

    from gotrackmaster_spark.driver_queries import (
        _CHI_FMTS, _CHI_LANGS, q_chi2_contingency,
    )
    import os
    import tempfile

    def run(rows):
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["doc_id", "lang"])
        df = spark.createDataFrame(pdf)
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        return q_chi2_contingency(spark, d).collect()[0]

    # independence: every (lang, fmt) cell equal — doc_id % 3 cycles fmt
    rows = [(i, _CHI_LANGS[(i // 3) % 5]) for i in range(90)]
    got = run(rows)
    assert got["n"] == 90 and got["dof"] == 8
    assert abs(got["chi2"]) < 1e-9 and abs(got["cramers_v"]) < 1e-6
    # perfect dependence: lang determined by fmt (3 langs used)
    rows = [(i, _CHI_LANGS[i % 3]) for i in range(90)]
    got = run(rows)
    assert abs(got["chi2"] - 90 * 2) < 1e-9  # n·min(r-1,c-1) with k=2
    assert abs(got["cramers_v"] - 1.0) < 1e-12


def test_term_pmi_laws(spark):
    """pmi_q must equal the exact integer quotient from df/n_ab margins;
    always-co-occurring rare pairs rank above independent common ones."""
    from gotrackmaster_spark.driver_queries import _PMI_QUANT, q_term_pmi
    import duckdb

    sf = "/root/testdata/sf0.001"
    rows = q_term_pmi(spark, sf).collect()
    assert rows
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    docsets = {k: {w for w in t.lower().split(" ") if w} for k, t in docs}
    n = len(docsets)
    df = {}
    for s in docsets.values():
        for w in s:
            df[w] = df.get(w, 0) + 1
    for r in rows:
        n_ab = sum(1 for s in docsets.values() if r["t_a"] in s and r["t_b"] in s)
        assert r["n_ab"] == n_ab
        assert (r["df_a"], r["df_b"]) == (df[r["t_a"]], df[r["t_b"]])
        assert r["pmi_q"] == (n_ab * n * _PMI_QUANT) // (df[r["t_a"]] * df[r["t_b"]])


def test_cohort_retention_laws(spark):
    """offset-0 row of each cohort counts its full cohort; offsets are
    non-negative; cohort sizes partition the user base."""
    from gotrackmaster_spark.driver_queries import q_cohort_retention

    sf = "/root/testdata/sf0.001"
    rows = q_cohort_retention(spark, sf).collect()
    by_cohort = {}
    for r in rows:
        assert r["offset"] >= 0
        by_cohort.setdefault(r["cohort_week"], {})[r["offset"]] = r["n_users"]
    n_users = (
        spark.read.parquet(f"{sf}/events.parquet").select("user_id").distinct().count()
    )
    # every user appears in exactly one cohort's offset-0 cell
    assert sum(m[0] for m in by_cohort.values()) == n_users
    # retention never exceeds the cohort size
    for m in by_cohort.values():
        assert all(v <= m[0] for v in m.values())


def test_cell_flow_vectors_conservation(spark):
    """Global Σdx/Σdy over cells equals the endpoint-minus-start sum per
    user (telescoping legs); leg count = events − users."""
    from gotrackmaster_spark.driver_queries import q_cell_flow_vectors

    sf = "/root/testdata/sf0.001"
    rows = q_cell_flow_vectors(spark, sf).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_legs"] for r in rows) == n_events - n_users
    # telescoping: per user Σlegs = last − first; sum over users
    import duckdb

    con = duckdb.connect()
    tel = con.execute(f"""
        WITH pts AS (
          SELECT user_id, ts, event_id,
                 (event_id * 2654435761) % 1600000 AS x,
                 (event_id * 40503 + 7) % 3600000 AS y
          FROM read_parquet('{sf}/events.parquet')
        ),
        o AS (SELECT user_id,
                     first_value(x) OVER w AS x0, last_value(x) OVER w AS x1,
                     first_value(y) OVER w AS y0, last_value(y) OVER w AS y1
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        SELECT sum(DISTINCT_SUM.dx), sum(DISTINCT_SUM.dy) FROM (
          SELECT DISTINCT user_id, x1 - x0 AS dx, y1 - y0 AS dy FROM o
        ) DISTINCT_SUM
    """).fetchall()[0]
    assert sum(r["sum_dx"] for r in rows) == tel[0]
    assert sum(r["sum_dy"] for r in rows) == tel[1]


def test_user_burstiness_known_patterns(spark):
    """Uniform one-event-per-day ⇒ VMR 0; all events on one day of a
    long span ⇒ VMR ≈ burst size; single-day span ⇒ NULL."""
    import os
    import tempfile

    import pandas as pd

    from gotrackmaster_spark.driver_queries import q_user_burstiness

    rows = []
    # u1: 10 consecutive days, 1 event each
    for d in range(10):
        rows.append((1, d * 86400, len(rows)))
    # u2: 10 events on day 0 + 1 event on day 9 (bursty)
    for i in range(10):
        rows.append((2, 10, len(rows)))
    rows.append((2, 9 * 86400, len(rows)))
    # u3: single day only
    rows.append((3, 0, len(rows)))
    pdf = pd.DataFrame(rows, columns=["user_id", "tsec", "event_id"])
    pdf["ts"] = pd.to_datetime(pdf["tsec"], unit="s")
    df = spark.createDataFrame(pdf[["user_id", "ts", "event_id"]])
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["user_id"]: r for r in q_user_burstiness(spark, d).collect()}
    assert got[1]["vmr"] == 0.0 and got[1]["active_days"] == 10
    # u2: counts [10,0,...,0,1] over span 10: mean 1.1, ss = 101 - 1.1*11
    exp_vmr = ((101 - 1.1 * 11) / 9.0) / 1.1
    assert abs(got[2]["vmr"] - exp_vmr) < 1e-12
    assert got[2]["vmr"] > 5.0 > got[1]["vmr"]
    assert got[3]["vmr"] is None and got[3]["span_days"] == 1


def test_value_mad_exact_small_sets(spark):
    """Median and MAD must equal the textbook order statistics on
    hand-built odd and even groups."""
    import os
    import tempfile

    import pandas as pd

    from gotrackmaster_spark.driver_queries import q_value_mad

    rows = (
        [("a", v) for v in [1.0, 3.0, 100.0]]          # med 3, |d|=[2,0,97] -> MAD 2
        + [("b", v) for v in [1.0, 2.0, 3.0, 10.0]]    # med 2.5, |d|=[1.5,.5,.5,7.5] -> MAD 1.0
    )
    pdf = pd.DataFrame(rows, columns=["event_type", "value"])
    df = spark.createDataFrame(pdf)
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["event_type"]: r for r in q_value_mad(spark, d).collect()}
    assert (got["a"]["n"], got["a"]["median"], got["a"]["mad"]) == (3, 3.0, 2.0)
    assert (got["b"]["n"], got["b"]["median"], got["b"]["mad"]) == (4, 2.5, 1.0)


def test_ppjoin_equals_jaccard_pairs(spark):
    """The prefix filter is a pure candidate OPTIMIZATION: output sets
    must be identical to the full-inverted-index join, and the prefix
    index must actually be smaller than the full one."""
    from gotrackmaster_spark.operators.dedup import jaccard_pairs, ppjoin_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    full = {
        (r.a_id, r.b_id): (r.inter, r.sa, r.sb)
        for r in jaccard_pairs(docs).collect()
    }
    pp = {
        (r.a_id, r.b_id): (r.inter, r.sa, r.sb)
        for r in ppjoin_pairs(docs).collect()
    }
    assert pp == full
    assert full  # non-degenerate


def test_ppjoin_prefix_is_proper_subset(spark):
    """Prefix posting volume < full posting volume (the whole point)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.dedup import doc_shingles

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sh = doc_shingles(docs)
    dfreq = sh.groupBy("shingle_h").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle_h")
    ranked = (
        sh.join(dfreq, "shingle_h")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("sz", F.count("*").over(Window.partitionBy("doc_id")))
    )
    n_full = ranked.count()
    n_pref = ranked.filter(
        F.col("pos") <= F.col("sz") - F.expr("(sz + 1) DIV 2") + 1
    ).count()
    assert 0 < n_pref < n_full
    # threshold 1/2 keeps roughly half the postings (+1 slack per doc)
    assert n_pref <= n_full // 2 + docs.count()
