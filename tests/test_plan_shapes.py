"""Physical-plan shape pins for the newest composite queries.

Companion to the explain-based asserts in tests/test_dedup_text.py: these
fail if a future refactor silently reintroduces a scale anti-pattern —
a cartesian/nested-loop join, a shuffle of the big (events) side of the
interval join, or a per-level re-scan in the tile pyramid.  String-level
checks over ``executedPlan().toString()`` (the pre-AQE physical plan, the
same surface the other plan tests use).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gotrackmaster_spark import driver_queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_events_broadcasts_and_never_shuffles_events(spark):
    plan = _plan(Q.q_interval_events(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate generation is a broadcast equi-join on the time bucket
    assert "BroadcastHashJoin" in plan
    # the only hash shuffle is the final groupBy(iv_id); the events scan
    # feeds the join directly (big side never exchanges pre-join)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_tile_pyramid_single_scan_two_exchanges(spark):
    plan = _plan(Q.q_tile_pyramid(spark, SF_DIR))
    # one scan of events regardless of pyramid depth (z8->z4 = 5 levels):
    # the explode-then-single-groupBy layout, not a per-level union re-scan
    assert plan.count("Scan parquet") == 1, plan
    assert "Generate explode" in plan
    # base tile aggregation + pyramid aggregation — exactly two shuffles
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan


def test_merge_rows_upsert_join_shape(spark):
    from gotrackmaster_spark.plans.checkpoint import Catalog

    tgt = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 20.0)], "k string, id int, value double"
    )
    src = spark.createDataFrame(
        [("a", 1, -1.0), ("c", 3, 30.0)], "k string, id int, value double"
    )
    merged = Catalog._merge_rows(
        tgt, src, ["k", "id"], "update", ["k", "id", "value"]
    )
    plan = _plan(merged)
    # full-outer on the key columns: a shuffled key join, never a
    # cartesian (full outer cannot broadcast, so SMJ/SHJ is the plan)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    assert "FullOuter" in plan


def test_merge_upsert_load_is_scan_only(spark):
    # after the merge, reading the table back is parquet scans + the
    # reporting aggregate — no join machinery leaks into the read path
    plan = _plan(Q.q_merge_upsert(spark, SF_DIR))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_classification_counts_plan(spark):
    # windows + one aggregation + the per-track left join (small<->small);
    # nothing quadratic
    plan = _plan(Q.q_classification_counts(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_doc_chunks_pure_codegen_no_python_no_shuffle(spark):
    plan = _plan(Q.q_doc_chunks(spark, SF_DIR))
    # chunking is split/sequence/explode/slice/hash — whole-stage codegen
    # end to end: no pandas/python eval, no exchange, one scan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan, plan
    assert plan.count("Scan parquet") == 1
    assert "Generate explode" in plan


def test_seq_packing_single_shard_shuffle(spark):
    plan = _plan(Q.q_seq_packing(spark, SF_DIR))
    # the serial greedy scan distributes by shard: exactly ONE hash
    # exchange (on the shard key) feeding one FlatMapGroupsInPandas
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "Join" not in plan


def test_poly_overlaps_cell_equijoin_never_all_pairs(spark):
    plan = _plan(Q.q_poly_overlaps(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidates from the shared covering cell (equi-join), then distinct
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dwell_cells_reuses_user_partitioning(spark):
    plan = _plan(Q.q_dwell_cells(spark, SF_DIR))
    assert "Join" not in plan, plan
    # the run aggregate reuses the window's hashpartitioning(user_id) —
    # only the window exchange and the final per-cell exchange remain
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_colocation_equijoin_no_forced_broadcast(spark):
    df = Q.q_colocation_pairs(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # size-based broadcast of the tiny occupancy side is fine at toy
    # scale; what must NOT exist is a FORCED broadcast hint (at 10^9
    # users the occupancy table cannot broadcast) — the logical plan
    # carries no hint, so the planner is free to pick SMJ at scale
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "hint" not in logical.lower(), logical
    # final aggregate shuffles on the pair key
    assert "hashpartitioning(user_a" in plan


def test_geofence_entries_covering_broadcast_only(spark):
    plan = _plan(Q.q_geofence_entries(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only broadcast is the tiny polygon covering; events reach the
    # PIP join via their per-user window, never via an events×polygons
    # expansion
    assert "BroadcastHashJoin" in plan


def test_dbscan_candidate_join_never_all_pairs(spark):
    from gotrackmaster_spark.operators.clustering import dbscan

    pts = Q.blob_points(spark, SF_DIR)
    out = dbscan(pts, 0.05, 6, id_col="event_id", x_col="lon", y_col="lat")
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_density_raster_counts_before_python(spark):
    plan = _plan(Q.q_density_raster_stats(spark, SF_DIR))
    # the (tile, sub-pixel) count aggregate must sit BELOW the render
    # FlatMapGroupsInPandas: points aggregate before any Python stage
    render_pos = plan.find("FlatMapGroupsInPandas")
    agg_pos = plan.find("HashAggregate", render_pos)
    assert render_pos != -1 and agg_pos != -1, plan


def test_track_diameter_single_exchange(spark):
    plan = _plan(Q.q_track_diameter(spark, SF_DIR))
    # ONE exchange (the group key), then the hull kernel in one Arrow
    # batch per group — never the O(n^2) self-join the oracle runs
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_mobility_stats_points_never_shuffled_raw(spark):
    plan = _plan(Q.q_mobility_stats(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the centroid table joins back onto the points via broadcast, and
    # the final ent-rog join is also broadcast — no sort-merge anywhere
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan
    # every hash exchange moves pre-aggregated rows (partial_ or the
    # per-(user,cell) counts), never the raw point rows: each exchange
    # is preceded by a partial hash aggregate in this plan
    assert plan.count("Exchange hashpartitioning") == 4, plan


def test_cell_morphology_no_points_scale_joins(spark):
    plan = _plan(Q.q_cell_morphology(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # dilation AND erosion have no join at all (occupancy==9 implies
    # membership); the two per-region count joins are on the (tiny)
    # cell-set side, and the points-scale distinct is cached so it
    # executes once across the three branches
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" in plan


def test_phrase_search_dictionary_broadcast(spark):
    plan = _plan(Q.q_phrase_search(spark, SF_DIR))
    # the (phrase, term, offset) dictionary joins the postings as a
    # broadcast build side — the corpus never shuffles for the join
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan.split("Exchange hashpartitioning")[0]


def test_ppjoin_no_cartesian_and_rowlocal_verify(spark):
    plan = _plan(Q.q_ppjoin_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the verify stage is row-local array_intersect — no second
    # corpus-wide aggregate keyed on the shingle hash after candidates
    assert "array_intersect" in plan


def test_bloom_semijoin_bits_broadcast(spark):
    plan = _plan(Q.q_bloom_semijoin(spark, SF_DIR))
    # the 128-bit set joins as a broadcast build side (left-semi)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_haar_energy_single_python_stage(spark):
    plan = _plan(Q.q_haar_energy(spark, SF_DIR))
    # ONE decode pass (mapInPandas) feeds the whole pyramid; the ×3
    # level explode and both aggregates are JVM-side
    assert plan.count("MapInPandas") <= 2  # synth + luma_plane decode
    assert "Generate explode" in plan


def test_pps_sample_two_level_cumsum_no_global_user_window(spark):
    """The cumulative-weight window over the USER table must be
    shard-partitioned (two-level cumsum); the only unpartitioned window
    allowed is the one over the per-shard totals."""
    plan = _plan(Q.q_pps_sample(spark, SF_DIR))
    user_wins = [
        ln for ln in plan.splitlines()
        if "Window [" in ln and "user_id" in ln
    ]
    assert user_wins, plan
    for ln in user_wins:
        assert "windowspecdefinition(shard" in ln, ln


def test_skew_profile_windows_only_over_count_histogram(spark):
    """rank_sum folds onto the per-count histogram (tie-invariance) —
    no ranking window may touch the O(keys) count table."""
    plan = _plan(Q.q_skew_profile(spark, SF_DIR))
    assert "row_number" not in plan, plan
    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert wins, plan
    for ln in wins:
        assert "windowspecdefinition(c#" in ln, ln


def test_shipping_priority_takeordered_not_global_window(spark):
    """The TPC-H Q3 top-10 must be a distributed TakeOrderedAndProject;
    the only row_number window allowed runs AFTER the limit (k rows)."""
    plan = _plan(Q.q_shipping_priority(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    # the ranking window must sit above the top-k, not above the full agg:
    # in the string plan the Window node appears before (above) TakeOrdered
    wpos = plan.find("Window [row_number()")
    tpos = plan.find("TakeOrderedAndProject")
    assert wpos != -1 and tpos != -1 and wpos < tpos, plan


def test_zipf_check_takeordered_not_global_window(spark):
    plan = _plan(Q.q_zipf_check(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    wpos = plan.find("Window [row_number()")
    tpos = plan.find("TakeOrderedAndProject")
    assert wpos != -1 and tpos != -1 and wpos < tpos, plan


def test_rrf_fusion_ranks_partitioned_topk_takeordered(spark):
    """Every per-doc ranking window must be PARTITIONED by its score key
    (two-level exact rank); unpartitioned windows may only carry the
    per-key histogram offsets (sum over _g), and the final top-k is a
    TakeOrderedAndProject, not a global row_number filter."""
    plan = _plan(Q.q_rrf_fusion(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    for ln in plan.splitlines():
        if "Window [row_number()" not in ln:
            continue
        # row_number over doc-scale tables must have a partition key:
        # windowspecdefinition(<part>, doc_id ASC ...) — i.e. doc_id is
        # NOT the first argument unless this is the k-row final ranking
        # (which orders by rrf_q and sits above TakeOrdered).
        spec = ln.split("windowspecdefinition(", 1)[1]
        first = spec.split(",")[0]
        assert ("ASC" not in first and "DESC" not in first) or "rrf_q" in first, ln


def test_graph_summary_rank_sum_histogram_fold(spark):
    """rank_sum folds onto the per-weight histogram — no row_number over
    the O(edges) table; unpartitioned windows only over the histogram."""
    plan = _plan(Q.q_graph_summary(spark, SF_DIR))
    assert "row_number" not in plan, plan


def test_vocab_growth_two_level_bucket_cumsum(spark):
    """The bucket-ladder cumulative must be shard-partitioned; the only
    unpartitioned window runs over the per-shard totals."""
    plan = _plan(Q.q_vocab_growth(spark, SF_DIR))
    bucket_wins = [
        ln for ln in plan.splitlines()
        if "Window [" in ln and "b#" in ln and "windowspecdefinition" in ln
    ]
    for ln in bucket_wins:
        if "sum(nt" in ln or "sum(tk" in ln or "cv_in" in ln or "ct_in" in ln:
            assert "windowspecdefinition(shard" in ln, ln


def test_single_partition_detector_fires_and_clears(spark):
    """The registry-wide unbounded-SinglePartition audit (plans/audit.py)
    must FLAG a global window over a scan (the pps_sample defect class)
    and PASS a global ungrouped aggregate (the legitimate 1-row funnel) —
    proves the registry sweep in test_registry_plan_audit is not
    vacuously green."""
    from pyspark.sql import Window

    from gotrackmaster_spark.plans.audit import unbounded_single_partitions

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bad = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("event_id"))
    )
    assert unbounded_single_partitions(_plan(bad)), "global window not flagged"

    good = ev.agg(F.count("*").alias("n"))
    assert unbounded_single_partitions(_plan(good)) == []

    # global sort of pre-aggregated rows is also fine (bounded feed)
    ranked = ev.groupBy("user_id").count().orderBy("count")
    assert unbounded_single_partitions(_plan(ranked)) == []


def test_single_partition_detector_resolves_reused_exchange():
    """ReusedExchange must be resolved to the original exchange by
    plan_id and audited through it, not assumed bounding (the round-4
    review's false-negative class).  Synthetic tree drawings — the
    detector is a pure string walker, so hand-written plans are the
    direct test vector for shapes Spark only emits in large plans."""
    from gotrackmaster_spark.plans.audit import unbounded_single_partitions

    # reuse of a raw (scan-fed) hash exchange feeding a global sort:
    # the old detector passed this silently; it must flag now
    leaky = """
Union
:- HashAggregate(keys=[a#1], functions=[count(1)])
:  +- Exchange hashpartitioning(a#1, 32), ENSURE_REQUIREMENTS, [plan_id=5]
:     +- Scan parquet [a#1]
+- Sort [a#2 ASC NULLS FIRST], true, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- ReusedExchange [a#2], Exchange hashpartitioning(a#1, 32), ENSURE_REQUIREMENTS, [plan_id=5]
"""
    assert unbounded_single_partitions(leaky), "reused raw exchange not flagged"

    # same shape but the original exchange is fed by a partial aggregate:
    # the reused output is bounded, so the SinglePartition feed is clean
    bounded = """
Union
:- HashAggregate(keys=[a#1], functions=[count(1)])
:  +- Exchange hashpartitioning(a#1, 32), ENSURE_REQUIREMENTS, [plan_id=5]
:     +- HashAggregate(keys=[a#1], functions=[partial_count(1)])
:        +- Scan parquet [a#1]
+- Sort [a#2 ASC NULLS FIRST], true, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- ReusedExchange [a#2], Exchange hashpartitioning(a#1, 32), ENSURE_REQUIREMENTS, [plan_id=5]
"""
    assert unbounded_single_partitions(bounded) == []

    # a reuse of a SinglePartition exchange is accepted HERE (the
    # original site carries the finding — exactly once, not twice)
    reused_sp = """
Union
:- Sort [a#1 ASC NULLS FIRST], true, 0
:  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
:     +- Scan parquet [a#1]
+- Sort [a#2 ASC NULLS FIRST], true, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- ReusedExchange [a#2], Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
"""
    assert len(unbounded_single_partitions(reused_sp)) == 1

    # an unresolvable reuse (no plan_id anywhere) is conservatively
    # treated as unbounded
    unresolvable = """
Sort [a#2 ASC NULLS FIRST], true, 0
+- Exchange SinglePartition
   +- ReusedExchange [a#2], Exchange hashpartitioning(a#1, 32)
"""
    assert unbounded_single_partitions(unresolvable), "unresolvable reuse not flagged"
