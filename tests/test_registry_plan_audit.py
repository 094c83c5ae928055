"""Registry-wide physical-plan audit: EVERY registered driver query must
compile without a cartesian product or a row-at-a-time Python UDF,
without a BroadcastNestedLoopJoin except the documented bounded cases
in BNLJ_ALLOWED, and without an ``Exchange SinglePartition`` fed by
unbounded data (the global-window/global-sort scale killer — see
``gotrackmaster_spark.plans.audit``).  This is the sweep that keeps a
future query from silently registering an all-pairs, per-row-Python, or
single-task-funnel plan.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from gotrackmaster_spark.plans.audit import unbounded_single_partitions  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# BNLJ survives ONLY where it is the documented, bounded contract:
#  - embedding_topk_exact: the bounded-Q brute-force rerank primitive
#    (ValueError above max_queries; scale paths are LSH/IVF)
#  - knn / knn_hex: the zero-candidate fallback for isolated query points
#    (gated, logged, bounded to the queries that found no ring candidates)
#  - hotspot_cells / lisa_cells / image_hotspots: the 1-row global-
#    moments broadcast of the spatial-statistics suite
#    (`spatial._with_moments`) — the build side is an aggregation
#    without grouping keys, so exactly one row
#  - knox_stat: the 1-row spatial-counts × 1-row temporal-count × 1-row
#    n join (all three sides are aggregations without grouping keys)
#  - ripley_k: the 1-row ladder-counts × 1-row n join (both sides are
#    aggregations without grouping keys)
BNLJ_ALLOWED = {
    "embedding_topk_exact",
    "knn",
    "knn_hex",
    "hotspot_cells",
    "lisa_cells",
    "image_hotspots",
    "ripley_k",
    "knox_stat",
    # clark_evans: 1-row total × 1-row near-aggregate scalar join (both
    # sides are ungrouped aggregations — the ripley_k shape)
    "clark_evans",
    # nn_gfunction / quadrat_test / cross_k / gravity_od: same 1-row
    # scalar-attach shape
    "nn_gfunction",
    "quadrat_test",
    "cross_k",
    "gravity_od",
    # term_pmi: 1-row corpus-size attach onto the pair table
    "term_pmi",
    # bm25_scores: 1-row (n_docs, tot_len) corpus-scalar attach
    "bm25_scores",
    # assoc_rules: 1-row basket-count attach onto the rule table
    "assoc_rules",
    # kendall_tau: three 1-row scalar aggregates joined (C/D, tie terms)
    "kendall_tau",
    # ks_statistic: 1-row (n1, n2) totals attach onto the value ladder
    "ks_statistic",
    # pps_sample: 1-row total-weight attach onto the per-user cumsum
    "pps_sample",
    # funnel_steps: three 1-row step-count aggregates attached onto the
    # 1-row distinct-user count (all sides ungrouped aggregations)
    "funnel_steps",
    # zipf_check: 1-row hapax/vocab scalar attach onto the top-20 rows
    "zipf_check",
    # graph_summary: two 1-row scalar attaches (node count, reciprocity)
    "graph_summary",
    # rrf_fusion: inherits bm25's 1-row corpus-scalar attach
    "rrf_fusion",
    # join_counts: 1-row median-threshold attach onto the count lattice
    "join_counts",
}

QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipattern_in_plan(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
    bad = unbounded_single_partitions(plan)
    assert not bad, f"{name}: unbounded SinglePartition fed by {bad}"
