"""Spatial anti-join (coverage gaps) — correctness + plan-shape pins.

Correctness: `point_in_polygon_anti` must return EXACTLY the complement
of `point_in_polygon_join`'s covered point set (same covering level, same
inclusion semantics), so any drift between the two paths fails here.

Plan shape: the points side must never be expanded or shuffled before
the final aggregate — the covering is rolled up to one row per cell and
broadcast, so the only hash exchanges are the tiny covering roll-up and
the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gotrackmaster_spark import driver_queries as Q
from gotrackmaster_spark.operators.spatial import (
    point_in_polygon_anti,
    point_in_polygon_join,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_anti_is_exact_complement_of_pip(spark):
    pts = Q.geo_events(spark, SF_DIR).select("event_id", "lat", "lon")
    polys = Q.rect_polygons(spark, SF_DIR)
    covered = {
        r.event_id
        for r in point_in_polygon_join(pts, polys, level=7)
        .select("event_id").distinct().collect()
    }
    uncovered = {
        r.event_id
        for r in point_in_polygon_anti(pts, polys, level=7)
        .select("event_id").collect()
    }
    all_ids = {r.event_id for r in pts.select("event_id").collect()}
    assert covered and uncovered, "degenerate fixture: one side empty"
    assert covered | uncovered == all_ids
    assert covered & uncovered == set()


def test_anti_output_has_no_duplicate_points(spark):
    pts = Q.geo_events(spark, SF_DIR).select("event_id", "lat", "lon")
    polys = Q.rect_polygons(spark, SF_DIR)
    out = point_in_polygon_anti(pts, polys, level=7)
    n = out.count()
    assert n == out.select("event_id").distinct().count()
    assert out.columns == ["event_id", "lat", "lon"]


def test_pip_antijoin_plan_no_points_expansion(spark):
    plan = _plan(Q.q_pip_antijoin(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # covering rolled up per cell, then broadcast left-outer against points
    assert "BroadcastHashJoin" in plan
    # three hash exchanges in the pre-AQE plan: the per-cell covering
    # roll-up appears once under EACH union branch (identical subtrees —
    # execution dedups them into a ReusedExchange) plus the final tile
    # aggregate; the points scan feeds the join, the filter split, and
    # the partial agg with no exchange of its own
    assert plan.count("Exchange hashpartitioning") == 3, plan
    # and neither exchange partitions on the points' id — the points
    # side is never shuffled
    assert "hashpartitioning(event_id" not in plan, plan


def test_od_matrix_plan_two_aggregates_no_join(spark):
    plan = _plan(Q.q_od_matrix(spark, SF_DIR))
    assert "Join" not in plan, plan
    # one shuffle on user_id (struct min/max partial-aggregates map-side),
    # one on the (o_cell, d_cell) pair key
    assert plan.count("Exchange hashpartitioning") == 2, plan
