"""Map-matching (spatial.map_match_join): clamped-projection geometry,
deterministic tie-breaks, and the broadcast-covering plan shape."""

from __future__ import annotations

import math
import re
import sys

sys.path.insert(0, "/root/repo")


def _segs(spark, rows):
    return spark.createDataFrame(rows, "seg_id long, x0 double, y0 double, x1 double, y1 double")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "event_id long, lat double, lon double")


def test_projection_clamps_to_endpoints(spark):
    from gotrackmaster_spark.operators.spatial import map_match_join

    segs = _segs(spark, [(1, 0.0, 0.0, 1.0, 0.0)])  # unit segment on y=0
    pts = _pts(
        spark,
        [
            (10, 0.2, 0.5),   # foot inside: perpendicular dist 0.2
            (11, 0.0, -0.3),  # beyond x0: clamps to (0,0), dist 0.3
            (12, 0.4, 1.3),   # beyond x1: clamps to (1,0), dist 0.5
        ],
    )
    got = {
        r.event_id: r.dist_deg
        for r in map_match_join(pts, segs, radius_deg=1.0, grid_deg=1.0).collect()
    }
    assert got[10] == 0.2
    assert got[11] == 0.3
    assert math.isclose(got[12], 0.5, abs_tol=1e-7)


def test_nearest_segment_not_nearest_endpoint(spark):
    from gotrackmaster_spark.operators.spatial import map_match_join

    # B's endpoint (0.5, 0.25) is nearer the probe (0.2, 0.5) than A's
    # endpoints, but the PERPENDICULAR foot on A (dist 0.2) wins — the
    # thing a nearest-endpoint join would get wrong.
    segs = _segs(spark, [(1, 0.0, 0.0, 1.0, 0.0), (2, 0.25, 0.25, 0.25, 2.0)])
    pts = _pts(spark, [(10, 0.2, 0.5)])
    [row] = map_match_join(pts, segs, radius_deg=1.0, grid_deg=1.0).collect()
    assert (row.seg_id, row.dist_deg) == (1, 0.2)


def test_rounded_radius_boundary_sliver_is_covered(spark):
    from gotrackmaster_spark.operators.spatial import map_match_join

    # True distance 0.5 + 2e-8 rounds to 0.5000000 <= r, so the point is
    # ACCEPTED by the rounded predicate; the covering must therefore be
    # expanded past r (by the 7-dp rounding window) or the match depends
    # on which grid cell the point lands in.  Here the point sits in
    # gx=1 while an exact-r expansion of the segment bbox ends at 0.6.
    segs = _segs(spark, [(1, 0.0, 0.0, 0.1, 0.0)])  # lon 0..0.1, lat 0
    pts = _pts(spark, [(10, 0.0, 0.60000002)])
    [row] = map_match_join(pts, segs, radius_deg=0.5, grid_deg=0.5).collect()
    assert row.seg_id == 1 and row.dist_deg == 0.5


def test_equidistant_tie_breaks_on_smaller_seg_id(spark):
    from gotrackmaster_spark.operators.spatial import map_match_join

    # two parallel segments 0.2 above/below the probe — exact tie
    segs = _segs(spark, [(7, 0.0, 0.2, 1.0, 0.2), (3, 0.0, -0.2, 1.0, -0.2)])
    pts = _pts(spark, [(10, 0.0, 0.5)])
    [row] = map_match_join(pts, segs, radius_deg=1.0, grid_deg=1.0).collect()
    assert row.seg_id == 3 and row.dist_deg == 0.2


def test_degenerate_zero_length_segment(spark):
    from gotrackmaster_spark.operators.spatial import map_match_join

    segs = _segs(spark, [(1, 0.5, 0.5, 0.5, 0.5)])
    pts = _pts(spark, [(10, 0.5, 0.9), (11, 3.0, 3.0)])  # 11 out of radius
    rows = map_match_join(pts, segs, radius_deg=1.0, grid_deg=1.0).collect()
    assert len(rows) == 1
    assert rows[0].event_id == 10 and math.isclose(rows[0].dist_deg, 0.4, abs_tol=1e-7)


def test_plan_broadcasts_covering_and_never_shuffles_points_pre_join(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.spatial import map_match_join

    pts = spark.range(5000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 31) % 100 / 10.0).alias("lat"),
        ((F.col("id") * 17) % 100 / 10.0).alias("lon"),
    )
    segs = spark.range(50).select(
        F.col("id").alias("seg_id"),
        ((F.col("id") * 13) % 100 / 10.0).alias("x0"),
        ((F.col("id") * 7) % 100 / 10.0).alias("y0"),
        (((F.col("id") * 13) % 100 / 10.0) + 0.1).alias("x1"),
        (((F.col("id") * 7) % 100 / 10.0) + 0.1).alias("y1"),
    )
    out = map_match_join(pts, segs, radius_deg=0.5, grid_deg=0.5)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    # the only hash exchange is the argmin on the point id — the points
    # side reaches the join shuffle-free
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(k.startswith("event_id") for k in keys), keys


def _si(spark, rows):
    from gotrackmaster_spark.operators.spatial import segment_intersection_join

    segs = _segs(spark, rows)
    return segment_intersection_join(segs, grid_deg=1.0).collect()


def test_proper_crossing_detected_with_exact_point(spark):
    # X shape crossing at (0.5, 0.5)
    rows = _si(spark, [(1, 0.0, 0.0, 1.0, 1.0), (2, 0.0, 1.0, 1.0, 0.0)])
    assert [(r.seg_a, r.seg_b, r.ix_r, r.iy_r) for r in rows] == [(1, 2, 0.5, 0.5)]


def test_touching_and_collinear_are_not_proper(spark):
    # T: seg 2 ENDS on seg 1 (touch); seg 3 collinear-overlaps seg 1;
    # seg 4 is parallel and disjoint — none are proper crossings of 1
    rows = _si(
        spark,
        [
            (1, 0.0, 0.0, 1.0, 0.0),
            (2, 0.5, 0.0, 0.5, 1.0),   # endpoint ON seg 1 -> d on-line -> excluded
            (3, 0.5, 0.0, 2.0, 0.0),   # collinear overlap -> cross products 0
            (4, 0.0, 0.5, 1.0, 0.5),   # parallel, disjoint
        ],
    )
    pairs = {(r.seg_a, r.seg_b) for r in rows}
    assert (1, 2) not in pairs and (1, 3) not in pairs and (1, 4) not in pairs
    # 2 and 4 DO properly cross (at (0.5, 0.5))
    assert (2, 4) in pairs


def test_multi_cell_pair_emits_one_row_and_plan_is_bucketed(spark):
    from gotrackmaster_spark.operators.spatial import segment_intersection_join

    # long segments spanning many 0.25° cells — the crossing pair appears
    # in several shared cells but must emit exactly once
    segs = _segs(spark, [(1, 0.0, 0.0, 2.0, 2.0), (2, 0.0, 2.0, 2.0, 0.0)])
    out = segment_intersection_join(segs, grid_deg=0.25)
    rows = out.collect()
    assert [(r.seg_a, r.seg_b, r.ix_r, r.iy_r) for r in rows] == [(1, 2, 1.0, 1.0)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
