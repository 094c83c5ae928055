"""Cell-set compaction pins (functions/cells.compact_cells / uncompact_cells).

The driver query `compact_cells` pins the full multi-round merge against
a chained-CTE DuckDB replay at sf0.01; these tests pin the algebraic
invariants and hand-checkable corners.
"""

import pytest
from pyspark.sql import functions as F

from gotrackmaster_spark.functions.cells import (
    cell_col,
    cell_level,
    compact_cells,
    uncompact_cells,
)


def _cells_df(spark, ids):
    return spark.createDataFrame([(int(c),) for c in ids], ["cell"])


def test_complete_quad_merges_to_parent(spark):
    # level-3 parent 0b1_xx_xx_xx -> its 4 level-4 children are
    # parent*4 + {0,1,2,3}; a complete quad compacts to the parent.
    parent = (1 << 6) | 0b101010  # level 3
    kids = [parent * 4 + q for q in range(4)]
    out = compact_cells(_cells_df(spark, kids)).collect()
    assert [(r["cell"], r["level"]) for r in out] == [(parent, 3)]


def test_incomplete_quad_is_left_alone(spark):
    parent = (1 << 6) | 0b101010
    kids = [parent * 4 + q for q in range(3)]  # only 3 of 4
    out = sorted(r["cell"] for r in compact_cells(_cells_df(spark, kids)).collect())
    assert out == sorted(kids)


def test_recursive_merge_two_levels(spark):
    # ALL 16 level-4 descendants of a level-2 cell -> compacts twice to
    # the level-2 cell itself.
    g2 = (1 << 4) | 0b0110  # level 2
    kids = [g2 * 16 + q for q in range(16)]
    out = compact_cells(_cells_df(spark, kids)).collect()
    assert [(r["cell"], r["level"]) for r in out] == [(g2, 2)]


def test_mixed_merge_and_leftovers(spark):
    p1 = (1 << 6) | 0b000011
    p2 = (1 << 6) | 0b110000
    cells = [p1 * 4 + q for q in range(4)] + [p2 * 4 + 1, p2 * 4 + 2]
    got = {(r["cell"], r["level"]) for r in compact_cells(_cells_df(spark, cells)).collect()}
    assert got == {(p1, 3), (p2 * 4 + 1, 4), (p2 * 4 + 2, 4)}


def test_uncompact_roundtrip(spark):
    # compact then uncompact back to the input level reproduces the
    # original set exactly (the compaction invariant), on a set with a
    # complete quad, a complete 16-grandchild block, and stragglers.
    g2 = (1 << 4) | 0b0110
    p1 = (1 << 6) | 0b000011
    base = (
        [g2 * 16 + q for q in range(16)]
        + [p1 * 4 + q for q in range(4)]
        + [(1 << 8) | 0b11001100, (1 << 8) | 0b00000001]
    )
    df = _cells_df(spark, base)
    comp = compact_cells(df)
    assert comp.count() < len(base)
    back = sorted(
        r["cell"] for r in uncompact_cells(comp, target_level=4).collect()
    )
    assert back == sorted(base)


def test_uncompact_rejects_finer_than_target(spark):
    lvl4 = (1 << 8) | 0b11001100
    with pytest.raises(Exception, match="finer than target_level"):
        uncompact_cells(_cells_df(spark, [lvl4]), target_level=3).collect()


def test_compact_of_real_cells_levels_consistent(spark):
    # levels reported by compact_cells match the marker-bit definition
    pts = spark.createDataFrame(
        [(i, float(i % 7) * 3.1 - 10, float(i % 11) * 5.3 - 20) for i in range(200)],
        ["i", "lat", "lon"],
    )
    occ = pts.select(cell_col(F.col("lat"), F.col("lon"), 5).alias("cell"))
    out = compact_cells(occ).collect()
    for r in out:
        assert cell_level(r["cell"]) == r["level"]
