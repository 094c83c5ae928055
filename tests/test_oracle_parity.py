"""Local replica of the driver's DuckDB-oracle comparison.

For every (queries()[name], oracle_sql()[name]) pair: run the Spark query
and the DuckDB SQL on the same parquet tables, then compare row count,
sorted column names, and values (sorted rows, floats to 9 significant
digits — the driver hashes; we diff, which is strictly stronger on
mismatch diagnostics).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in data]
    out.sort(key=repr)
    return out


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# Queries whose CONTRACT is a single corpus-level summary row (scalar
# statistics / test composites).  Everything else must return > 1 row at
# sf0.01 — a 0/1-row result from a join or grouped query means a
# threshold/data degeneracy the value-hash cannot see.
SINGLE_ROW_OK = {
    "moran_i", "knox_stat", "geary_c", "general_g", "join_counts",
    "bivariate_moran", "clark_evans", "quadrat_test", "chi2_contingency",
    "kendall_tau", "ks_statistic", "mann_whitney", "curve_locality",
    "bloom_semijoin", "small_qty_revenue", "degree_assortativity",
    "graph_summary", "funnel_steps", "exact_dup_groups",
}


def _assert_nondegenerate(name, cols, data):
    """The ppr_scores lesson (r3): a query can be parity-green yet carry
    zero signal (empty seed set → all-zero field hashes identically in
    both engines).  Cheap per-query guards: row count, and the headline
    metric (LAST column by repo convention) must be non-null somewhere
    and not identically zero."""
    assert data, f"{name}: empty result at sf0.01"
    if name not in SINGLE_ROW_OK:
        assert len(data) > 1, (
            f"{name}: single row at sf0.01 — degenerate unless it is a "
            f"scalar summary (add to SINGLE_ROW_OK with rationale)"
        )
    last = len(cols) - 1
    nn = [r[last] for r in data if r[last] is not None]
    assert nn, f"{name}: headline column {cols[last]} all NULL"
    assert any(v != 0 for v in nn), (
        f"{name}: headline column {cols[last]} identically zero — "
        f"the metric arm of the query never fired on this data"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark):
    if name not in ORACLES:
        # non-SQL-expressible op: the driver records a rows-only check
        df = QUERIES[name](spark, SF_DIR)
        rows = [tuple(r) for r in df.collect()]
        _assert_nondegenerate(name, df.columns, rows)
        return
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_data = [tuple(r) for r in df.collect()]
    _assert_nondegenerate(name, spark_cols, spark_data)

    con = _duck()
    cur = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in cur.description]
    duck_data = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    # The driver hashes TYPED values: DuckDB HUGEINT (sum/list_sum over
    # BIGINT) vs Spark BIGINT mismatches even when values are equal.
    # Compare type *classes* (int/float/str/other) per column so that bug
    # class is caught locally, not by the per-round driver.
    _CLS = {
        "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
        "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i", "UBIGINT": "i",
        "FLOAT": "f", "DOUBLE": "f", "VARCHAR": "s", "BOOLEAN": "b",
    }
    _SCLS = {
        "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
        "float": "f", "double": "f", "string": "s", "boolean": "b",
    }
    duck_types = {d[0]: str(t) for d, t in
                  zip(cur.description, con.sql(ORACLES[name]).types)}
    spark_types = dict(df.dtypes)
    for c in spark_cols:
        dt, st = duck_types[c], spark_types[c]
        assert _CLS.get(dt, dt) == _SCLS.get(st, st), (
            f"{name}.{c}: oracle type {dt} vs spark type {st} — "
            f"driver hash would mismatch; CAST the oracle column"
        )
    assert len(spark_data) == len(duck_data), (
        f"{name}: rows {len(spark_data)} vs {len(duck_data)}"
    )
    s_rows = _rows(spark_cols, spark_data)
    d_rows = _rows(duck_cols, duck_data)
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n >= 0
    assert df.schema is not None
