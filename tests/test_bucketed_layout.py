"""Co-located bucketed layout (operators/skew.py::write_bucketed): a join
of two tables bucketed identically on the key must compile WITHOUT any
Exchange — the shuffle was paid at write time."""

from pyspark.sql import functions as F

from gotrackmaster_spark.operators.skew import write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_zero_exchanges(spark):
    a = spark.range(0, 10_000).select(
        (F.col("id") % 512).alias("cell"), F.col("id").alias("a_id")
    )
    b = spark.range(0, 10_000).select(
        (F.col("id") % 512).alias("cell"), (F.col("id") * 7).alias("b_val")
    )
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    write_bucketed(a, "bt_a", "cell", 8)
    write_bucketed(b, "bt_b", "cell", 8)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("bt_a")
            .join(spark.table("bt_b"), "cell")
            .groupBy("cell")
            .agg(F.count("*").alias("n"))
        )
        plan = _plan(joined)
        # the join itself: no shuffle on either side (bucket-aligned SMJ);
        # the groupBy on the SAME key also reuses the bucketing
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness: same result as the unbucketed join
        got = {r["cell"]: r["n"] for r in joined.collect()}
        want = {
            r["cell"]: r["n"]
            for r in a.join(b, "cell").groupBy("cell").agg(F.count("*").alias("n")).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
