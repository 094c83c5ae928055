"""Strong-scaling measurement for the STATEFUL pipeline op
(pack_sequences) — same protocol as ``bench.py --scaling`` (fresh JVM
per level, warm-up pass, best-of-2, constant total work), but on a job
whose profile is scan → codegen tokenize → ONE shard shuffle → Arrow
batch → per-shard serial Python scan, i.e. the execution shape the
flagship's pure-JVM job does not cover.

Instance: sf0.1 documents ×FACTOR (default 1024 → 5.12 M docs), shards
fixed at 256 for BOTH levels (same job, only parallelism varies).

Usage: ``SCALING_LEVELS=4,16 python scripts/pack_scaling.py`` (runs both
levels + efficiency), or ``PACK_CPUS=16 python scripts/pack_scaling.py
--one`` for a single level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("PACK_SCALE_FACTOR", "1024"))
N_SHARDS = 256
BUDGET = 256


def _job(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    base = docs.count()
    # the single-file source is ONE input split; spread the base docs so
    # the explode fan-out (and the shuffle write it feeds) parallelizes —
    # otherwise the whole pre-shuffle stage runs in a single task and the
    # measurement is of the harness, not the operator
    docs = docs.repartition(256)
    wide = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
        .select(
            (F.col("doc_id") + F.col("rep") * base).alias("doc_id"),
            "text",
        )
    )
    packed = pack_sequences(wide, budget=BUDGET, n_shards=N_SHARDS)
    # force full computation; collapse to one summary row
    out = packed.groupBy().agg(
        F.count("*").alias("n_docs"),
        F.max("seq_id").alias("max_seq"),
        F.sum("n_toks").alias("tot_toks"),
    )
    return out, base * FACTOR


def one_level() -> None:
    cpus = os.environ.get("PACK_CPUS", "16")
    from gotrackmaster_spark.session import get_session

    spark = get_session("pack-scaling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df, n = _job(spark)

    def once():
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warm-up (codegen + exchange build)
    best = min(once() for _ in range(2))
    print(json.dumps({
        "value": round(best, 3), "rows": n,
        "rows_per_sec": round(n / best, 1), "cpus": int(cpus),
    }))
    spark.stop()


def main() -> None:
    levels = os.environ.get("SCALING_LEVELS", "4,16").split(",")
    n_lo, n_hi = levels[0].strip(), levels[1].strip()
    res = {}
    for cpus in (n_lo, n_hi):
        env = dict(os.environ, PACK_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, __file__, "--one"],
            capture_output=True, text=True, env=env,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        res[cpus] = json.loads(line)
    ratio = int(n_hi) // int(n_lo)
    eff = res[n_hi]["rows_per_sec"] / (ratio * res[n_lo]["rows_per_sec"])
    print(json.dumps({
        "metric": f"pack_scaling_local{n_lo}_vs_local{n_hi}",
        f"t_local{n_lo}_sec": res[n_lo]["value"],
        f"t_local{n_hi}_sec": res[n_hi]["value"],
        "rows": res[n_hi]["rows"],
        f"rows_per_sec_local{n_lo}": res[n_lo]["rows_per_sec"],
        f"rows_per_sec_local{n_hi}": res[n_hi]["rows_per_sec"],
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--one" in sys.argv:
        one_level()
    else:
        main()
