"""Strong-scaling measurement for the IMAGE-PAYLOAD pipeline — the graft
cell's third execution shape, complementing the two pairs already gated
in BENCH.md:

  * flagship (``bench.py --scaling``): pure-JVM codegen spatial join +
    tile assignment;
  * ``pack_scaling.py``: stateful per-shard SERIAL Python after one
    shuffle;
  * THIS: embarrassingly-parallel Arrow-batched Python — per-image
    decode (raw memcpy / PNG inflate / qnt4 dequantize), vectorized
    pixel moments and the 64-bit DCT phash (`decode_stats`,
    operators/images.py), then a tiny JVM aggregate.  This is the
    execution profile of every E7 payload operator (PSNR, resize,
    texture suite), so its N→4N behavior is the direct evidence for the
    north rule's per-row image-payload half.

Protocol is identical to the other two gates: fresh JVM per level
(subprocess), warm-up pass then best-of-2, constant TOTAL work at both
levels (strong scaling).  Instance: the sf0.1 synthetic images table
(one image per document, deterministic pixels keyed by doc_id —
operators/images.py `synthesize_images`) widened ×FACTOR by a
distinct-id crossJoin with a small range (replicates BYTES, not
synthesis, so the measured work is the decode path), repartitioned so
both levels shuffle the same data into enough splits that every core
has work.

Usage: ``SCALING_LEVELS=4,16 python scripts/image_scaling.py``, or
``IMG_CPUS=16 python scripts/image_scaling.py --one`` for one level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("IMG_SCALE_FACTOR", "256"))


def _job(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.images import decode_stats, synthesize_images

    imgs = synthesize_images(spark, SF_DIR, w=32, h=24)
    base = imgs.count()
    wide = (
        imgs.crossJoin(spark.range(FACTOR).select(F.col("id").alias("rep")))
        .withColumn("image_id", F.concat(F.col("image_id"), F.lit("_"), F.col("rep")))
        .repartition(256)
    )
    out = decode_stats(wide).groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum("pixel_sum").alias("total"),
        F.count_distinct(F.shiftright(F.col("phash"), 48)).alias("n_hash_bands"),
    )
    return out, base * FACTOR


def one_level() -> None:
    cpus = os.environ.get("IMG_CPUS", "16")
    from gotrackmaster_spark.session import get_session

    spark = get_session("image-scaling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df, n = _job(spark)

    def once():
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warm-up (codegen + Arrow worker spin-up)
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
        env = dict(os.environ, IMG_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, __file__, "--one"],
            capture_output=True, text=True, env=env,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        res[cpus] = json.loads(line)
    ratio = int(n_hi) // int(n_lo)
    eff = res[n_hi]["rows_per_sec"] / (ratio * res[n_lo]["rows_per_sec"])
    print(json.dumps({
        "metric": f"image_scaling_local{n_lo}_vs_local{n_hi}",
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
