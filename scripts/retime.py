#!/usr/bin/env python
"""Standalone min-of-N retiming for watch-list bench queries.

The sandbox shows heavy run-to-run interference (BENCH.md §3): suite-order
timings can move ±2× without any plan change.  This harness times each
named query in ISOLATION — warm-up first, then N runs — and brackets the
measurement with the CPU capacity probe so a slow number can be attributed
to the machine, not the plan.

    python scripts/retime.py knn image_decode_10k --n 3

Prints one JSON line per query:
    {"query": "knn", "runs": [...], "min": ..., "median": ...,
     "probe_before": {...}, "probe_after": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    from gotrackmaster_spark.session import get_session

    spark = get_session("gotrackmaster-retime", master=f"local[{bench.CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_up(spark, bench.SF_DIR)

    registry = bench.bench_queries()
    for name in args.queries:
        fn = registry[name]
        probe_before = bench._cpu_capacity_probe(ns=(1, int(bench.CPUS)))
        runs = []
        for _ in range(args.n):
            runs.append(round(bench._run_once(spark, fn, bench.SF_DIR), 3))
            spark.catalog.clearCache()
        probe_after = bench._cpu_capacity_probe(ns=(1, int(bench.CPUS)))
        print(json.dumps({
            "query": name,
            "sf_dir": bench.SF_DIR,
            "cpus": int(bench.CPUS),
            "runs": runs,
            "min": min(runs),
            "median": round(statistics.median(runs), 3),
            "probe_before": probe_before,
            "probe_after": probe_after,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
