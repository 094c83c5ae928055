#!/usr/bin/env python
"""Registry-wide audit: every ``Exchange SinglePartition`` in a compiled
physical plan must be fed by BOUNDED data.

Detector lives in ``gotrackmaster_spark.plans.audit`` (shared with
``tests/test_registry_plan_audit.py``, which pins the invariant per
registered query); this script is the standalone sweep for ad-hoc runs
against any subset of the registry.

Usage:  python scripts/single_partition_audit.py [name ...]
Prints one line per offending query with the unbounded exchange subtree.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from gotrackmaster_spark.plans.audit import unbounded_single_partitions  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from gotrackmaster_spark.session import get_session

    spark = get_session("sp-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[1:] or sorted(queries)
    n_bad = 0
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"{name}: ERROR {exc}")
            n_bad += 1
            continue
        bad = unbounded_single_partitions(plan)
        if bad:
            n_bad += 1
            print(f"{name}: UNBOUNDED SinglePartition fed by: {bad}")
    print(f"done: {len(names)} plans, {n_bad} flagged")


if __name__ == "__main__":
    main()
