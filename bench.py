#!/usr/bin/env python
"""Benchmark: run the declared query suite at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {"q01...": sec, ...}, "sf": "..."}

Each query is executed with a count-style action (`collect` on already
small results is avoided; we use `write.format("noop")` so the full
plan runs without driver materialization cost dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from mc_ns_data_pipeline_spark.session import get_spark
    from mc_ns_data_pipeline_spark.plans import QUERIES

    spark = get_spark("bench")

    # Warm up the JVM/codegen path once with the flagship query.
    QUERIES["q06_sales_aggregate"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warm the Arrow python-worker pool so the first pandas-stage query
    # in the suite isn't charged the one-time worker spawn (~2-3 s).
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    t_suite = time.perf_counter()
    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    suite = round(time.perf_counter() - t_suite, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "suite_seconds",
        "value": suite,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
