#!/usr/bin/env python
"""Standalone-median arbitration instrument (VERDICT r06 #1).

Measures named queries OUTSIDE the 139-query suite context: one
fresh-warmed session, REPS runs per query with the same inter-shape
cleanup bench.py applies, reporting the per-query MEDIAN. With
``--load N`` it additionally spins N busy PROCESSES (not threads —
real cores) for the timed region, reproducing a loaded machine like
the one the driver benches on, so a suite-level tilt can be
attributed to machine context vs a plan change: a fixed-machinery
query that inflates under synthetic load with ZERO code difference is
context, not regression.

Usage:
  python scripts/bench_standalone.py x82 xs2 xs9 x92 x69
  python scripts/bench_standalone.py --load 24 x82 xs2 xs9 x92 x69

Prints one JSON line:
  {"sf": ..., "reps": R, "load": N, "queries": {prefix: median_sec}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "7")))


def _spin() -> None:
    x = 0
    while True:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", nargs="+",
                    help="query name prefixes, e.g. x82 xs2 q17")
    ap.add_argument("--load", type=int, default=0,
                    help="busy processes to run during measurement")
    args = ap.parse_args()

    from mc_ns_data_pipeline_spark.plans import QUERIES
    from mc_ns_data_pipeline_spark.session import get_spark

    wanted = {}
    for name, fn in QUERIES.items():
        if name.split("_", 1)[0] in set(args.prefixes):
            wanted[name] = fn
    missing = set(args.prefixes) - {n.split("_", 1)[0] for n in wanted}
    if missing:
        raise SystemExit(f"unknown query prefixes: {sorted(missing)}")

    spark = get_spark("bench-standalone")
    # same warmup as bench.py: JVM/codegen + the Arrow worker pool
    QUERIES["q06_sales_aggregate"](spark, SF_DIR).write.format(
        "noop").mode("overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    def _cleanup() -> None:
        import gc
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in jmap.values():
                rdd.unpersist()
        except Exception:
            pass
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    loaders = [multiprocessing.Process(target=_spin, daemon=True)
               for _ in range(args.load)]
    for p in loaders:
        p.start()
    try:
        timings = {}
        for name, fn in sorted(wanted.items()):
            runs = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                runs.append(time.perf_counter() - t0)
            _cleanup()
            timings[name] = round(statistics.median(runs), 3)
    finally:
        for p in loaders:
            p.terminate()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": REPS, "load": args.load, "queries": timings}))


if __name__ == "__main__":
    main()
