#!/usr/bin/env python
"""Benchmark: run the declared query suite at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {"q01...": sec, ...}, "sf": ..., "reps": R,
   "wall_seconds": W}

Each query is executed with a `write.format("noop")` action so the full
plan runs without driver materialization cost dominating. Per-query
time is the MEDIAN of $SPARK_GRAFT_BENCH_REPS runs (default 3) —
single runs wobble ±10% (BASELINE.md), which is enough to fake a
regression or mask one; medians make round-over-round deltas
trustworthy. `value` is the sum of medians (the comparable suite
number); `wall_seconds` is what the whole benchmark actually took.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def main() -> None:
    from mc_ns_data_pipeline_spark.session import get_spark
    from mc_ns_data_pipeline_spark.plans import QUERIES

    spark = get_spark("bench")
    _LOAD0 = os.getloadavg()

    # Fixed warmup: JVM/codegen via the flagship query, then the Arrow
    # python-worker pool so the first pandas-stage query isn't charged
    # the one-time worker spawn (~2-3 s).
    QUERIES["q06_sales_aggregate"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def _cleanup() -> None:
        """Drop accumulated state between query shapes, OUTSIDE the
        timed region: streaming memory-sink tables pin their rows in
        the driver, localCheckpoint blocks pin executor memory until
        their RDDs are GC'd, and 75 shapes x 3 reps of codegen also
        deserve a JVM GC nudge. Measured effect: without this, suite
        medians inflate ~25% by the end of the alphabet vs the same
        query run in a fresh session."""
        import gc

        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        # clearCache only drops DataFrame-cache entries; RDDs pinned by
        # localCheckpoint (x60's lineage cuts) and direct .persist()
        # survive it and accumulate executor memory across the suite —
        # part of the in-suite wobble BASELINE.md's round-4 study
        # measured on heavyweight queries. Unpersist them explicitly.
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in jmap.values():
                rdd.unpersist()
        except Exception:
            pass  # private API; the GC below still applies
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    t_suite = time.perf_counter()
    for name, fn in sorted(QUERIES.items()):
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        _cleanup()
        timings[name] = round(statistics.median(runs), 3)
    wall = round(time.perf_counter() - t_suite, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": REPS,
        "wall_seconds": wall,
        # machine-state context (VERDICT r09 #7): round-over-round
        # arbitration needs to cite the band the vector was taken in —
        # loadavg at start/end of the suite and the core count let a
        # reader tell a quiet builder pass from a loaded driver pass
        # straight from the artifact.
        "context": {
            "loadavg_start": [round(x, 2) for x in _LOAD0],
            "loadavg_end": [round(x, 2)
                            for x in os.getloadavg()],
            "cpus": os.cpu_count(),
        },
    }
    # Sidecar with the FULL result: the driver's BENCH_r{N}.json keeps
    # only the last 2000 chars of stdout, which truncates the 158-entry
    # per-query map (VERDICT r3 #3 minor). The sidecar is the mechanical
    # per-query record. Default OUTSIDE the repo, suffixed by core
    # count (VERDICT r11 #2: the in-repo default let every run —
    # including the driver's loaded c8 rerun — clobber the committed
    # quiet-run evidence in the worktree). To commit a baseline run,
    # point SPARK_GRAFT_BENCH_SIDECAR at the repo file explicitly.
    import tempfile

    _sidecar_dir = os.path.join(tempfile.gettempdir(),
                                "spark_graft_bench")
    os.makedirs(_sidecar_dir, exist_ok=True)
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(_sidecar_dir,
                     f"BENCH_SIDECAR_c{os.cpu_count()}"
                     f"_{os.environ.get('SPARK_GRAFT_CPUS', 'na')}"
                     ".json"),
    )
    with open(sidecar, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
