#!/usr/bin/env python
"""Per-stage timing breakdown of x62_entity_blocking (VERDICT r07 #4).

Times each stage of operators/linkage.blocked_near_pairs in isolation
by materializing successively longer prefixes of the plan (count()),
so stage cost = prefix(N) - prefix(N-1) under identical plan shapes.
Prints one JSON line with per-stage medians.

Usage: python scripts/profile_x62.py [reps] [sf_dir]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .appName("profile_x62")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from mc_ns_data_pipeline_spark.catalog import load_table  # noqa: E402
from mc_ns_data_pipeline_spark.operators import linkage as L  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def one_rep():
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    k, bw, pl = L.MAX_DIST, L.BAND_WIDTH, L.PREFIX_LEN
    stages = {}

    t, _ = timed(lambda: L._template_rows(docs, k, bw, pl)[0].count())
    stages["s1_base_scan"] = t

    base, rel, a_rows = L._template_rows(docs, k, bw, pl)
    t, n_a = timed(a_rows.count)
    stages["s2_template_segments"] = t
    stages["n_template_rows"] = n_a

    t, hot_n = timed(
        lambda: L._hot_slots(a_rows, base, "auto").count())
    stages["s3_hot_slots"] = t
    stages["n_hot_slots"] = hot_n

    # full candidate generation (pass + short fallback + distinct),
    # via the operator's own internals: run blocked_near_pairs but
    # stop before verify by reconstructing cand exactly as it does
    full_t, n_pairs = timed(
        lambda: L.blocked_near_pairs(docs).count())
    stages["s5_full_operator"] = full_t
    stages["n_result_pairs"] = n_pairs
    return stages


runs = [one_rep() for _ in range(reps)]
med = {
    key: (statistics.median(r[key] for r in runs)
          if isinstance(runs[0][key], float) else runs[0][key])
    for key in runs[0]
}
med["reps"] = reps
med["sf_dir"] = sf_dir
print(json.dumps(med))
