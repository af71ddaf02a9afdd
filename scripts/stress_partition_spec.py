#!/usr/bin/env python
"""Hidden-partitioning payoff, measured (round-6): the same 10×-
replicated events corpus landed three ways — through a ``days(ts)``
spec, through a ``bucket(16, user_id)`` spec, and as plain
unclustered appends — then the read pattern each transform exists
for:

  * a ONE-DAY window on the days table (tight per-file ts spans ->
    span pruning);
  * a SINGLE-USER point lookup on the bucket table (bucket clustering
    -> each file's auto-enrolled bloom covers ~1/16 of the user space
    -> membership pruning).

Reports files kept by planning and warm read medians vs the plain
table, plus the landing overhead a spec costs (its range shuffle).
AQE partition coalescing is disabled for the landings so the toy
corpus produces at-scale-SHAPED file counts (a real 100 GB landing
yields hundreds of files; coalescing a 35 MB toy landing to 3 files
would hide the layout's effect — a combined days+bucket spec needs
files-per-day >= bucket count to separate, which only real scale
provides, so each transform is measured on its own table here). The
house rule: measure the trade, don't assert it.

Usage: python scripts/stress_partition_spec.py [SF_DIR] [REPLICATE]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import statistics
import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WORK = "/tmp/stress_partition_spec"


def timed(label, fn, reps=1):
    runs = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        runs.append(time.perf_counter() - t0)
    m = statistics.median(runs)
    print(f"{label:68s} {m:8.3f} s")
    return out, m


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.session import get_spark
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    spark = get_spark("stress-partition-spec")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "false")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)

    ev = load_table(spark, SF, "events")
    # 10x replication with shifted ids/users, same house recipe as the
    # other stress rows: keeps value distributions, scales bytes.
    reps = [
        ev.withColumn("event_id",
                      F.col("event_id") + F.lit(i * 1_000_000))
        .withColumn("user_id", (F.col("user_id") + F.lit(i * 37)) % 1500)
        for i in range(REP)
    ]
    n_rows = ev.count() * REP
    print(f"corpus: {n_rows} rows ({REP}x {SF})")

    days_tbl = os.path.join(WORK, "days")
    bucket_tbl = os.path.join(WORK, "bucket")
    plain_tbl = os.path.join(WORK, "plain")

    def land(table, spec):
        kw = {"partition_spec": spec} if spec else {}
        V.write_snapshot(reps[0], table, **kw)
        for batch in reps[1:]:
            V.append_snapshot(batch, table)
        return V.current_snapshot(table)

    snap_days, t_days_land = timed(
        "land 10 batches WITH spec days(ts)",
        lambda: land(days_tbl, ["days(ts)"]))
    snap_bucket, t_bucket_land = timed(
        "land 10 batches WITH spec bucket(16, user_id)",
        lambda: land(bucket_tbl, ["bucket(16, user_id)"]))
    snap_plain, t_plain_land = timed(
        "land 10 batches WITHOUT spec (arrival order)",
        lambda: land(plain_tbl, None))

    day_preds = [("ts", ">=", dt.datetime(2024, 1, 15)),
                 ("ts", "<", dt.datetime(2024, 1, 16))]
    user_preds = [("user_id", "=", 777)]

    out = {"rows": n_rows, "t_land_days_s": round(t_days_land, 3),
           "t_land_bucket_s": round(t_bucket_land, 3),
           "t_land_plain_s": round(t_plain_land, 3)}
    for name, preds, spec_tbl, snap_spec in (
            ("day_window", day_preds, days_tbl, snap_days),
            ("user_point", user_preds, bucket_tbl, snap_bucket)):
        for label, tbl, snap in (("spec", spec_tbl, snap_spec),
                                 ("plain", plain_tbl, snap_plain)):
            rep = V.prune_report(tbl, snap, preds)
            _, t_read = timed(
                f"{name} read, {label} table "
                f"(kept {len(rep['kept'])}/{rep['total']} files)",
                lambda t=tbl, s=snap, p=preds: V.read_snapshot(
                    spark, t, s, predicates=p).write.format(
                    "noop").mode("overwrite").save(),
                reps=3)
            out[f"{name}_{label}_kept"] = len(rep["kept"])
            out[f"{name}_{label}_total"] = rep["total"]
            out[f"{name}_{label}_read_s"] = round(t_read, 3)
        # exactness: both tables must return identical answers
        a = V.read_snapshot(spark, spec_tbl, snap_spec,
                            predicates=preds).count()
        b = V.read_snapshot(spark, plain_tbl, snap_plain,
                            predicates=preds).count()
        assert a == b, (name, a, b)
        out[f"{name}_rows"] = a

    print()
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
