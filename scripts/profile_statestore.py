#!/usr/bin/env python
"""Same-session A/B of the streaming state-store provider (VERDICT r11
#3, guide §5): time the stateful streaming queries (xs2, xs5, xs7,
xs14) under the default HDFS-backed provider and under RocksDB
(`spark.sql.streaming.stateStore.providerClass`), interleaved reps in
ONE session so machine drift cancels. The provider is read at stream
start, so flipping the session conf between runs is a clean A/B.

Usage: python scripts/profile_statestore.py [reps]
Prints one JSON line: {"queries": {name: {"hdfs": med, "rocksdb": med}}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROCKS = ("org.apache.spark.sql.execution.streaming.state."
         "RocksDBStateStoreProvider")
KEY = "spark.sql.streaming.stateStore.providerClass"


def main() -> None:
    from mc_ns_data_pipeline_spark.plans import QUERIES
    from mc_ns_data_pipeline_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = [n for n in sorted(QUERIES)
             if n.split("_")[0] in ("xs2", "xs5", "xs7", "xs14")]
    spark = get_spark("statestore_ab")
    default = spark.conf.get(KEY)

    # warm both providers once (codegen, worker pool, rocksdb jni)
    for prov in (default, ROCKS):
        spark.conf.set(KEY, prov)
        for n in names:
            QUERIES[n](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()

    out: dict = {}
    runs: dict = {n: {"hdfs": [], "rocksdb": []} for n in names}
    for _ in range(reps):
        for label, prov in (("hdfs", default), ("rocksdb", ROCKS)):
            spark.conf.set(KEY, prov)
            for n in names:
                t0 = time.perf_counter()
                QUERIES[n](spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                runs[n][label].append(time.perf_counter() - t0)
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
    spark.conf.set(KEY, default)
    for n in names:
        out[n] = {k: round(statistics.median(v), 3)
                  for k, v in runs[n].items()}
    print(json.dumps({"sf": SF_DIR, "reps": reps, "queries": out}))


if __name__ == "__main__":
    main()
