#!/usr/bin/env python
"""xs15 scale stress: streaming IVF index maintenance at Nx the gate
corpus. Measures (a) per-epoch maintenance cost as the index grows,
(b) the final answer's probe fraction (files read / files on disk —
the IVF property: query cost ~ probed lists, not corpus), and
(c) exact parity with the batch ivf_topk over the same Nx corpus.

Usage: python scripts/stress_ann_stream.py [factor] [n_epochs]
Prints one JSON line.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("stress_ann_stream").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from mc_ns_data_pipeline_spark.catalog import load_table  # noqa: E402
from mc_ns_data_pipeline_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
)
from mc_ns_data_pipeline_spark.streaming.incremental import (  # noqa: E402
    _LshIndexStore,
    ann_index_batch,
)

base = load_table(spark, sf_dir, "embeddings")
n_base = base.count()
# deterministic Nx corpus: copy c shifts ids by c*n_base and jitters
# every component by c*3e-4 (JVM transform — no Python in the loop)
big = (
    base.select(
        "vec_id", "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("c"))
    .select(
        (F.col("vec_id") + F.col("c") * n_base).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + F.col("c").cast("double") * 3e-4
        ).cast("array<double>").alias("embedding"),
    )
)
pdf = big.toPandas().sort_values("vec_id").reset_index(drop=True)
n_total = len(pdf)
step = (n_total + n_epochs - 1) // n_epochs

root = tempfile.mkdtemp(prefix="ann_stress_")
store = _LshIndexStore(spark, root,
                       bucket_of=lambda c: c.cast("int"), n_buckets=16)
epoch_secs = []
schema = "vec_id long, embedding array<double>"
for e in range(n_epochs):
    chunk = pdf.iloc[e * step:(e + 1) * step]
    t0 = time.time()
    ann_index_batch(
        spark, spark.createDataFrame(chunk, schema=schema), e, store,
        n_centroids=16, query_max_id=20, query_min_id=17)
    epoch_secs.append(round(time.time() - t0, 3))

# final probe + answer, via the same tail run_stream_ann_index uses
from mc_ns_data_pipeline_spark.streaming.incremental import (  # noqa: E402
    _ivf_scored_array,
)
from pyspark.sql import Window  # noqa: E402
from mc_ns_data_pipeline_spark.operators.similarity import dot  # noqa: E402

with open(os.path.join(root, "centroids.json")) as fh:
    cents = json.load(fh)
scored = _ivf_scored_array(cents)
queries = (
    spark.read.option("basePath", os.path.join(root, "queries"))
    .parquet(os.path.join(root, "queries")).drop("epoch"))
probes = (
    queries.select(
        F.col("vec_id").alias("query_id"), F.col("_v").alias("q_v"),
        F.col("_norm").alias("q_norm"),
        F.sort_array(scored, asc=False).alias("_ranked"))
    .select("query_id", "q_v", "q_norm",
            F.explode(F.transform(
                F.slice(F.col("_ranked"), 1, 2),
                lambda s: -s["neg_cent_id"]).cast("array<int>"))
            .alias("cent_id")))
probed = sorted(r[0] for r in probes.select("cent_id").distinct().collect())
t0 = time.time()
cand, stats = store.read("postings", 1 << 60, probed,
                         queries.select("vec_id", "_v", "_norm")
                         .withColumn("cent_id", F.lit(0)).limit(0))
assign = cand.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("_v").alias("c_v"),
                     F.col("_norm").alias("c_norm"), "cent_id")
cos_r = F.round(dot(F.col("q_v"), F.col("c_v"))
                / (F.col("q_norm") * F.col("c_norm")), 6)
w = Window.partitionBy("query_id").orderBy(
    F.col("cos_r").desc(), F.col("neighbor_id").asc())
got = (assign.join(F.broadcast(probes), "cent_id")
       .filter(F.col("neighbor_id") != F.col("query_id"))
       .select("query_id", "neighbor_id", cos_r.alias("cos_r"))
       .withColumn("rank", F.row_number().over(w))
       .filter(F.col("rank") <= 3).orderBy("query_id", "rank").collect())
answer_s = round(time.time() - t0, 3)

want = ivf_topk(
    big, (F.col("vec_id") >= 17) & (F.col("vec_id") < 20),
    k=3, n_centroids=16, n_probe=2).collect()
fmt = lambda rows: [(r.query_id, r.rank, r.neighbor_id,  # noqa: E731
                     round(r.cos_r, 6)) for r in rows]
print(json.dumps({
    "factor": factor, "n_vectors": n_total, "n_epochs": n_epochs,
    "epoch_secs": epoch_secs, "answer_secs": answer_s,
    "probed_lists": len(probed), "n_lists": 16,
    "files_read": stats["files_read"], "files_total": stats["files_total"],
    "read_fraction": round(stats["files_read"] / max(1, stats["files_total"]), 3),
    "parity": fmt(got) == fmt(want),
}))
