"""Unit/property tests for the distributed Lloyd refinement."""

from __future__ import annotations

from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.catalog import load_table
from mc_ns_data_pipeline_spark.operators.clustering import kmeans_refine


def _totals(df):
    one_per_cluster = (
        df.select("cluster_id", "n_members", "inertia").distinct()
    )
    row = one_per_cluster.agg(
        F.sum("n_members").alias("n"), F.sum("inertia").alias("inertia")
    ).collect()[0]
    return int(row["n"]), float(row["inertia"])


def test_kmeans_partitions_corpus_and_reduces_inertia(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()

    seeded = kmeans_refine(emb, k=8, n_iters=0)
    refined = kmeans_refine(emb, k=8, n_iters=2)

    n0, inertia0 = _totals(seeded)
    n2, inertia2 = _totals(refined)

    # every vector lands in exactly one cluster, before and after
    assert n0 == n_vecs and n2 == n_vecs
    # Lloyd monotonicity: refinement never increases total inertia
    # (tolerance covers the 6dp distance rounding both engines share)
    assert inertia2 <= inertia0 + 1e-3

    # one centroid row per (cluster, dim); dims complete per cluster
    dims = refined.groupBy("cluster_id").agg(
        F.countDistinct("dim_idx").alias("n_dims")
    )
    assert dims.select(F.min("n_dims")).collect()[0][0] == 64


def test_kmeans_centroid_is_member_mean(spark, sf_dir):
    """With k=1 every vector is a member, so the refined centroid must
    equal the global per-dimension mean (the x43 decimal contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    got = kmeans_refine(emb, k=1, n_iters=1).orderBy("dim_idx").collect()
    exp = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>"))
                   .alias("dim_idx", "v"))
        .groupBy("dim_idx")
        .agg((F.sum(F.col("v").cast("decimal(28,6)")).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("mean_v"))
        .orderBy("dim_idx")
        .collect()
    )
    assert len(got) == len(exp) == 64
    for g, e in zip(got, exp):
        assert g["centroid_v"] == e["mean_v"], g["dim_idx"]


def test_cents_lit_nonfinite_falls_back_to_lit(spark):
    """A codebook carrying NaN/inf components (NaN-poisoned input
    vectors propagate into centroid means) cannot be repr'd into SQL
    (`nan`/`inf` do not parse) — _cents_lit must fall back to the
    F.lit construction and evaluate to the same values (ADVICE r11)."""
    import math

    from mc_ns_data_pipeline_spark.operators import clustering as C

    cents = [(0, [float("nan"), 1.5], 2.25),
             (1, [float("inf"), -2.0], float("inf")),
             (2, [0.5, 0.25], 0.3125)]
    col = C._cents_lit(cents)
    (row,) = spark.range(1).select(col.alias("cb")).collect()
    got = row["cb"]
    assert len(got) == 3
    assert math.isnan(got[0]["sv"][0]) and got[0]["sv"][1] == 1.5
    assert got[0]["cc"] == 2.25 and got[0]["cid"] == 0
    assert math.isinf(got[1]["sv"][0]) and math.isinf(got[1]["cc"])
    assert got[2]["sv"] == [0.5, 0.25] and got[2]["cid"] == 2

    # finite codebooks keep the compact SQL-literal form and agree
    # with the F.lit fallback value-for-value
    fin = [(7, [1.25, -3.5], 13.8125)]
    (a,) = spark.range(1).select(C._cents_lit(fin).alias("cb")).collect()
    assert a["cb"][0]["sv"] == [1.25, -3.5]
    assert a["cb"][0]["cc"] == 13.8125 and a["cb"][0]["cid"] == 7
