"""Distributed k-means (Lloyd) centroid refinement over an embedding
column — the training step behind the IVF codebook that
`operators/similarity.ivf_topk` stands in for with seed vectors.

Reference parity: the reference has no clustering (its analytics stop at
SQL aggregates — mastercontrol_pipeline/data_load_system/sql/queries.py);
this is part of the training-data extension surface, where a corpus
pipeline needs a trained coarse quantizer before IVF/PQ indexing.

Execution shape (the part that must survive 100 TB):

- Per iteration, the corpus is touched by exactly ONE map-only pass:
  cluster assignment is an argmin over k literal-inlined centroids
  (one literal array<struct> codebook scanned by transform/array_min —
  no join, no shuffle, no Python, O(k) Catalyst tree). The only
  shuffle per iteration is the centroid update
  aggregate, partial-aggregated map-side, so shuffle volume is
  `partitions x k x dim` — independent of corpus size.
- The k x dim centroid matrix (the only iteration state) is collected
  to the driver between rounds: 8 x 64 doubles here, bounded by the
  codebook size (not the data) at any scale. This is the same
  documented tiny-collect contract as `ivf_topk`'s seed centroids.
- Sums that cross rows go through DECIMAL(28,6) so the update is
  order-independent and byte-identical on any partitioning (and in the
  DuckDB oracle); distances are rounded to 6 dp before the argmin so
  FP-accumulation-order differences (far below 1e-6) cannot flip an
  assignment between engines. Ties break toward the lower cluster id.

Empty clusters simply drop out of the next round's codebook (both
engines derive emptiness from the same data, so they agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.operators.similarity import dot


def _cents_lit(cents: list[tuple[int, list[float], float]]) -> F.Column:
    """The codebook as ONE literal array<struct<sv,cc,cid>> (the x57
    lit_cb_m shape): scanning it with transform/array_min keeps the
    Catalyst tree O(k) with a single shared lambda body instead of k
    unrolled O(dim) branches — measured on x57 the unrolled form cost
    ~26 s of pure analysis/codegen per training pass; ported here r11
    (x52/x59 train one codebook per query, and every Lloyd round
    re-plans with fresh literals). `{!r}` reprs round-trip doubles
    exactly, so the literal values are bit-identical to F.lit.

    Non-finite components (NaN-carrying input vectors propagate into a
    centroid mean) repr as `nan`/`inf`, which Spark SQL cannot parse —
    those codebooks take the F.lit construction instead (same values,
    larger Catalyst tree; ADVICE r11)."""
    import math

    if not all(math.isfinite(float(x))
               for cid, vec, cc in cents
               for x in list(vec) + [cc]):
        return F.array(*[
            F.struct(
                F.array(*[F.lit(float(x)) for x in vec]).alias("sv"),
                F.lit(float(cc)).alias("cc"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, vec, cc in cents
        ])
    items = ",".join(
        "named_struct('sv',array({}),'cc',{!r}D,'cid',{})".format(
            ",".join(f"{float(x)!r}D" for x in vec), float(cc), int(cid)
        )
        for cid, vec, cc in cents
    )
    return F.expr(f"array({items})")


def _best_struct(cents: list[tuple[int, list[float], float]]) -> F.Column:
    """argmin_{cent} round(||x||^2 - 2<x,c> + ||c||^2, 6), ties -> low id.

    struct(dist, cent_id) orders lexicographically, so array_min is the
    smallest distance and, among equal distances, the lowest cluster id
    (array_min compares VALUES, so the result is identical to the
    pre-r11 unrolled form — the lambda evaluates the same
    xx - 2<x,c> + cc expansion, same `dot`, same rounding).
    """
    # `+ 0.0` normalizes a possible IEEE -0.0 (vector == centroid up to
    # FP error) to +0.0 so both engines format the value identically.
    return F.array_min(
        F.transform(
            _cents_lit(cents),
            lambda c: F.struct(
                (
                    F.round(
                        F.col("_xx")
                        - F.lit(2.0) * dot(F.col("_v"), c["sv"])
                        + c["cc"],
                        6,
                    )
                    + F.lit(0.0)
                ).alias("dist"),
                c["cid"].alias("cent_id"),
            ),
        )
    )


def _best_cluster(cents: list[tuple[int, list[float], float]]) -> F.Column:
    return _best_struct(cents)["cent_id"]


def _codebook_from_rows(rows) -> list[tuple[int, list[float], float]]:
    """(cluster_id, dim_idx, c_v) rows -> [(id, vector, ||c||^2)]."""
    by_id: dict[int, dict[int, float]] = {}
    for r in rows:
        by_id.setdefault(int(r["cluster_id"]), {})[int(r["dim_idx"])] = (
            float(r["c_v"])
        )
    out = []
    for cid in sorted(by_id):
        vec = [by_id[cid][i] for i in range(len(by_id[cid]))]
        out.append((cid, vec, sum(c * c for c in vec)))
    return out


def _with_xx(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_xx", dot(F.col("_v"), F.col("_v")))


def kmeans_codebook(emb: DataFrame, k: int = 8, n_iters: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> list:
    """Train the codebook: deterministic seeds (`id_col < k`) plus
    `n_iters` Lloyd rounds. Returns [(cluster_id, vector, ||c||^2)] —
    the k x dim iteration state, collected per round (bounded by the
    codebook size, never the corpus)."""
    base = _with_xx(emb, id_col, vec_col)
    seed_rows = (
        base.filter(F.col("vec_id") < k)
        .select("vec_id", F.posexplode("_v").alias("dim_idx", "c_v"))
        .withColumnRenamed("vec_id", "cluster_id")
        .collect()
    )
    cents = _codebook_from_rows(seed_rows)

    dec = F.col("v").cast("decimal(28,6)")
    for _ in range(n_iters):
        assigned = base.select(
            "_v", _best_cluster(cents).alias("cluster_id")
        )
        new_rows = (
            assigned.select("cluster_id", F.posexplode("_v").alias("dim_idx", "v"))
            .groupBy("cluster_id", "dim_idx")
            .agg(
                (F.sum(dec).cast("double") / F.count(F.lit(1)).cast("double"))
                .alias("c_v")
            )
            .collect()
        )
        cents = _codebook_from_rows(new_rows)
    return cents


def assign_clusters(emb: DataFrame, cents: list,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cluster_id): map-only argmin over the literal codebook
    — no join, no shuffle; the bucketing step SemDeDup-style pipelines
    hang their within-cluster work on."""
    base = _with_xx(emb, id_col, vec_col)
    return base.select(
        "vec_id", _best_cluster(cents).alias("cluster_id")
    )


def kmeans_refine(emb: DataFrame, k: int = 8, n_iters: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Lloyd's algorithm with deterministic seeding (vectors with
    `id_col < k`), `n_iters` refinement rounds, then a final assignment.

    Returns one row per (cluster_id, dim_idx): the refined centroid
    component, plus per-cluster `n_members` and `inertia`
    (sum of 6dp-rounded squared distances, summed exactly via decimal).
    """
    base = _with_xx(emb, id_col, vec_col)
    cents = kmeans_codebook(emb, k=k, n_iters=n_iters,
                            id_col=id_col, vec_col=vec_col)

    final = base.select(_best_struct(cents).alias("_b")).select(
        F.col("_b")["cent_id"].alias("cluster_id"),
        F.col("_b")["dist"].alias("dist_r"),
    )

    stats = final.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("dist_r").cast("decimal(28,6)"))
        .cast("double")
        .alias("inertia"),
    )

    spark = emb.sparkSession
    cent_df = spark.createDataFrame(
        [(cid, i, v) for cid, vec, _ in cents for i, v in enumerate(vec)],
        "cluster_id int, dim_idx int, centroid_v double",
    )
    return (
        cent_df.join(F.broadcast(stats), "cluster_id")
        .select("cluster_id", "dim_idx", "centroid_v", "n_members", "inertia")
        .orderBy("cluster_id", "dim_idx")
    )
