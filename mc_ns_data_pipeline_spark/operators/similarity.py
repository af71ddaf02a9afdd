"""Embedding similarity search: brute-force cosine top-k (baseline) and
deterministic hyperplane-LSH bucketing (the scale path).

Vectors are `array<float>` columns; all math is promoted to double and
kept JVM-side via higher-order functions (zip_with/aggregate) — no
Python UDFs in the hot path. Cosines are rounded to 6 decimals before
ranking so ordering is stable across engines and partitionings (FP
accumulation differences live far below 1e-6).

At 100 TB: brute-force is candidates ⨯ broadcast(query-set) — linear in
the corpus and embarrassingly parallel. The LSH variant buckets the
corpus once (8 deterministic hyperplanes -> 256 buckets) and joins
queries to their bucket only, cutting the scan fan-out ~256× at some
recall cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def lit_vec(xs) -> Column:
    """Literal double-array column built as ONE parsed SQL expression.

    `F.array(*[F.lit(x) ...])` issues one py4j round-trip per element —
    ~1.7 s of pure driver time for 16×64 centroid literals (measured).
    A single `F.expr("array(...)")` string is one call; `repr(float)`
    is the shortest round-trip form, which the JVM parses back to the
    identical double.
    """
    return F.expr(
        "array({})".format(",".join(f"{float(x)!r}D" for x in xs))
    )


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product (zip_with + aggregate, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.select(
        "*", v.alias("_v"), l2_norm(v).alias("_norm")
    )


def _rank_window():
    """The one rank-ordering contract: best cosine first, ties to the
    lower neighbor id. (A function, not a module constant — building
    Column expressions requires an active SparkContext.)"""
    return Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )


def cosine_pairs(emb: DataFrame, query_pred: Column,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Shared ranked-cosine scaffolding: rows matching `query_pred` are
    the broadcast query set; every OTHER row is a candidate, scored by
    the rounded cosine (the one definition of the determinism contract
    — round 6, so rank ties break by neighbor id downstream).

    Returns (query_id, neighbor_id, cos_r) plus `query_<c>` /
    `neighbor_<c>` for each name in `extra_cols`. All consumers
    (`cosine_topk`, `hard_negative_topk`, `retrieval_mrr`) build on
    this one pair relation so rounding/tie-break/norm fixes happen in
    exactly one place.
    """
    base = with_norm(emb, vec_col)
    q = base.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        *[F.col(c).alias(f"query_{c}") for c in extra_cols],
        F.col("_v").alias("q_v"),
        F.col("_norm").alias("q_norm"),
    )
    c = base.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(cc).alias(f"neighbor_{cc}") for cc in extra_cols],
        F.col("_v").alias("c_v"),
        F.col("_norm").alias("c_norm"),
    )
    cos_r = F.round(
        dot(F.col("q_v"), F.col("c_v")) / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            *[f"query_{cc}" for cc in extra_cols],
            "neighbor_id",
            *[f"neighbor_{cc}" for cc in extra_cols],
            cos_r.alias("cos_r"),
        )
    )


def cosine_topk(emb: DataFrame, query_pred: Column, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: rows matching `query_pred` are the query
    set (broadcast); every other row is a candidate.

    Returns (query_id, neighbor_id, cos_r, rank). Rank ties broken by
    neighbor id for full determinism.
    """
    return (
        cosine_pairs(emb, query_pred, id_col, vec_col)
        .withColumn("rank", F.row_number().over(_rank_window()))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hard_negative_topk(emb: DataFrame, n_anchors: int = 30, k: int = 3,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the k most
    cosine-similar vectors with a DIFFERENT label.

    The standard pair-mining pass behind contrastive/metric training
    (in-batch negatives are easy; corpus-level nearest wrong-label
    vectors are the hard ones worth oversampling). Same execution shape
    as `cosine_topk`: anchors broadcast, one linear scan, per-anchor
    k-bounded top-k window — embarrassingly parallel at corpus scale,
    with the ANN buckets (LSH/IVF/PQ) as the drop-in candidate
    generator when a full scan is too slow.

    Returns (query_id, query_label, neighbor_id, neighbor_label,
    cos_r, rank); rank ties break by neighbor id.
    """
    pairs = cosine_pairs(
        emb, F.col(id_col) < n_anchors, id_col, vec_col,
        extra_cols=(label_col,),
    )
    return (
        pairs.filter(
            F.col(f"neighbor_{label_col}") != F.col(f"query_{label_col}")
        )
        .withColumn("rank", F.row_number().over(_rank_window()))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_weight(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weights from md5 — reproducible in SQL."""
    import hashlib

    h = hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def lsh_bucket(v: Column, n_dims: int, n_planes: int = N_PLANES) -> Column:
    """Sign-of-projection bucket key: one char per hyperplane."""
    chars = []
    for p in range(n_planes):
        weights = lit_vec(
            hyperplane_weight(p, d) for d in range(n_dims)
        )
        proj = dot(v, weights)
        chars.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*chars)


def cosine_topk_lsh(emb: DataFrame, query_pred: Column, k: int = 3,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_dims: int = 64) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket (approximate).

    Bucket equi-join replaces the full cross product: at corpus scale
    each query touches ~corpus/2^planes candidates.
    """
    base = with_norm(emb, vec_col).withColumn(
        "bucket", lsh_bucket(F.col("_v"), n_dims)
    )
    q = base.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("q_v"),
        F.col("_norm").alias("q_norm"),
        "bucket",
    )
    c = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("c_v"),
        F.col("_norm").alias("c_norm"),
        "bucket",
    )
    cos_r = F.round(
        dot(F.col("q_v"), F.col("c_v")) / (F.col("q_norm") * F.col("c_norm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos_r.alias("cos_r"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_topk(emb: DataFrame, query_pred: Column, k: int = 3,
             n_centroids: int = 16, n_probe: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN top-k: coarse centroids -> cluster assignment ->
    probe the query's nearest `n_probe` clusters -> exact re-rank.

    Centroids are deterministic (the vectors with id < n_centroids — a
    stand-in for a trained codebook; swap in k-means output without
    changing the dataflow). They are collected (tiny: n_centroids × d
    doubles) and inlined as literals, so cluster assignment is a pure
    map-only expression over the corpus — no shuffle, no join — exactly
    how an IVF build should look on a 1000-executor cluster. The only
    shuffles are the candidates join (keyed by cluster id, fan-out
    bounded by cluster sizes) and the final per-query top-k window.

    Ties everywhere break toward the lower id for cross-engine
    determinism (cosines rounded to 6 decimals first).
    """
    base = with_norm(emb, vec_col)
    cent_rows = (
        base.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cent_id"), "_v", "_norm")
        .collect()
    )
    # struct(cos, -cent_id): array_max/sort_array order lexicographically,
    # so max == highest cosine, ties -> highest -cent_id == lowest cent_id.
    scored = F.array(*[
        F.struct(
            F.round(
                dot(F.col("_v"), lit_vec(r["_v"]))
                / (F.col("_norm") * F.lit(float(r["_norm"]))),
                6,
            ).alias("cos"),
            F.lit(-int(r["cent_id"])).alias("neg_cent_id"),
        )
        for r in cent_rows
    ])
    with_best = base.select(
        F.col(id_col), F.col("_v"), F.col("_norm"),
        F.sort_array(scored, asc=False).alias("_ranked"),
    )
    assign = with_best.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("c_v"),
        F.col("_norm").alias("c_norm"),
        (-F.col("_ranked")[0]["neg_cent_id"]).alias("cent_id"),
    )
    probes = (
        with_best.filter(query_pred)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("_v").alias("q_v"),
            F.col("_norm").alias("q_norm"),
            F.explode(
                F.transform(
                    F.slice(F.col("_ranked"), 1, n_probe),
                    lambda s: -s["neg_cent_id"],
                )
            ).alias("cent_id"),
        )
    )
    cos_r = F.round(
        dot(F.col("q_v"), F.col("c_v")) / (F.col("q_norm") * F.col("c_norm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        assign.join(F.broadcast(probes), "cent_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos_r.alias("cos_r"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_neardup_exact(emb: DataFrame, threshold: float = 0.4,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Exact embedding-cosine near-dup pairs via blocked matrix product.

    Each partition's block of vectors is multiplied (BLAS, float64)
    against the broadcast full matrix — the classic blocked-GEMM shape:
    O(n^2 d) flops but ~100× the throughput of per-element expression
    evaluation, and embarrassingly parallel across blocks. Broadcast
    holds to ~10^6-10^7 vectors; past that use `embedding_neardup_grid`
    (both sides blocked, no driver matrix — same exact result) or
    switch to `embedding_neardup_pairs` (LSH, approximate).

    Cosines are rounded to 6 decimals; FP summation-order differences
    (BLAS pairwise vs sequential) sit ~1e-16 relative, far below the
    rounding grain.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    pdf_ids, mat = _broadcast_matrix(emb, id_col, vec_col)
    ids_b = spark.sparkContext.broadcast(pdf_ids)
    mat_b = spark.sparkContext.broadcast(mat)
    thr = float(threshold)
    out_schema = "vec_a long, vec_b long, cos_r double"

    def block(batches):
        all_ids = ids_b.value
        m = mat_b.value
        norms = np.sqrt((m * m).sum(axis=1))
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy()
            # vstack over the arrow-backed arrays: one C-level copy, no
            # per-row python conversion loop
            a = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            a_norms = np.sqrt((a * a).sum(axis=1))
            cos = (a @ m.T) / np.outer(a_norms, norms)
            # prefilter with an epsilon guard, round only the candidates:
            # np.round over the full n_block x n matrix costs more than
            # the GEMM itself (measured at 20k vectors). The 1e-6 slack
            # admits every value that could round up across the
            # threshold; the exact rounded compare then decides.
            mask = (cos >= thr - 1e-6) & (a_ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(mask)
            cr = np.round(cos[ai, bj], 6)
            keep = cr >= thr
            yield pd.DataFrame({
                "vec_a": a_ids[ai[keep]],
                "vec_b": all_ids[bj[keep]],
                "cos_r": cr[keep],
            })

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(block, out_schema)
        .orderBy("vec_a", "vec_b")
    )


def _broadcast_matrix(emb: DataFrame, id_col: str, vec_col: str):
    """Materialize (ids, float64 matrix) for broadcast. Driver memory is
    the documented bound (8 B × n × d); see embedding_neardup_exact."""
    import numpy as np

    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, mat


def embedding_neardup_grid(emb: DataFrame, threshold: float = 0.4,
                           n_blocks: int = 4,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact embedding-cosine near-dup via a GRID of block pairs — the
    beyond-driver-memory path `embedding_neardup_exact` names.

    Both sides are blocked: each vector hashes to one of `n_blocks`
    blocks, and every unordered block pair (i <= j) becomes one cogroup
    task that runs a float64 GEMM over just those two blocks. Per-task
    memory is 2·(n/n_blocks)·d·8 bytes — size n_blocks so a block pair
    fits an executor, and NOTHING is ever collected to the driver
    (contrast `_broadcast_matrix`). Cost model: each row is shuffled to
    ~n_blocks grid cells, so shuffle volume is n_blocks× the input —
    the unavoidable price of exact all-pairs without a broadcast side;
    recall-lossy LSH (`embedding_neardup_pairs`) stays the cheaper
    option when approximate is acceptable.

    Result is identical to `embedding_neardup_exact` (same float64 BLAS
    dot products, same 6-decimal rounding; equality pinned by
    test_properties.py::test_grid_neardup_equals_broadcast).
    """
    import numpy as np
    import pandas as pd

    nb = int(n_blocks)
    thr = float(threshold)
    base = emb.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("blk"),
    )
    # A-side feeds every cell in its block's row of the upper triangle;
    # B-side feeds every cell in its block's column. The B-side columns
    # are RENAMED: both sides share the same lineage, and cogroup's
    # attribute dedup over identical (name, exprId) pairs can prune the
    # right side's payload columns out of the Arrow batch entirely
    # (observed: right pdf arrives with only the grouping keys).
    a_side = base.select(
        "vid", "v", F.col("blk").alias("pi"),
        F.explode(F.sequence(F.col("blk"), F.lit(nb - 1))).alias("pj"),
    )
    b_side = base.select(
        F.col("vid").alias("rvid"), F.col("v").alias("rv"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("pi"),
        F.col("blk").alias("pj"),
    )

    def gemm(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos_r": pd.Series(dtype="float64"),
        })
        if len(left) == 0 or len(right) == 0:
            return empty
        a_ids = left["vid"].to_numpy()
        b_ids = right["rvid"].to_numpy()
        a = np.vstack(left["v"].to_numpy()).astype(np.float64)
        b = np.vstack(right["rv"].to_numpy()).astype(np.float64)
        cos = (a @ b.T) / np.outer(
            np.sqrt((a * a).sum(axis=1)), np.sqrt((b * b).sum(axis=1))
        )
        if key[0] == key[1]:
            # diagonal cell: both sides are the same block — the id
            # order filter dedupes the two orientations of each pair
            mask = (cos >= thr - 1e-6) & (a_ids[:, None] < b_ids[None, :])
        else:
            # off-diagonal: blocks are disjoint, every cross pair is
            # unique to this cell; canonicalize ids below
            mask = cos >= thr - 1e-6
        ai, bj = np.nonzero(mask)
        cr = np.round(cos[ai, bj], 6)
        keep = cr >= thr
        u, w = a_ids[ai[keep]], b_ids[bj[keep]]
        return pd.DataFrame({
            "vec_a": np.minimum(u, w),
            "vec_b": np.maximum(u, w),
            "cos_r": cr[keep],
        })

    return (
        a_side.groupBy("pi", "pj")
        .cogroup(b_side.groupBy("pi", "pj"))
        .applyInPandas(gemm, "vec_a long, vec_b long, cos_r double")
        .orderBy("vec_a", "vec_b")
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_dims: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + verify.

    Same-bucket pairs only (scale-safe); exact cosine verifies against
    the threshold. For the exact variant use a full self-join at small n.
    """
    base = with_norm(emb, vec_col).withColumn(
        "bucket", lsh_bucket(F.col("_v"), n_dims)
    )
    a = base.select(
        F.col(id_col).alias("vec_a"), F.col("_v").alias("v_a"),
        F.col("_norm").alias("n_a"), "bucket",
    )
    b = base.select(
        F.col(id_col).alias("vec_b"), F.col("_v").alias("v_b"),
        F.col("_norm").alias("n_b"), "bucket",
    )
    cos_r = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos_r.alias("cos_r"))
        .filter(F.col("cos_r") >= threshold)
        .distinct()
        .orderBy("vec_a", "vec_b")
    )


def classifier_weight(dim: int) -> float:
    """Deterministic linear-classifier weight for dimension `dim`.

    Plays the trained quality-classifier weight vector (fastText-style
    doc filtering); a simple closed form both engines can inline as a
    literal array.
    """
    return ((dim % 7) - 3) / 10.0


def classifier_score(emb: DataFrame, threshold: float = 0.5,
                     n_dims: int = 64, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     carry_cols: tuple[str, ...] = ("label",)) -> DataFrame:
    """Linear-model scoring pass: sigmoid(w.v + b) + keep flag.

    The quality-classifier filter step of an LLM data pipeline: a small
    trained model scores every document embedding and a threshold
    gates what enters the training set. The weight vector is a literal
    (broadcast-free — it lives in the plan), the dot product is
    JVM-side zip_with/aggregate, and the whole pass is MAP-ONLY: at
    100 TB it pipelines with the scan, no shuffle, no Python.

    Scores round to 6 decimals before the threshold so the keep
    decision is reproducible across engines and partitionings.
    `carry_cols` are passthrough columns for the output (a plain
    scoring pass on an unlabeled table passes `()`).
    """
    w = lit_vec(classifier_weight(d) for d in range(n_dims))
    v = _as_double(F.col(vec_col))
    logit = dot(v, w) + F.lit(0.05)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return emb.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        score.alias("quality_score"),
        (score >= threshold).alias("keep"),
    )


def ann_recall(emb: DataFrame, query_pred: Column, k: int = 3,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Recall@k of the LSH path against exact brute force, per query.

    "Measure, don't guess": before trusting an approximate index at
    corpus scale, quantify its recall on a sampled query set. Both
    sides reuse the declared operators (exact top-k is the ground
    truth; same k, same tie-breaks), join on (query, neighbor), and a
    tiny per-query aggregate yields hit counts and recall. The query
    sample is small by construction, so every post-topk relation is
    k-bounded — the expensive parts are exactly the two operators being
    compared.
    """
    exact = cosine_topk(emb, query_pred, k=k, id_col=id_col,
                        vec_col=vec_col)
    approx = cosine_topk_lsh(emb, query_pred, k=k, id_col=id_col,
                             vec_col=vec_col)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select(
                "query_id", "neighbor_id", F.lit(1).alias("hit")
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    n_approx = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_approx")
    )
    return (
        hits.join(n_approx, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_approx", F.lit(0)).alias("n_approx"),
            "n_hit",
            (
                F.col("n_hit").cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def pq_ann_recall(emb: DataFrame, n_subspaces: int = 8, sub_dim: int = 8,
                  n_codes: int = 16, k: int = 5,
                  n_queries: int = 20,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Product-quantization ANN (Jégou, Douze, Schmid 2011, IEEE TPAMI
    33(1) — "Product Quantization for Nearest Neighbor Search") with
    asymmetric-distance ranking, measured by recall@k against exact L2.

    PQ is the embedding-compression workhorse at corpus scale: each
    vector stores `n_subspaces` byte codes (here 8 bytes vs 256 bytes
    of float32 — 32x), and query scoring touches only the codes plus a
    per-query lookup table.

    Scale shape:
      * Codebooks are TRAINED: deterministic seeds (subvectors of the
        first `n_codes` vectors) refined by one distributed Lloyd
        iteration per subspace — the same map-only-assignment +
        decimal-exact-update shape as operators/clustering.py, run for
        all subspaces in one pass (the update shuffle carries
        n_subspaces x n_codes x sub_dim partials, independent of
        corpus size). Measured on the sf0.01 fixture: recall@5 0.30
        trained vs 0.17 with raw seed codebooks.
      * ENCODING is map-only: per subspace an argmin over n_codes
        literal centroids — no join, no shuffle, exactly the shape of
        ivf_topk's cluster assignment.
      * SCORING is ADC: est_d2(q, x) = sum_m LUT_q[m][code_m(x)]. The
        LUT is an expression over the broadcast query row, so scoring
        is candidates x broadcast(queries) — a linear scan, no shuffle
        until the k-bounded per-query top-k window.
      * Distances use the same xx - 2<x,c> + cc expansion on both
        engines, rounded to 6 dp (+0.0 normalizes -0.0), ties to the
        lower code/neighbor id — the cross-engine determinism contract.
    """
    base = emb.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("_v"),
    )

    def sub(col: Column, m: int) -> Column:
        return F.slice(col, m * sub_dim + 1, sub_dim)

    def lit_cb_m(row) -> Column:
        """One subspace codebook as a SINGLE literal array<struct<sv,cc>>.

        Keeping the codebook as a literal array and scanning it with
        higher-order functions (transform/array_min) keeps the Catalyst
        tree O(n_subspaces) instead of O(n_subspaces x n_codes) unrolled
        struct branches — the unrolled form cost ~26 s of pure
        analysis/codegen per training pass at 8x16x8 (measured sf0.1);
        this form builds in <2 s with bit-identical results (the lambda
        evaluates the same xx - 2<x,c> + cc expansion per element).
        """
        items = ",".join(
            "named_struct('sv',array({}),'cc',{!r}D)".format(
                ",".join(f"{float(x)!r}D" for x in sv), float(cc)
            )
            for sv, cc in row
        )
        return F.expr(f"array({items})")

    def make_codes(cb_cols) -> Column:
        """codes[m] = argmin_c round(d2, 6), ties -> low code (map-only).

        transform + array_min over the literal codebook array: the
        lexicographic (d, code) struct min sends ties to the lower code.
        (An aggregate-fold variant that carries dot(x_sub, x_sub) in the
        accumulator was measured SLOWER at sf0.1 — the per-element
        4-field struct rebuild outweighs the saved sub-dim dot.)
        """
        def code_m(m: int) -> Column:
            x_sub = sub(F.col("_v"), m)
            return F.array_min(
                F.transform(
                    cb_cols[m],
                    lambda c, i: F.struct(
                        (F.round(
                            dot(x_sub, x_sub)
                            - F.lit(2.0) * dot(x_sub, c["sv"])
                            + c["cc"],
                            6,
                        ) + F.lit(0.0)).alias("d"),
                        i.alias("code"),
                    ),
                )
            )["code"]

        return F.array(*[code_m(m) for m in range(n_subspaces)])

    # --- seed codebooks: subvectors of the first n_codes vectors
    cb_rows = sorted(
        base.filter(F.col("vid") < n_codes).collect(),
        key=lambda r: r["vid"],
    )
    seed_cb = []
    for m in range(n_subspaces):
        row = []
        for r in cb_rows:
            sv = list(r["_v"])[m * sub_dim:(m + 1) * sub_dim]
            row.append((sv, sum(x * x for x in sv)))
        seed_cb.append(row)

    # --- one Lloyd iteration, all subspaces in one pass: assign with
    # seed literals (map-only), explode (subspace, code, dim,
    # component), decimal-exact mean per (m, code, dim). The collect is
    # n_subspaces x n_codes x sub_dim doubles — codebook-sized.
    seed_cols = [lit_cb_m(row) for row in seed_cb]
    assigned = base.select(
        F.col("_v"), make_codes(seed_cols).alias("codes0")
    )
    comp = assigned.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(m).alias("m"),
                F.element_at("codes0", m + 1).alias("code"),
                sub(F.col("_v"), m).alias("xs"),
            )
            for m in range(n_subspaces)
        ])).alias("s")
    ).select(
        "s.m", "s.code", F.posexplode("s.xs").alias("di", "cv")
    )
    refined_rows = (
        comp.groupBy("m", "code", "di")
        .agg(
            (F.sum(F.col("cv").cast("decimal(28,6)")).cast("double")
             / F.count(F.lit(1)).cast("double")).alias("cv")
        )
        .collect()
    )
    by_mc: dict = {}
    for r in refined_rows:
        by_mc.setdefault((int(r["m"]), int(r["code"])), {})[int(r["di"])] = (
            float(r["cv"])
        )
    codebook = []
    for m in range(n_subspaces):
        row = []
        for c in sorted(cc for (mm, cc) in by_mc if mm == m):
            sv = [by_mc[(m, c)][i] for i in range(sub_dim)]
            row.append((sv, sum(x * x for x in sv)))
        codebook.append(row)

    # refined code ids are positional within each subspace's surviving
    # codes (empty seed clusters drop out); positional order preserves
    # the seed-id order, so argmin tie-breaks agree with the oracle's
    # original-id labels — labels never leave the operator.

    cb_cols = [lit_cb_m(row) for row in codebook]
    encoded = base.select(
        F.col("vid").alias("neighbor_id"),
        make_codes(cb_cols).alias("codes"),
    )

    queries = base.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("_v").alias("q_v")
    )

    # --- ADC estimate: sum_m LUT[m][codes[m]] over the broadcast query
    paired = encoded.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # d2 is computed ONLY for the stored code (element_at into the
    # literal codebook), not for all n_codes then discarded — the
    # selected value is float-identical either way.
    def est_term(m: int) -> Column:
        q_sub = sub(F.col("q_v"), m)
        cst = F.element_at(cb_cols[m], F.element_at("codes", m + 1) + F.lit(1))
        return (
            dot(q_sub, q_sub)
            - F.lit(2.0) * dot(q_sub, cst["sv"])
            + cst["cc"]
        )

    est_terms = [est_term(m) for m in range(n_subspaces)]
    est = paired.select(
        "query_id", "neighbor_id",
        (F.round(sum(est_terms[1:], est_terms[0]), 6)
         + F.lit(0.0)).alias("est_d2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("est_d2"), F.asc("neighbor_id")
    )
    pq_topk = (
        est.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )

    # --- exact L2 ground truth (same expansion, full vectors)
    cand = base.select(
        F.col("vid").alias("neighbor_id"), F.col("_v").alias("c_v")
    )
    ex = (
        cand.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (F.round(
                dot(F.col("c_v"), F.col("c_v"))
                - F.lit(2.0) * dot(F.col("c_v"), F.col("q_v"))
                + dot(F.col("q_v"), F.col("q_v")),
                6,
            ) + F.lit(0.0)).alias("d2"),
        )
    )
    wx = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    ex_topk = (
        ex.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )

    return (
        ex_topk.join(
            F.broadcast(pq_topk.withColumn("hit", F.lit(1))),
            ["query_id", "neighbor_id"], "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
            .alias("n_hit"),
        )
        .select(
            "query_id", "n_exact", "n_hit",
            (F.col("n_hit").cast("double")
             / F.col("n_exact").cast("double")).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


def retrieval_mrr(emb: DataFrame, n_queries: int = 30,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  label_col: str = "label") -> DataFrame:
    """Retrieval-quality evaluation: per-query reciprocal rank of the
    FIRST same-label neighbor under exact cosine ranking (labels as
    relevance judgments). Averaging `rr` gives MRR — the standard
    embedding-quality metric tracked across encoder versions; the
    per-query rows keep the metric debuggable (which queries rank
    their class poorly).

    Same broadcast-queries x linear-scan shape as `cosine_topk`, but
    the rank window must cover the full candidate ranking (the first
    hit can be anywhere), so the per-query sort is corpus-sized: at
    real scale the candidate set comes from an ANN operator (x10/x13/
    x57) and rr is computed within its (bounded) candidate list, which
    is exactly how retrieval eval is run in practice.

    Ties break by neighbor id; queries whose class has no other member
    report a null rank (excluded from MRR by convention).
    """
    ranked = cosine_pairs(
        emb, F.col(id_col) < n_queries, id_col, vec_col,
        extra_cols=(label_col,),
    ).withColumn("rank", F.row_number().over(_rank_window()))
    hits = ranked.filter(
        F.col(f"neighbor_{label_col}") == F.col(f"query_{label_col}")
    ).groupBy("query_id", f"query_{label_col}").agg(
        F.min("rank").alias("first_hit_rank")
    )
    queries = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias(f"query_{label_col}"),
    )
    return (
        queries
        .join(hits, ["query_id", f"query_{label_col}"], "left")
        .select(
            "query_id",
            f"query_{label_col}",
            "first_hit_rank",
            (F.lit(1.0) / F.col("first_hit_rank").cast("double")).alias(
                "rr"
            ),
        )
        .orderBy("query_id")
    )
