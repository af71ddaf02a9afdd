"""Deterministic sampling operators for training-data curation.

Complements `functions/text.hash_sample_bucket` (the md5-bucket
threshold sample, x18): that one is map-only and scales to any stratum
size, but its per-stratum counts are only approximate (each row flips
an independent deterministic coin). `stratified_sample` here delivers
EXACT per-stratum counts — ceil(fraction · n_stratum) rows — which is
what curation quotas ("exactly 20% of every language") actually need.

Scale shape: one shuffle by the stratum key, then a per-stratum sort by
md5 rank. Parallelism is bounded by the number of strata (a language
column gives dozens of reducers, not thousands), so for very hot strata
at extreme scale, either salt the stratum sort or fall back to the
approximate bucket sample; both trade-offs are the standard exact-vs-
approximate quota choice. Ranking by md5(id) makes the selection
reproducible across engines, runs, and partitionings — rand()-based
sampling can never be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_rank(id_col: Column) -> Column:
    """Deterministic per-row sort key, uniform over the id space."""
    return F.md5(id_col.cast("string"))


def stratified_sample(df: DataFrame, strata_col: str, fraction: float,
                      id_col: str) -> DataFrame:
    """Exact-count stratified sample: the ceil(fraction·n) md5-lowest
    rows of each stratum. Adds `n_stratum` (stratum size) and
    `sample_rank` (1-based rank within the stratum) for auditability.
    """
    w_count = Window.partitionBy(strata_col)
    w_rank = Window.partitionBy(strata_col).orderBy(
        md5_rank(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("n_stratum", F.count(F.lit(1)).over(w_count))
        .withColumn("sample_rank", F.row_number().over(w_rank))
        .filter(
            F.col("sample_rank")
            <= F.ceil(F.lit(float(fraction)) * F.col("n_stratum"))
        )
    )


def priority_sample(df: DataFrame, weight_col: str, id_col: str,
                    k: int = 50) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield–Lund–Thorup): priority q_i = w_i / u_i with u_i uniform
    in (0,1], keep the k largest priorities. Heavy rows are near-certain
    to be kept; expectations are unbiased under the threshold estimator.

    Engine-exactness contract: u_i is derived from md5(id) (first 8 hex
    chars -> v in [0, 2^32)), and the priority is computed as the pure
    INTEGER quotient w * 2^32 / (v + 1) — no float division, so DuckDB
    reproduces the ranking bit-for-bit (w <= ~10^5 keeps the product
    far inside int64). Scale shape: map-only scoring + TakeOrdered
    top-k; no shuffle, no window, nothing corpus-sized on the driver.
    """
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    # `div` (integral division), NOT `/`: float division of the int64
    # operands is only correctly-rounded, and floor() of a quotient
    # that rounds up across an integer boundary (tiny v, huge w*2^32)
    # would disagree with the oracle's exact integer quotient.
    scored = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        (F.col(weight_col).cast("long") * F.lit(4294967296).cast("long"))
        .alias("_num"),
        (v + F.lit(1)).alias("_den"),
    )
    return (
        scored.select(
            id_col, "weight", F.expr("_num div _den").alias("priority")
        )
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_mixture_sample(df: DataFrame, strata_col: str,
                            fractions: dict[str, float],
                            default_fraction: float,
                            id_col: str) -> DataFrame:
    """Dataset mixing: per-stratum sampling RATES that reshape the
    corpus toward a target mixture (upweight curated sources, dampen
    bulk ones) — the standard reweighting step before training-data
    assembly. Strata missing from `fractions` get `default_fraction`.

    Same exact-count, md5-ranked machinery as `stratified_sample`
    (reproducible, oracle-checkable), with the fraction resolved per
    row from a literal CASE — no join against a weights table, so the
    plan stays one stratum shuffle regardless of how many strata exist.
    """
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == k, F.lit(float(v))
        ).otherwise(frac)
    w_count = Window.partitionBy(strata_col)
    w_rank = Window.partitionBy(strata_col).orderBy(
        md5_rank(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("n_stratum", F.count(F.lit(1)).over(w_count))
        .withColumn("sample_rank", F.row_number().over(w_rank))
        .withColumn("target_frac", frac)
        .filter(
            F.col("sample_rank")
            <= F.ceil(F.col("target_frac") * F.col("n_stratum"))
        )
    )


def token_budget_mixture(df: DataFrame, source_col: str, token_col: str,
                         id_col: str, weights: dict[str, int],
                         default_weight: int = 1,
                         budget_num: int = 1, budget_den: int = 2,
                         buckets: int = 10_000) -> DataFrame:
    """Token-budget mixture planning: derive a per-source sampling RATE
    from a target mixture and a global token budget, then hash-sample
    to it — the data-mixing step that sizes each source's contribution
    in TOKENS (what the training run consumes), not rows.

    `weights` are integer mixture weights (e.g. {"wiki": 3} with
    default 1 = wiki gets 3 shares); the global budget is
    `budget_num/budget_den` of corpus tokens. Each source's token
    budget is `budget · weight/Σweights`, its rate is
    `min(1, budget_s/tokens_s)` expressed in md5 buckets, and the
    selection is the same deterministic bucket threshold as
    `hash_sample_bucket` (x18) — reproducible across engines, so the
    whole plan AND its realized sample are oracle-checkable. All rate
    arithmetic is integer (long `div`), no doubles anywhere: floor
    division of exact longs is bit-identical in any engine, where a
    float rate at a bucket boundary would not be.

    Unlike `weighted_mixture_sample` (given per-stratum ROW fractions,
    exact row quotas via a rank window), this derives TOKEN-share rates
    from the data and stays window-free: one small groupBy(source), a
    broadcast of the k-row plan back onto the corpus, a map-only
    filter, and a second small groupBy — no per-stratum sort, so hot
    sources don't serialize through one reducer at 100 TB.

    Output (one row per source, ordered): source, source_docs,
    source_tokens, weight, budget_tokens, rate_buckets, selected_docs,
    selected_tokens.
    """
    from mc_ns_data_pipeline_spark.functions.text import hash_sample_bucket

    weight = F.lit(int(default_weight)).cast("long")
    for k, v in sorted(weights.items()):
        weight = F.when(
            F.col("source") == k, F.lit(int(v)).cast("long")
        ).otherwise(weight)

    # Materialize: the relation is consumed twice (plan aggregation and
    # the selection filter scan), and at the x79 call site the token
    # column is a per-document regex battery — without the checkpoint
    # the second consumer re-tokenizes the whole corpus.
    toks = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        F.col(token_col).cast("long").alias("_tokens"),
    ).localCheckpoint(eager=False)
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("source_docs"),
        F.sum("_tokens").alias("source_tokens"),
    ).withColumn("weight", weight.alias("weight"))
    totals = per_src.agg(
        F.sum("source_tokens").alias("_corpus_tokens"),
        F.sum("weight").alias("_weight_sum"),
    )
    plan = (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn(
            "budget_tokens",
            F.expr(
                f"({budget_num} * _corpus_tokens * weight)"
                f" div ({budget_den} * _weight_sum)"
            ),
        )
        .withColumn(
            "rate_buckets",
            F.least(
                F.lit(buckets).cast("long"),
                F.expr(
                    f"({buckets} * {budget_num} * weight * _corpus_tokens)"
                    f" div ({budget_den} * _weight_sum * source_tokens)"
                ),
            ),
        )
        .drop("_corpus_tokens", "_weight_sum")
    )
    selected = (
        toks.join(
            F.broadcast(plan.select("source", "rate_buckets")), "source"
        )
        .filter(hash_sample_bucket(F.col("_id"), buckets)
                < F.col("rate_buckets"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("selected_docs"),
            F.sum("_tokens").alias("selected_tokens"),
        )
    )
    return (
        plan.join(F.broadcast(selected), "source", "left")
        .select(
            "source", "source_docs", "source_tokens", "weight",
            "budget_tokens", "rate_buckets",
            F.coalesce("selected_docs", F.lit(0)).alias("selected_docs"),
            F.coalesce("selected_tokens", F.lit(0)).alias("selected_tokens"),
        )
        .orderBy("source")
    )


def label_balance(df: DataFrame, label_col: str, id_col: str) -> DataFrame:
    """Class-balanced downsampling: keep exactly n_min rows per label,
    where n_min is the smallest class's size — the standard rebalance
    before training a classifier on skewed labels (quality heads,
    language routers).

    Selection is md5-ranked (reproducible across engines/partitionings,
    like `stratified_sample`); the global minimum class size rides in
    as a one-row broadcast cross join so the plan stays collect-free.
    Output = input columns + `sample_rank` (the 1-based within-class
    rank, for auditability — same contract as `stratified_sample`).
    Scale shape: one shuffle by label for the rank window plus a
    label-cardinality aggregate — per-label sort parallelism is bounded
    by class count, the same exact-vs-approximate trade documented on
    `stratified_sample`.
    """
    w_rank = Window.partitionBy(label_col).orderBy(
        md5_rank(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    n_min = (
        df.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("n_label"))
        .agg(F.min("n_label").alias("n_min"))
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(n_min))
        .filter(F.col("sample_rank") <= F.col("n_min"))
        .drop("n_min")
    )


def per_group_calibration(df: DataFrame, group_col: str, score_col: str,
                          id_col: str, n_buckets: int = 10) -> DataFrame:
    """Per-group score calibration: percent_rank and an ntile bucket of
    `score_col` WITHIN each group — the standard fix for mixing
    heterogeneous sources whose raw quality scores are not comparable
    (a 0.7 from a curated source is not a 0.7 from bulk crawl; the
    within-source quantile is).

    percent_rank = (rank-1)/(n-1) over a fully deterministic
    (score, id) ordering — exact integer division, cross-engine
    stable. One shuffle by group; per-group sort parallelism is
    bounded by group count (same trade as `stratified_sample`).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    return df.select(
        id_col,
        group_col,
        score_col,
        F.percent_rank().over(w).alias("pct_rank"),
        F.ntile(n_buckets).over(w).alias("bucket"),
    )
