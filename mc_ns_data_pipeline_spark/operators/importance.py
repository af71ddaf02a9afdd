"""DSIR-style importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al. 2023, arXiv
2302.03169): fit cheap bag-of-hashed-ngrams models on a TARGET
distribution (the domain you want more of) and on the RAW pool, then
weight every raw document by the log-likelihood ratio and keep the
top-weighted ones. This is the standard pretraining-corpus curation
step the reference (a record-level ETL — mastercontrol_pipeline/
data_fetch_system/bulk_fetch.py) has no analogue for; it joins the
text family's token contract (functions/text.py).

Execution shape (100 TB reading):

- Both models are `n_buckets` rows (64 here) — they live in ONE
  broadcastable DataFrame regardless of corpus size. Training is one
  token-bucket aggregate each, partial-aggregated map-side, so the
  only shuffles move ≤ n_buckets rows per partition.
- Scoring explodes tokens map-side (a doc's tokens stay in its
  partition), pre-aggregates (doc_id, bucket) counts locally, joins
  the broadcast model with no exchange, and the per-document weight
  sum's partial phase collapses to one row per document before the
  single |documents|-row shuffle.
- Selection is orderBy+limit = TakeOrderedAndProject (per-partition
  top-k, one k-row merge) — never a global sort. At a real 100 TB run
  you'd select by a weight THRESHOLD (pure filter, no ordering);
  top-k is used here because it makes the output deterministic.

Exactness contract: ln() differs by 1 ulp between JVM and DuckDB on
~3% of inputs (measured for operators/lm.py), so per-bucket log-probs
are rounded to 6 dp and carried as DECIMAL(18,6); per-document sums
are count * decimal accumulated in DECIMAL(28,6) — order-independent
and byte-identical in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.text import words


def token_bucket(token: Column, n_buckets: int) -> Column:
    """Deterministic md5 feature bucket (engine-reproducible hashing,
    same codec as functions/text.hash_sample_bucket)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("long")
        % n_buckets
    )


def _log_probs(counts: DataFrame, total: DataFrame, n_buckets: int,
               out_col: str) -> DataFrame:
    """Add-one-smoothed log p(bucket), rounded to 6 dp as DECIMAL(18,6).

    `total` is a 1-row (n_total) aggregate kept in-plan (broadcast
    cross join — no driver collect), same idiom as lm.train_unigram_lm.
    """
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("cnt") + F.lit(1)).cast("double")
                / (F.col("n_total") + F.lit(n_buckets)).cast("double")
            ),
            6,
        ).cast("decimal(18,6)").alias(out_col),
    )


def dsir_weights(docs: DataFrame, is_target: Column,
                 n_buckets: int = 64, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document DSIR log importance weight.

    Returns (doc_id, n_tokens, log_weight): log p_target(doc) -
    log p_raw(doc) under add-one-smoothed hashed-unigram models.
    `is_target` marks the rows that define the target distribution
    (they stay in the raw pool too, as in the paper's setup).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_is_target"),
        F.explode(words(F.col(text_col))).alias("token"),
    ).withColumn("bucket", token_bucket(F.col("token"), n_buckets))

    # ONE corpus pass: collapse tokens to (doc, bucket) counts — at
    # most |docs| x n_buckets rows — and persist. Both models, both
    # totals, and the scoring join all derive from this compact
    # relation instead of re-scanning the corpus (the naive layout
    # re-read the source 6x; exact long sums keep everything
    # order-independent).
    doc_buckets = (
        toks.groupBy("doc_id", "_is_target", "bucket")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    target_buckets = doc_buckets.filter(F.col("_is_target"))

    def _model_counts(src: DataFrame) -> DataFrame:
        return src.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))

    def _model_total(src: DataFrame) -> DataFrame:
        return src.agg(F.sum("cnt").alias("n_total"))

    model = (
        _log_probs(
            _model_counts(doc_buckets),
            _model_total(doc_buckets),
            n_buckets,
            "logp_raw",
        )
        .join(
            _log_probs(
                _model_counts(target_buckets),
                _model_total(target_buckets),
                n_buckets,
                "logp_target",
            ),
            "bucket",
            "left",
        )
        # Buckets absent from the target still get smoothed mass:
        # ln(1 / (N_t + B)) — the same value _log_probs assigns a
        # zero-count bucket.
        .crossJoin(
            F.broadcast(
                target_buckets.agg(F.sum("cnt").alias("_nt"))
            )
        )
        .select(
            "bucket",
            F.coalesce(
                F.col("logp_target"),
                F.round(
                    F.log(
                        F.lit(1.0)
                        / (F.col("_nt") + F.lit(n_buckets)).cast("double")
                    ),
                    6,
                ).cast("decimal(18,6)"),
            ).alias("logp_target"),
            "logp_raw",
        )
    )

    return (
        doc_buckets.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(
                F.col("cnt")
                * (F.col("logp_target") - F.col("logp_raw"))
            )
            .cast("decimal(28,6)")
            .cast("double")
            .alias("log_weight"),
        )
    )


def dsir_select(docs: DataFrame, is_target: Column, k: int,
                n_buckets: int = 64) -> DataFrame:
    """Top-k raw documents by DSIR weight (deterministic doc_id
    tiebreak; TakeOrderedAndProject — see module docstring)."""
    return (
        dsir_weights(docs, is_target, n_buckets=n_buckets)
        .orderBy(F.desc("log_weight"), F.asc("doc_id"))
        .limit(k)
    )
