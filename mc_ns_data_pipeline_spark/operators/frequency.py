"""Corpus token-frequency operators: per-language heavy hitters.

Vocabulary statistics (top-k tokens, document frequency) are a staple
of training-data curation — stopword discovery, tokenizer coverage
checks, boilerplate detection. The shapes here are built for corpora
where the token stream is ~1e12 rows but the vocabulary is ~1e8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.text import words


def token_frequencies(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      lang_col: str = "lang") -> DataFrame:
    """(lang, word, n_occ, n_docs) — corpus term + document frequency.

    The doc-frequency count needs per-(word, doc) dedup, which naively
    is a count-distinct over the full token stream (an Expand that
    doubles the shuffle). Instead each doc pre-aggregates ROW-LOCALLY:
    array_distinct over its word array gives the doc's vocabulary, and
    an in-row filter() counts each word's occurrences. The explode then
    emits one row per (doc, distinct word) — bounded by per-doc
    vocabulary, not token count — and a single plain groupBy sums
    n_occ and counts rows for n_docs. One shuffle, no distinct-Expand,
    map-side partial aggregation applies.

    The word array is bound to a real column before the lambda
    (Catalyst does no CSE inside lambda bodies).
    """
    bound = df.select(
        F.col(id_col), F.col(lang_col), words(F.col(text_col)).alias("_ws")
    )
    per_doc = bound.select(
        F.col(lang_col),
        F.explode_outer(
            F.transform(
                F.array_distinct("_ws"),
                lambda w: F.struct(
                    w.alias("word"),
                    F.size(
                        F.filter("_ws", lambda x: x == w)
                    ).alias("n_in_doc"),
                ),
            )
        ).alias("wc"),
    ).filter(F.col("wc").isNotNull())
    return per_doc.groupBy(
        F.col(lang_col).alias("lang"), F.col("wc.word").alias("word")
    ).agg(
        F.sum("wc.n_in_doc").alias("n_occ"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def top_k_tokens(df: DataFrame, k: int = 10, text_col: str = "text",
                 id_col: str = "doc_id",
                 lang_col: str = "lang") -> DataFrame:
    """Top-k most frequent tokens per language, deterministic ties.

    The naive worry — a window over (lang) shuffling the ENTIRE
    vocabulary into one partition per language — does not materialize
    on Spark >= 3.5: a rank filter directly on row_number() plans a
    WindowGroupLimit with a PARTIAL phase below the exchange, cutting
    every map partition's contribution to <= k rows per language before
    any data moves (verified by the plan-quality pin). A hand-rolled
    two-level bucket top-k was measured to only ADD an exchange and a
    second window over what the engine already does. Ties break on the
    word itself so the result is total-order deterministic and
    oracle-reproducible.
    """
    freq = token_frequencies(df, text_col, id_col, lang_col)
    final = Window.partitionBy("lang").orderBy(
        F.col("n_occ").desc(), F.col("word").asc()
    )
    return (
        freq.withColumn("rnk", F.row_number().over(final))
        .filter(F.col("rnk") <= k)
        .orderBy("lang", "rnk")
    )
