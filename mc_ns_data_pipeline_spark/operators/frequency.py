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


# Count-min sketch geometry: depth x width counters, one md5-derived
# hash row per depth. Estimate error bound: eps = e/width of the total
# token mass, with probability 1 - (1/2)^depth; estimates NEVER
# underestimate (Cormode & Muthukrishnan 2005, J. Algorithms 55(1)).
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(token: Column, depth: int, width: int) -> Column:
    """Bucket of `token` in hash row `depth`: 60-bit md5 prefix mod width.

    Oracle twin: ('0x' || substr(md5(word || '|' || d), 1, 15))::BIGINT
    % width — md5-based so both engines bucket identically.
    """
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(token, F.lit(f"|{depth}"))), 1, 15
            ),
            16, 10,
        ).cast("long")
        % width
    )


def cms_sketch(df: DataFrame, text_col: str = "text",
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(depth, bucket, n): count-min sketch of the corpus token stream.

    Scale shape: the sketch IS the aggregation state — depth x width
    counters regardless of corpus size, and the groupBy's map-side
    partial aggregation is exactly the textbook sketch merge (counters
    add), so each partition ships at most depth x width rows into one
    shuffle. Token counts pre-aggregate ROW-LOCALLY first (distinct
    words + in-row occurrence counts, as in `token_frequencies`), so
    the exploded stream is bounded by per-doc vocabulary, and each
    (word, count) contributes `depth` bucket increments.
    """
    bound = df.select(words(F.col(text_col)).alias("_ws"))
    per_doc = bound.select(
        F.explode(
            F.transform(
                F.array_distinct("_ws"),
                lambda w: F.struct(
                    w.alias("word"),
                    F.size(
                        F.filter("_ws", lambda x: x == w)
                    ).alias("n_in_doc"),
                ),
            )
        ).alias("wc")
    )
    rows = per_doc.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("depth"),
                    _cms_bucket(F.col("wc.word"), d, width).alias("bucket"),
                    F.col("wc.n_in_doc").alias("n_inc"),
                )
                for d in range(depth)
            ])
        ).alias("cell")
    )
    return rows.groupBy(
        F.col("cell.depth").alias("depth"),
        F.col("cell.bucket").alias("bucket"),
    ).agg(F.sum("cell.n_inc").cast("long").alias("n"))


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 word_col: str = "word",
                 depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-frequency estimates: min over hash rows of the probe's
    bucket counters. The sketch is depth x width rows — broadcast — so
    probing any number of tokens is a map-side join plus a tiny
    aggregate; a missing bucket reads as 0."""
    probed = probes.select(
        F.col(word_col).alias("word"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("depth"),
                    _cms_bucket(F.col(word_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("pb"),
    ).select("word", "pb.depth", "pb.bucket")
    joined = probed.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy("word").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est_n")
    )
