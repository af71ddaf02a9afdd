"""BPE-style vocabulary induction: corpus-weighted symbol-pair counts.

The first (and each subsequent) round of byte-pair-encoding tokenizer
training is "count every adjacent symbol pair across the corpus,
weighted by word frequency, and take the most frequent pair as the next
merge" (Sennrich, Haddow, Birch 2016, ACL — "Neural Machine Translation
of Rare Words with Subword Units"). This operator is that counting
pass, expressed Spark-first; the reference has no tokenizer tooling
(its text handling is flat SQL), so this extends the engine's text
family (functions/text.py) the way operators/lm.py does for LM scoring.

Scale shape:

- Word counting is the classic one-shuffle aggregate: explode is
  map-only (a doc's tokens stay in its partition), partial aggregation
  collapses each partition to distinct words before the single shuffle
  by word.
- Pair generation runs over the DISTINCT-WORD table, not the corpus:
  every repeated occurrence of a word is already folded into `cnt`, so
  the per-round cost is O(|vocab| x avg_word_len) regardless of corpus
  size — this is exactly why classic BPE trainers operate on the word
  frequency table.
- The top-N cut is a TakeOrderedAndProject (per-partition top-N merged
  once), never a global sort of the pair table.

Pairs are CHARACTER pairs (round 1 of BPE); later rounds would re-run
over merged symbol sequences — the counting plan is identical, so round
1 is the representative query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.text import words


def bpe_pair_counts(docs: DataFrame, top_n: int = 20,
                    text_col: str = "text") -> DataFrame:
    """Top-N adjacent character pairs across the corpus, weighted by
    word frequency. Returns (pair, pair_cnt, n_words) where `pair_cnt`
    counts corpus occurrences (word count x positions in word) and
    `n_words` counts distinct words containing the pair. Ties break by
    pair string ascending.
    """
    word_counts = (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # One row per (word, position): pair = 2-char substring. transform
    # over a sequence keeps this a single map-side expression.
    pairs = word_counts.select(
        "word",
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("cnt").alias("pair_cnt"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(F.col("pair_cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )
