"""Unigram language-model scoring: corpus-level perplexity proxy.

A standard training-data quality signal (used by CCNet-style pipelines):
train a unigram LM on the corpus itself, then score each document by its
average token surprisal — low-probability token soup (boilerplate,
garbled text, wrong-language fragments) scores high. The reference has
no corpus tooling; this follows the normalize/split token contract of
the rest of the text family (functions/text.py).

Scale shape (two passes, both shuffle-light):

1. TRAIN — one token-count aggregate. The explode is map-only (a
   document's tokens stay in its partition), partial aggregation
   collapses each partition to its distinct tokens before the single
   shuffle by token, and the top-V cut is a TakeOrderedAndProject
   (per-partition top-V, merged once) — never a global sort of the
   vocabulary. V is small by construction, so the trained model is
   broadcastable.
2. SCORE — map-side only, plus one row-per-document shuffle. Exploded
   tokens join the broadcast vocabulary with no exchange, and because a
   document's tokens are colocated, the per-document aggregate's
   partial phase already reduces to ONE row per document; the final
   shuffle moves |documents| rows, not |tokens|.

Exactness contract (oracle-twin discipline): ln() is NOT bit-identical
between the JVM and DuckDB (~3% of values differ by 1 ulp, measured),
so per-token surprisal is rounded to 6 dp and summed as DECIMAL(28,6)
— exact and order-independent — in both engines; the average is a
double division of identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.text import words


def train_unigram_lm(docs: DataFrame, text_col: str = "text",
                     vocab_size: int = 4096) -> DataFrame:
    """(token, cnt, surprisal) for the top-`vocab_size` corpus tokens.

    surprisal = round(-ln(cnt / N), 6) where N is the TOTAL corpus
    token count (including tokens that miss the vocabulary cut), so
    probabilities are honest and sum to <= 1 over the vocabulary.
    Ties at the cut break deterministically (cnt desc, token asc).
    """
    toks = docs.select(F.explode(words(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # Scalar N as a 1-row broadcast cross join: stays in the plan (no
    # driver collect), and Catalyst folds it into the projection.
    total = toks.agg(F.count("*").alias("n_total"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
    )
    return vocab.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.round(
            -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double")),
            6,
        ).alias("surprisal"),
    )


def score_documents(docs: DataFrame, lm: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document LM stats: (doc_id, n_tokens, n_oov, oov_ratio,
    sum_surprisal, avg_surprisal).

    avg_surprisal averages over IN-VOCABULARY tokens (null when a
    document has none); OOV pressure is reported separately as
    oov_ratio so the two signals stay orthogonal.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("token"),
    )
    scored = toks.join(F.broadcast(lm), "token", "left")
    in_vocab = F.col("surprisal").isNotNull()
    sum_dec = F.sum(
        F.when(in_vocab, F.col("surprisal").cast("decimal(28,6)"))
    )
    n_in = F.sum(F.when(in_vocab, F.lit(1)).otherwise(F.lit(0)))
    n_tokens = F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        n_tokens.alias("n_tokens"),
        (n_tokens - n_in).alias("n_oov"),
        ((n_tokens - n_in).cast("double") / n_tokens.cast("double")).alias(
            "oov_ratio"
        ),
        sum_dec.cast("double").alias("sum_surprisal"),
        F.when(
            n_in > 0, sum_dec.cast("double") / n_in.cast("double")
        ).alias("avg_surprisal"),
    )


def _doc_bigrams(docs: DataFrame, text_col: str,
                 id_col: str) -> DataFrame:
    """(doc_id, w1, w2) — adjacent token pairs per document.

    Built by zipping the token array with itself shifted by one
    (two slices + arrays_zip) — map-only, no positional self-join; a
    document's bigrams never leave its partition until the aggregate.
    """
    ws = words(F.col(text_col))
    n = F.size(ws)
    bg = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(ws, 1, n - 1).alias("w1"),
            F.slice(ws, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(bg).alias("b")
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(w1, w2, cnt, surprisal) for every corpus bigram, with
    surprisal = round(-ln(cnt(w1,w2) / ctx(w1)), 6) and ctx(w1) the
    bigram-start count — the maximum-likelihood conditional bigram
    model. Trained on the corpus itself (CCNet-style self-scoring), so
    scoring never sees an unseen bigram and needs no smoothing.

    Two one-shuffle aggregates (bigram counts, context counts) joined
    on w1; the same rounded-surprisal decimal contract as the unigram
    model (ln is not cross-engine bit-stable).
    """
    bg = _doc_bigrams(docs, text_col, id_col)
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx_cnt"))
    return counts.join(ctx, "w1").select(
        "w1",
        "w2",
        "cnt",
        F.round(
            -F.log(
                F.col("cnt").cast("double") / F.col("ctx_cnt").cast("double")
            ),
            6,
        ).alias("surprisal"),
    )


def score_documents_bigram(docs: DataFrame, lm: DataFrame,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Per-document bigram-LM stats: (doc_id, n_bigrams, sum_surprisal,
    avg_surprisal). Documents with fewer than two tokens score null.

    The join against the trained bigram table is keyed on (w1, w2);
    at corpus scale the model is usually NOT broadcastable (unlike the
    top-V unigram vocabulary), so this is an explicit shuffle join on
    the bigram key — both sides partial-aggregate first, and the
    per-document aggregate reduces map-side to one row per doc.
    """
    bg = _doc_bigrams(docs, text_col, id_col)
    scored = bg.join(lm.select("w1", "w2", "surprisal"), ["w1", "w2"])
    sum_dec = F.sum(F.col("surprisal").cast("decimal(28,6)"))
    n_bg = F.count(F.lit(1))
    per_doc = scored.groupBy("doc_id").agg(
        n_bg.alias("n_bigrams"),
        sum_dec.cast("double").alias("sum_surprisal"),
        (sum_dec.cast("double") / n_bg.cast("double")).alias(
            "avg_surprisal"
        ),
    )
    # Keep zero-bigram documents visible (null stats) so the signal
    # joins 1:1 back onto the corpus.
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        "sum_surprisal",
        "avg_surprisal",
    )
