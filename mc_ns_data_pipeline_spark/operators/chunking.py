"""Document chunking: sliding token windows with overlap.

Context-window chunking is the step between a cleaned corpus and a
tokenized training shard: each document becomes overlapping
fixed-size token windows (overlap preserves cross-boundary context).
The reference has no corpus tooling; this follows the same
normalize/split contract as the rest of the text family
(functions/text.py) so chunk boundaries agree with token counts.

Scale shape: entirely MAP-ONLY — normalize, split, build the start
offsets row-locally, explode, slice. No shuffle is needed to chunk a
100 TB corpus; the only exchange in the declared query (x39) is the
final deterministic ORDER BY the correctness gate wants, which a real
export replaces with a partitioned sink (sinks/layout.write_shards).
The word array is bound to a real column BEFORE the explode
(lambda-CSE contract, see shingles_from_words), and the explode is
posexplode_outer so InferFiltersFromGenerate does not re-derive the
split at the scan — `sequence(0, greatest(n-1, 0), stride)` is never
empty, so the outer variant changes no rows, only the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.text import words


def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", divisor: int = 17) -> DataFrame:
    """Content-defined chunking: boundaries from a rolling hash, not
    fixed offsets (the FastCDC/rsync idea applied to word streams).

    A boundary opens before word i when the md5-derived hash of the
    bigram (w[i-1], w[i]) is ≡ 0 (mod divisor) — so an insertion early
    in a document only re-cuts the chunk it lands in, while fixed-size
    chunking (x39) shifts every later boundary. Chunk-level dedup over
    `chunk_hash` therefore survives edits; expected chunk length is
    `divisor` words.

    Scale shape: MAP-ONLY like chunk_documents — the word array, the
    boundary flags, the boundary-position array, and the per-chunk
    slices are all row-local array expressions; no shuffle to chunk
    the corpus, only the gate's final ORDER BY. The bigram hash reuses
    the 60-bit md5 scheme (operators/dedup.shingle_id) so the DuckDB
    twin reproduces boundaries exactly.
    """
    from mc_ns_data_pipeline_spark.operators.dedup import shingle_id

    base = df.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("ws")
    ).select("doc_id", "ws", F.size("ws").alias("n"))
    cuts = F.filter(
        F.sequence(F.lit(1), F.col("n") - 1),
        lambda i: shingle_id(
            F.concat_ws(" ", F.get("ws", i - 1), F.get("ws", i))
        ) % divisor
        == 0,
    )
    with_bounds = base.select(
        "doc_id", "ws", "n",
        F.when(F.col("n") > 1, cuts)
        .otherwise(F.array().cast("array<int>"))
        .alias("cuts"),
    ).select(
        "doc_id", "ws", "n",
        F.concat(F.array(F.lit(0)), F.col("cuts")).alias("starts"),
        F.concat(F.col("cuts"), F.array(F.col("n"))).alias("ends"),
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size("starts") - 1),
            lambda c: F.struct(
                c.alias("chunk_idx"),
                F.get("starts", c).alias("start"),
                (F.get("ends", c) - F.get("starts", c)).alias("chunk_len"),
                F.md5(
                    F.array_join(
                        F.slice(
                            "ws",
                            F.get("starts", c) + 1,
                            F.get("ends", c) - F.get("starts", c),
                        ),
                        " ",
                    )
                ).alias("chunk_hash"),
            ),
        )
    )
    return (
        with_bounds.select("doc_id", chunk.alias("ck"))
        .select(
            "doc_id",
            F.col("ck.chunk_idx").alias("chunk_idx"),
            F.col("ck.start").alias("start"),
            F.col("ck.chunk_len").alias("chunk_len"),
            F.col("ck.chunk_hash").alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_size: int = 64,
                    stride: int = 48) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, n_chunk_tokens, chunk_text) —
    one row per sliding window of `chunk_size` tokens every `stride`
    tokens (overlap = chunk_size - stride).
    """
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    ws = df.select(
        F.col(id_col).alias("doc_id"),
        words(F.col(text_col)).alias("ws"),
    ).select("doc_id", "ws", F.size("ws").alias("n_tokens"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_tokens") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = ws.select(
        "doc_id", "ws", "n_tokens",
        F.posexplode_outer(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice("ws", F.col("start") + 1, F.lit(chunk_size))
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
