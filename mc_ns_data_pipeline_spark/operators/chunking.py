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
