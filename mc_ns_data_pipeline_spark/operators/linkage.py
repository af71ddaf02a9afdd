"""Entity-resolution blocking + verify (record linkage).

Classic two-stage ER: cheap BLOCKING keys cut the O(n²) pair space to
within-block candidates, then an edit-distance VERIFY pass scores only
the candidates. The reference deduplicates records by exact content
hash only (mastercontrol_pipeline/data_load_system/database/
operations.py's data_hash unique index); this adds the fuzzy-match
surface a real ingest pipeline needs for near-identical records.

Blocking design (the 100 TB part):

- Pair generation is an EQUI-join on (lang, length-band) — never a
  cartesian. Block size is the scale knob: bands bound the join's
  per-key fan-out the way LSH bands do in dedup.minhash_neardup.
- Length-banding alone misses near-pairs that straddle a band
  boundary, so each record probes TWO overlapping bands (its own and
  its +half-width neighbor) — the standard multi-probe fix. The probe
  explode is map-only (2 rows per record); candidate pairs seen via
  both bands are deduplicated BEFORE the expensive verify, so
  Levenshtein runs once per candidate.
- Verify is integer Levenshtein on a fixed-length prefix — exact and
  engine-reproducible (no float similarity), bounded cost per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAND_WIDTH = 400
PREFIX_LEN = 48


def blocked_near_pairs(docs: DataFrame, max_dist: int = 25,
                       band_width: int = BAND_WIDTH,
                       prefix_len: int = PREFIX_LEN) -> DataFrame:
    """(doc_a, doc_b, lang, lev_dist) for same-language candidate
    pairs within `max_dist` prefix edit distance."""
    half = band_width // 2
    base = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.substring("text", 1, prefix_len).alias("pfx"),
    )
    probes = base.select(
        "doc_id",
        "lang",
        "pfx",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"n_chars div {band_width}"),
                    F.expr(f"(n_chars + {half}) div {band_width}"),
                )
            )
        ).alias("band"),
    )
    a = probes.select(
        F.col("doc_id").alias("doc_a"), "lang", "band",
        F.col("pfx").alias("pfx_a"),
    )
    b = probes.select(
        F.col("doc_id").alias("doc_b"), "lang", "band",
        F.col("pfx").alias("pfx_b"),
    )
    cand = (
        a.join(b, ["lang", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        # Dedup pairs discovered via both probe bands BEFORE the
        # verify, so each candidate pays Levenshtein exactly once.
        .select("doc_a", "doc_b", "lang", "pfx_a", "pfx_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "lev_dist", F.levenshtein(F.col("pfx_a"), F.col("pfx_b"))
        )
        .filter(F.col("lev_dist") <= max_dist)
        .select("doc_a", "doc_b", "lang", "lev_dist")
    )
