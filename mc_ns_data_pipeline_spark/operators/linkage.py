"""Entity-resolution blocking + verify (record linkage).

Classic two-stage ER: cheap BLOCKING keys cut the O(n²) pair space to
within-block candidates, then an edit-distance VERIFY pass scores only
the candidates. The reference deduplicates records by exact content
hash only (mastercontrol_pipeline/data_load_system/database/
operations.py's data_hash unique index); this adds the fuzzy-match
surface a real ingest pipeline needs for near-identical records.

Blocking design (the 100 TB part):

- The r3 10× stress run falsified the original (lang, length-band)
  blocking: real corpora have few languages and a narrow length
  distribution, so block population — and the within-block candidate
  quadratic — grows linearly with the corpus (measured 319M candidates
  / 246 s at ~sf1). Selectivity must come from the CONTENT the verify
  actually checks.
- The fix is PassJoin segment blocking (Li, Deng & Feng, ICDE 2011,
  "PASS-JOIN: a partition-based method for similarity joins"): with an
  edit threshold k, partition one side's prefix into k+1 segments — at
  most k edits can disturb at most k of them, so SOME segment survives
  verbatim in the other string, displaced by at most k positions (one
  per preceding indel). The partitioned side emits its k+1 segments at
  fixed positions; the probe side emits its substrings at every
  position within ±k of each segment slot; candidates are the
  EQUI-join on (lang, band, segment-slot, segment-text). Exactness-
  preserving by the pigeonhole above, and selective because 7-char
  segment equality is rare across non-near-identical text. The oracle
  stays the naive blocked all-pairs SQL, so the gate verifies the
  pruning loses nothing.
- The pigeonhole is only this sharp for small k, which is also the ER
  regime this operator owns (near-identical records, k=6 over a
  48-char prefix). The permissive-similarity regime belongs to the
  MinHash/SimHash family (x06/x14), whose signatures are built for it.
- Records with prefixes shorter than the template (rare) pair through
  a small length-keyed fallback block; a short-full pair needs
  |len difference| ≤ k, which the fallback enforces exactly.
- Verify is integer Levenshtein on the fixed-length prefix — exact,
  engine-reproducible, and run once per distinct candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAND_WIDTH = 400
PREFIX_LEN = 48
MAX_DIST = 6
# Segment-frequency cap (the x07 max_shingle_df pattern): templated
# corpora make some 7-char openings hot, and a hot segment's candidate
# contribution is df² with ~zero precision. Slots whose partitioned-side
# df exceeds the cap are dropped from candidate generation; a true pair
# is missed only if EVERY slot that survives its edits is hot — with
# k+1 = 7 slots that needs pervasive templating, the same recall trade
# x07 documents.
#
# The default cap is "auto": max(MAX_SEGMENT_DF_FLOOR, n_docs div
# AUTO_CAP_DIVISOR), with the corpus count entering the plan as a
# LITERAL from one lightweight driver-side count (the x59 k=n/1000
# pattern — an in-plan 1-row cross join would compile to the
# BroadcastNestedLoopJoin the plan pins forbid). Segment df grows
# roughly linearly with corpus size, so a fixed cap that is inactive
# at sf0.1 would silently start dropping true near-pairs at modestly
# larger data (ADVICE r3). With the auto cap the "inactive at gate
# scale" property is structural: uniform-density slots stay under
# n/AUTO_CAP_DIVISOR at every scale, and only genuinely templated
# openings (density > 0.5% of the corpus on one 7-char slot) are
# dropped. `hot_segment_slots` makes whatever IS dropped observable
# (slot, df, cap) instead of silent. Measured at 10x (BASELINE.md r4
# recall study): 12 hot slots dropped, pair recall 1.0 (pigeonhole
# redundancy — a pair is lost only if ALL its surviving slots are
# hot), runtime halved vs uncapped.
MAX_SEGMENT_DF_FLOOR = 300
AUTO_CAP_DIVISOR = 200
# Backwards-compatible alias (pre-r4 name for the fixed cap).
MAX_SEGMENT_DF = MAX_SEGMENT_DF_FLOOR


def _segments(prefix_len: int, n_seg: int) -> list[tuple[int, int]]:
    """Even partition of [1, prefix_len] into (1-based pos, length)."""
    base_len, rem = divmod(prefix_len, n_seg)
    out, pos = [], 1
    for i in range(n_seg):
        ln = base_len + (1 if i < rem else 0)
        out.append((pos, ln))
        pos += ln
    return out


def _template_rows(docs: DataFrame, k: int, band_width: int,
                   prefix_len: int):
    """(base, rel, a_rows): the prefix relation, its banded copy, and
    the partitioned (template) side's exploded segment slots — shared
    by candidate generation and hot-slot observability."""
    segs = _segments(prefix_len, k + 1)
    half = band_width // 2
    base = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.substring("text", 1, prefix_len).alias("pfx"),
    ).withColumn("plen", F.length("pfx"))
    rel = base.select(
        "doc_id", "lang", "pfx", "plen",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"n_chars div {band_width}"),
                    F.expr(f"(n_chars + {half}) div {band_width}"),
                )
            )
        ).alias("band"),
    )

    # partitioned side: full-length prefixes emit their k+1 segments
    seg_structs = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.substring("pfx", pos, ln).alias("seg"),
        )
        for i, (pos, ln) in enumerate(segs)
    ])
    a_rows = (
        rel.filter(F.col("plen") == prefix_len)
        .select(
            F.col("doc_id").alias("src"), "lang", "band",
            F.explode(seg_structs).alias("t"),
        )
        .select("src", "lang", "band", "t.i", "t.seg")
    )
    return base, rel, a_rows


def _hot_slots(a_rows: DataFrame, base: DataFrame,
               max_segment_df) -> DataFrame:
    """Slots whose template-side df exceeds the cap:
    (lang, band, i, seg, df, cap). `max_segment_df` is an int, or
    "auto" for max(MAX_SEGMENT_DF_FLOOR, n_docs div AUTO_CAP_DIVISOR)
    — the corpus count becomes a plan literal via one lightweight
    driver-side count (see module doc for why not an in-plan join)."""
    counts = a_rows.groupBy("lang", "band", "i", "seg").agg(
        F.count(F.lit(1)).alias("df")
    )
    if max_segment_df == "auto":
        cap = max(MAX_SEGMENT_DF_FLOOR,
                  base.count() // AUTO_CAP_DIVISOR)
    else:
        cap = int(max_segment_df)
    return counts.withColumn("cap", F.lit(cap)).filter(
        F.col("df") > F.col("cap")
    )


def hot_segment_slots(docs: DataFrame, max_dist: int = MAX_DIST,
                      band_width: int = BAND_WIDTH,
                      prefix_len: int = PREFIX_LEN,
                      max_segment_df="auto") -> DataFrame:
    """Observability for the recall knob (ADVICE r3): the exact slots
    `blocked_near_pairs` drops under the given cap, with their df and
    the effective cap. Empty result == the cap is inactive and the
    blocking is provably lossless at this corpus; non-empty rows tell
    an operator precisely where templating is eating recall."""
    base, _rel, a_rows = _template_rows(docs, max_dist, band_width,
                                        prefix_len)
    return _hot_slots(a_rows, base, max_segment_df)


def blocked_near_pairs(docs: DataFrame, max_dist: int = MAX_DIST,
                       band_width: int = BAND_WIDTH,
                       prefix_len: int = PREFIX_LEN,
                       max_segment_df="auto") -> DataFrame:
    """(doc_a, doc_b, lang, lev_dist) for same-language candidate
    pairs within `max_dist` prefix edit distance (see module doc for
    the PassJoin blocking argument).

    `max_segment_df`: "auto" (default — corpus-scaled cap, see module
    doc), an int for a fixed cap, or None to disable capping.
    """
    k = max_dist
    segs = _segments(prefix_len, k + 1)
    base, rel, a_rows = _template_rows(docs, k, band_width, prefix_len)

    # probe side: every doc emits its substrings at positions within
    # ±k of each segment slot (clipped to the string — a segment's
    # surviving image is a real substring, so valid positions suffice).
    # The two-sided indel bound tightens the window per row: a shift s
    # needs >= |s| indels BEFORE the segment and >= |d - s| AFTER it
    # (d = probe length - template length, disjoint edit sets), so
    # probes with |s| + |d - s| > k cannot witness a pair — for equal
    # lengths this halves the window to ±k/2.
    probe_specs = [
        (i, p, ln, p - pos)
        for i, (pos, ln) in enumerate(segs)
        for p in range(max(1, pos - k), pos + k + 1)
    ]
    probe_structs = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.lit(p).alias("p"),
            F.lit(ln).alias("l"),
            F.lit(s).alias("s"),
        )
        for i, p, ln, s in probe_specs
    ])
    d = F.col("plen") - F.lit(prefix_len)
    b_rows = (
        rel.select(
            F.col("doc_id").alias("dst"), "lang", "band", "pfx", "plen",
            F.explode(probe_structs).alias("t"),
        )
        .filter(
            F.abs(F.col("t.s")) + F.abs(d - F.col("t.s")) <= F.lit(k)
        )
        .select(
            "dst", "lang", "band", F.col("t.i").alias("i"),
            F.expr("substring(pfx, t.p, t.l)").alias("seg"),
            F.col("t.l").alias("_l"),
        )
        .filter(F.length("seg") == F.col("_l"))
        .drop("_l")
    )
    if max_segment_df is not None:
        hot = _hot_slots(a_rows, base, max_segment_df).select(
            "lang", "band", "i", "seg"
        )
        a_rows = a_rows.join(
            F.broadcast(hot), ["lang", "band", "i", "seg"], "left_anti"
        )
        b_rows = b_rows.join(
            F.broadcast(hot), ["lang", "band", "i", "seg"], "left_anti"
        )
    pass_cand = (
        a_rows.join(b_rows, ["lang", "band", "i", "seg"])
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("doc_a"),
            F.greatest("src", "dst").alias("doc_b"),
            "lang",
        )
    )

    # fallback: pairs touching a short prefix (plen < template) block
    # on (lang, band) with the |len diff| <= k necessary condition
    shorts = rel.filter(F.col("plen") < prefix_len).select(
        F.col("doc_id").alias("src"), "lang", "band",
        F.col("plen").alias("plen_s"),
    )
    others = rel.select(
        F.col("doc_id").alias("dst"), "lang", "band",
        F.col("plen").alias("plen_o"),
    )
    short_cand = (
        shorts.join(others, ["lang", "band"])
        .filter(F.col("src") != F.col("dst"))
        .filter(F.abs(F.col("plen_s") - F.col("plen_o")) <= k)
        .select(
            F.least("src", "dst").alias("doc_a"),
            F.greatest("src", "dst").alias("doc_b"),
            "lang",
        )
    )

    cand = pass_cand.unionByName(short_cand).distinct()
    pa = base.select(
        F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pfx_a")
    )
    pb = base.select(
        F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pfx_b")
    )
    # threshold-bounded Levenshtein (Spark >= 3.5): the JVM runs the
    # Ukkonen banded DP — O(k·n) cells instead of O(n²) — and bails out
    # the moment the band minimum exceeds k, returning -1. Candidates
    # are overwhelmingly true negatives (r8 profile: 216k candidates →
    # 79 pairs at sf0.1), so almost every evaluation takes the early
    # exit; within the bound the distance is exact, so results are
    # byte-identical to the unbounded filter (measured 6.4 s → 3.0 s
    # full-operator, BASELINE.md round-8).
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn(
            "lev_dist",
            F.levenshtein(F.col("pfx_a"), F.col("pfx_b"), max_dist),
        )
        .filter(F.col("lev_dist") >= 0)
        .select("doc_a", "doc_b", "lang", "lev_dist")
    )
