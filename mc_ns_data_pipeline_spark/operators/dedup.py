"""Document deduplication operators: exact, MinHash+LSH, n-gram Jaccard,
SimHash — the scale path for training-data pipelines.

Design for 100 TB:
  * Everything is explode -> hash-partition -> aggregate; no driver-side
    loops, no O(n^2) all-pairs stage. Candidate generation is always a
    *bucket equi-join* (LSH band key / shared shingle / simhash block),
    so the shuffle is keyed and AQE's skew handling applies.
  * Hashes are md5-based (not xxhash) so an external SQL oracle can
    reproduce signatures byte-for-byte.
  * Known skew hazard: very frequent shingles create hot buckets in the
    inverted-index join. `max_shingle_df` drops shingles whose document
    frequency exceeds the cap — standard frequent-token filtering; at
    the default None it is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.text import (
    fingerprint_full,
    ngrams_or_empty,
    norm_text,
    shingles_from_words,
    words,
)

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# Universal-hash family over a md5-derived base integer:
#   sig_s(x) = (A[s] * (x % P) + B[s]) % P,  P = 2^31 - 1 (Mersenne)
# One md5 per shingle (not one per seed) — 16× fewer digests on the hot
# path; products stay < 2^62 so int64 arithmetic is exact and portable
# to any SQL oracle.
MERSENNE_P = 2_147_483_647
HASH_A = tuple((1_103_515_245 * (s + 1)) % MERSENNE_P for s in range(N_HASHES))
HASH_B = tuple((12_345 * (s + 1) + 7) % MERSENNE_P for s in range(N_HASHES))


def _materialize(df: DataFrame) -> DataFrame:
    """Compute a relation once and cut its lineage (localCheckpoint).

    Two jobs in one: (a) self-joins and multi-consumer plans physically
    reuse the computed blocks instead of re-running the (expensive)
    shingle projection per consumer; (b) it is an optimizer fence — the
    join's inferred `isnotnull`/`size>0` predicates otherwise push down
    THROUGH the explode and collapse into the lambda-bearing projection,
    where Catalyst does no subexpression elimination, re-evaluating the
    full O(len^2) gram expression up to 3x per row (measured ~10x
    slowdown). Blocks live on executors (MEMORY_AND_DISK, spill-safe);
    on a real cluster swap for reliable checkpoint / an explicit parquet
    stage if executor loss matters.
    """
    return df.localCheckpoint(eager=False)


def shingle_id(c: Column) -> Column:
    """60-bit integer shingle id: first 15 hex chars of md5.

    Oracle twin: ('0x' || substr(md5(s),1,15))::BIGINT. Collision odds at
    2^60 are negligible for any realistic corpus partition.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _seed_hash(seed: int, base: Column) -> Column:
    """Universal hash of a shingle-id for one MinHash seed (exact int64)."""
    return (
        F.lit(HASH_A[seed]) * (base % F.lit(MERSENNE_P)) + F.lit(HASH_B[seed])
    ) % F.lit(MERSENNE_P)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by normalized-text fingerprint.

    Returns one row per input doc with its cluster fingerprint, the
    cluster's canonical (min) id, and an is_duplicate flag. One shuffle
    (window by fingerprint).
    """
    from pyspark.sql import Window

    fp = fingerprint_full(F.col(text_col))
    w = Window.partitionBy("fp")
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


def doc_shingle_sets(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, sh_ids array<long>) — one row per doc, map-only.

    A document's shingle set depends only on that document, so it is
    computed entirely within the row (transform + array_distinct) — no
    explode, no shuffle. At 100 TB this is the difference between a
    map-only stage and a corpus-wide exchange. The word array is bound
    to a real column before the gram transform (lambda-CSE hazard — see
    `shingles_from_words`).
    """
    bound = df.select(F.col(id_col), words(F.col(text_col)).alias("_ws"))
    grams = shingles_from_words(F.col("_ws"), k)
    return bound.select(
        F.col(id_col),
        F.array_distinct(F.transform(grams, shingle_id)).alias("sh_ids"),
    )


def doc_shingles(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct (id, shingle-id) pairs — the inverted-index base relation.

    Dedup happens row-locally (array_distinct) before the explode, so no
    corpus-wide distinct shuffle is ever needed; rows carry 8-byte keys.

    explode_outer, not explode: a plain explode makes Catalyst infer
    `size(sh_ids)>0 AND isnotnull(sh_ids)` BELOW the Generate, which
    re-evaluates the whole gram expression against raw text per check
    (measured 10.2 s vs 1.3 s at sf0.1 for the same relation). sh_ids
    is never empty (short docs get the whole-text fallback shingle), so
    outer semantics only admits NULL rows for NULL text — filtered
    right above, where the predicate tests the generated column instead.
    """
    return doc_shingle_sets(df, text_col, id_col, k).select(
        F.col(id_col), F.explode_outer("sh_ids").alias("sh_id")
    ).filter(F.col("sh_id").isNotNull())


def minhash_signatures(sets: DataFrame, id_col: str = "doc_id",
                       n_hashes: int = N_HASHES) -> DataFrame:
    """MinHash signature per doc from its row-local shingle set.

    Each seed's signature is array_min over the universal-hashed set —
    a pure projection; the whole signature stage is map-only (the
    reference-scale alternative, explode + groupBy, shuffles the entire
    shingle relation just to come back to one row per doc).
    """
    def seeded(s: int):
        return lambda x: _seed_hash(s, x)

    mins = [
        F.array_min(F.transform(F.col("sh_ids"), seeded(s))).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return sets.select(F.col(id_col), *mins)


def lsh_band_keys(sig: DataFrame, id_col: str = "doc_id",
                  n_bands: int = N_BANDS,
                  rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Long-format (id, band_id, band_key): band key = md5 of the band's
    signature slice. Banding trades recall/precision (b=4, r=4 targets
    jaccard ≈ 0.5+)."""
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return (
        sig.select(F.col(id_col), F.explode(F.array(*bands)).alias("band"))
        .select(id_col, "band.band_id", "band.band_key")
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH bucket.

    Bucket equi-join on (band_id, band_key) — the 100 TB-safe shape: work
    is proportional to bucket sizes, never all-pairs.
    """
    a = bands.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_key"
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_key"
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, sets: DataFrame,
                   id_col: str = "doc_id",
                   threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard for candidate pairs via per-doc shingle-set arrays.

    `sets` is the map-only (id, sh_ids) relation; rows are bounded by
    per-document shingle count, and with AQE the small candidate-pair
    side broadcasts at runtime.
    """
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("sh_ids").alias("ss_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("sh_ids").alias("ss_b"))
    inter = F.size(F.array_intersect("ss_a", "ss_b")).cast("double")
    union = (F.size("ss_a") + F.size("ss_b")).cast("double") - inter
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.5,
                        sort: bool = True) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> sign -> band ->
    bucket-join -> exact-verify. Shingling and signing are map-only;
    the only shuffles are the band bucket-join and the pair verify.
    The shingle-set relation is materialized once and shared by the
    signature and verify stages (see _materialize).

    `sort=False` skips the deterministic output ordering — pass it when
    the pairs feed another operator (clustering, accounting): a global
    orderBy is a range sort whose boundary-sampling pass executes the
    band-join + verify child an extra time, and every downstream
    join/aggregate destroys the order anyway."""
    sets = _materialize(doc_shingle_sets(df, text_col, id_col))
    sig = minhash_signatures(sets, id_col)
    pairs = lsh_candidate_pairs(lsh_band_keys(sig, id_col), id_col)
    verified = jaccard_verify(pairs, sets, id_col, threshold)
    if not sort:
        return verified
    # Materialize before the deterministic sort: the range sort's
    # boundary-sampling pass would otherwise run the band-join + verify
    # a second time (same density-safe shape as ngram_jaccard_pairs).
    return _materialize(verified).orderBy("doc_a", "doc_b")


def _shared_shingle_counts(df: DataFrame, text_col: str, id_col: str,
                           k: int = 3,
                           max_shingle_df: int | None = None) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b, shared) for every pair sharing >= 1
    shingle — the inverted-index candidate relation both exact-Jaccard
    and containment are a projection over.

    Candidate pairs come from the shared-shingle equi-join, so
    complexity follows posting-list sizes. `max_shingle_df` caps hot
    postings (frequent-shingle filtering) to keep the join skew-free at
    corpus scale; None = exact. Per-doc set sizes ride along as an int
    column through the join (array length — map-only), so no sizes
    relation and no post-join enrichment joins are needed.

    Cap semantics (round-4 fix, measured on the 10x corpus): with a
    cap, sizes are RECOUNTED over the surviving shingles, so the
    result is the EXACT Jaccard over the df-filtered shingle universe
    — frequent-shingle removal acts like stopword removal. The naive
    pre-fix behavior (full-set sizes, capped shared counts) biased
    every estimate toward zero: at max_shingle_df=50 on the templated
    10x corpus (mean shingle df ~100) it missed ALL 250,600 true pairs
    (recall 0.0); the filtered-universe semantics keeps recall high at
    the same cost (see BASELINE.md round-4 recall study).
    """
    sets = doc_shingle_sets(df, text_col, id_col, k=k)
    # explode_outer, not explode: a plain explode makes Catalyst infer a
    # `size(sh_ids)>0 AND isnotnull(sh_ids)` filter below the Generate,
    # which re-evaluates the whole gram expression on raw text (twice).
    # sh_ids is never empty, so outer semantics only admits NULL rows
    # for NULL text — dropped right after the checkpoint, where the
    # filter runs against materialized longs instead.
    postings = _materialize(
        sets.select(
            F.col(id_col),
            F.size("sh_ids").alias("n"),
            F.explode_outer("sh_ids").alias("sh_id"),
        )
    ).filter(F.col("sh_id").isNotNull())
    if max_shingle_df is not None:
        small = (
            postings.groupBy("sh_id").count()
            .filter(F.col("count") <= max_shingle_df)
            .select("sh_id")
        )
        postings = postings.join(small, "sh_id")
        # Exact-on-filtered-universe: recount per-doc sizes over the
        # SURVIVING shingles. Keeping the full-set sizes here would
        # bias every Jaccard toward zero as the cap bites (measured:
        # recall 0.0 at cap=50 on the 10x corpus — BASELINE.md r4).
        surv = postings.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("_n_surv")
        )
        postings = (
            postings.drop("n")
            .join(surv, id_col)
            .withColumnRenamed("_n_surv", "n")
        )
    a = postings.select(
        F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"), "sh_id"
    )
    b = postings.select(
        F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"), "sh_id"
    )
    return (
        a.join(b, "sh_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.4,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted-index join — a
    threshold filter over `_shared_shingle_counts`, materialized before
    the deterministic orderBy. The materialize matters twice over: a
    range sort's boundary-sampling pass would otherwise execute the
    whole inverted-index join a second time, and the pair volume tracks
    corpus duplicate DENSITY (not size), so a single-partition sort —
    the other way to avoid the double execution — collapses on
    duplicate-heavy corpora (measured at 10x: repartition(1) ~21 s vs
    checkpoint+orderBy ~10 s; at 100 TB the parallel sort is the only
    safe shape).
    """
    shared = _shared_shingle_counts(
        df, text_col, id_col, k=3, max_shingle_df=max_shingle_df
    )
    jac = F.col("shared").cast("double") / (
        (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
    )
    return _materialize(
        shared
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    ).orderBy("doc_a", "doc_b")


def decontaminate_against(df: DataFrame, bench_filter: Column,
                          text_col: str = "text", id_col: str = "doc_id",
                          k: int = 4) -> DataFrame:
    """Benchmark decontamination: flag corpus docs that share any word
    k-gram with a benchmark/eval set (the standard n-gram-overlap
    contamination check used when assembling training corpora).

    `bench_filter` selects the benchmark rows; everything else is the
    corpus. Returns one row per corpus doc: its k-gram count, how many
    of those k-grams appear anywhere in the benchmark, the contaminated
    fraction, and a flag.

    Scale shape: the benchmark n-gram set is tiny relative to the corpus
    (eval suites are ~1e6 n-grams vs ~1e12 corpus n-grams), so it is
    distinct-ed and BROADCAST; corpus postings then tag hits map-side
    via a broadcast LEFT join and the whole result needs exactly ONE
    shuffle (the per-doc count groupBy, partial-aggregated map-side).
    Zero-overlap docs survive because the left join keeps every posting
    and every doc has >= 1 shingle (short-doc fallback in
    shingles_from_words).
    """
    sets = doc_shingle_sets(df, text_col, id_col, k=k)
    bench_ngrams = (
        sets.filter(bench_filter)
        # explode_outer: plain explode would infer `size(sh_ids)>0` and
        # push the full gram lambda into the benchmark scan filter.
        .select(F.explode_outer("sh_ids").alias("sh_id"))
        .filter(F.col("sh_id").isNotNull())
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # Same explode_outer + materialize fence as ngram_jaccard_pairs:
    # a plain explode would re-evaluate the gram lambda at the scan via
    # InferFiltersFromGenerate pushdown.
    postings = _materialize(
        sets.filter(~bench_filter)
        .select(
            F.col(id_col),
            F.size("sh_ids").alias("n_ngrams"),
            F.explode_outer("sh_ids").alias("sh_id"),
        )
    ).filter(F.col("sh_id").isNotNull())
    n_hit = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        postings.join(F.broadcast(bench_ngrams), "sh_id", "left")
        .groupBy(id_col, "n_ngrams")
        .agg(n_hit.alias("n_contaminated"))
        .select(
            F.col(id_col),
            F.col("n_ngrams"),
            F.col("n_contaminated"),
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("contamination_frac"),
            (F.col("n_contaminated") > 0).alias("is_contaminated"),
        )
        .orderBy(id_col)
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document as a '0'/'1' bit string (bit 0 first).

    Per-word hash = md5(word); bit b of the hash is extracted from hex
    nibble b//4 (bit b%4, LSB-first) — pure string/arithmetic ops an SQL
    oracle can mirror. Word multiplicity is the weight.

    Entirely map-only: a document's signature depends only on its own
    words, so per-word hashes (one md5 pass) and the bit-sums are
    computed inside the row — no explode, no shuffle (the naive shape
    shuffles every word in the corpus).

    All `bits` sums live in ONE aggregate with an array<int> accumulator
    (zip_with add of a per-word ±1 vector) rather than `bits` separate
    aggregate expressions: 64 large near-identical trees cost ~7 s of
    one-time plan/codegen work per query shape and ~10x steady-state
    throughput (measured); one compact lambda costs neither.
    """
    hashed = df.select(
        F.col(id_col),
        F.transform(
            F.split(norm_text(F.col(text_col)), " "), F.md5
        ).alias("_hs"),
    )

    def contrib(h: Column) -> Column:
        # hex digest -> nibble values -> LSB-first ±1 bit contributions
        nibs = F.transform(
            F.sequence(F.lit(1), F.lit(bits // 4)),
            lambda i: F.instr(
                F.lit("0123456789abcdef"), F.substring(h, i, F.lit(1))
            ) - 1,
        )
        return F.flatten(
            F.transform(
                nibs,
                lambda nib: F.array(*[
                    F.shiftright(nib, j).bitwiseAND(F.lit(1)) * 2 - 1
                    for j in range(4)
                ]),
            )
        )

    sums = F.aggregate(
        F.col("_hs"),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, contrib(h), lambda x, y: x + y),
    )
    agg = hashed.select(F.col(id_col), sums.alias("_s"))
    bitchars = [
        F.when(F.element_at(F.col("_s"), b + 1) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for b in range(bits)
    ]
    return agg.select(F.col(id_col), F.concat(*bitchars).alias("simhash"))


def simhash_near_pairs(sig: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3, n_blocks: int = 4) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit string into n_blocks blocks; any
    pair within distance (n_blocks-1) must agree on >= 1 whole block, so
    candidates come from a block equi-join (scale-safe), then exact
    Hamming verifies.
    """
    bits = 64
    block = bits // n_blocks
    # Two consumers of the signature relation (band sides + verify sides)
    # -> compute once. Hamming is bit_count(xor) over two 32-bit halves
    # (conv base-2) — pure codegen'd integer ops, ~100x cheaper per pair
    # than the per-character compare it replaces.
    halves = _materialize(
        sig.select(
            F.col(id_col),
            F.col("simhash"),
            F.conv(F.substring("simhash", 1, 32), 2, 10)
            .cast("long")
            .alias("h_hi"),
            F.conv(F.substring("simhash", 33, 32), 2, 10)
            .cast("long")
            .alias("h_lo"),
        )
    )
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("block_id"),
            F.substring("simhash", i * block + 1, block).alias("block_key"),
        )
        for i in range(n_blocks)
    ])
    long_ = halves.select(
        F.col(id_col), F.explode(blocks).alias("b")
    ).select(id_col, "b.block_id", "b.block_key")
    a = long_.select(F.col(id_col).alias("doc_a"), "block_id", "block_key")
    b = long_.select(F.col(id_col).alias("doc_b"), "block_id", "block_key")
    cand = (
        a.join(b, ["block_id", "block_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = halves.select(
        F.col(id_col).alias("doc_a"),
        F.col("h_hi").alias("hi_a"), F.col("h_lo").alias("lo_a"),
    )
    sb = halves.select(
        F.col(id_col).alias("doc_b"),
        F.col("h_hi").alias("hi_b"), F.col("h_lo").alias("lo_b"),
    )
    hamming = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 20,
                       sort: bool = True) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, cluster_id),
    cluster_id = min doc id reachable through the pair graph.

    The canonical last step of a dedup pipeline — near-dup PAIRS must
    become GROUPS before one representative per group can be kept.
    Iterative min-label propagation: each round every node adopts the
    min label among itself and its neighbors; converges in O(graph
    diameter) rounds (near-dup clusters are near-cliques, so 2-3 rounds
    in practice). Each round is one keyed join + aggregate;
    localCheckpoint truncates the growing lineage (the classic iterative
    -algorithm-on-Spark requirement) and bounds replanning cost. Early
    exit on a converged round; `max_iter` caps pathological chains.
    """
    # Materialize the pair relation BEFORE the symmetric union: both
    # union branches otherwise re-run the (expensive) upstream pair
    # pipeline — e.g. a full MinHash band-join — once each.
    edges = _materialize(pairs.select("doc_a", "doc_b"))
    sym = edges.union(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("doc_a").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym["doc_b"] == labels["id"])
            .groupBy("doc_a")
            .agg(F.min("label").alias("nb_min"))
        )
        # Carry the convergence flag in the same relation: the eager
        # checkpoint below materializes it, so the `changed` probe is a
        # scan of cached blocks — not an extra join+shuffle per round.
        stepped = (
            labels.join(nb_min, labels["id"] == nb_min["doc_a"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("label"), F.coalesce("nb_min", F.col("label"))
                ).alias("label"),
                (
                    F.coalesce("nb_min", F.col("label")) < F.col("label")
                ).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("chg")).limit(1).count()
        labels = stepped.drop("chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        # Silently returning intermediate labels would disagree with
        # the transitive-closure contract (and the recursive-CTE
        # oracle): a component whose diameter exceeds the cap keeps
        # stale labels at its far end. Near-dup clusters are
        # near-cliques (diameter 2-3), so hitting this means the pair
        # graph is pathological — fail loudly, don't mislabel.
        raise RuntimeError(
            "duplicate_clusters: min-label propagation did not "
            f"converge within max_iter={max_iter} rounds (a component's "
            "diameter exceeds the cap); raise max_iter"
        )
    out = labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    # sort=False for operator-to-operator use: the labels are already
    # checkpointed, but the range sort still adds a sampling pass and a
    # shuffle that the consuming join immediately destroys.
    return out.orderBy("doc_id") if sort else out


def line_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               words_per_line: int = 3, max_line_df: int = 3) -> DataFrame:
    """Corpus-level repeated-line removal (the C4/CCNet cleaning step):
    drop every line that occurs in more than `max_line_df` distinct
    documents — boilerplate, navigation chrome, license banners — and
    rebuild each document from its surviving lines in order.

    "Lines" are fixed `words_per_line`-word segments (the final segment
    keeps the tail even when short): real web text would split on
    newlines, but the fixture corpus carries no line structure, and the
    fixed resegmentation exercises identical semantics — a global
    df-count per unit, a threshold drop, an ordered rebuild — with a
    deterministic unit both engines derive identically.

    Shape at scale: this op is inherently one corpus-wide shuffle on
    the line hash (that IS the computation — no locality can avoid
    counting a line's document frequency globally), plus one shuffle by
    doc id to reassemble. The df aggregate partial-aggregates map-side
    on (hash, doc) after an in-partition distinct, the join back to
    lines reuses the aggregate's hash partitioning on one side, and
    only (pos, line, df) rows move — never whole documents. Line
    identity is md5(trim(line)) so the DuckDB oracle reproduces it.

    Ref parity: the reference has no corpus-level cleaning; this is one
    of the training-data extensions (same family as x05-x07).
    """
    k = words_per_line
    # Bind the split array to a real column BEFORE referencing it from
    # the segment lambda (lambda-CSE contract, shingles_from_words): an
    # unbound `split(text)` inside the transform re-splits the full
    # text once per segment — O(W^2) per document.
    bound = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_ws")
    )
    ws = F.col("_ws")
    n_seg = F.ceil(F.size(ws) / F.lit(k)).cast("int")
    segments = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(ws, i * k + 1, k), " "),
    )
    lines = bound.select(
        F.col(id_col),
        F.posexplode(segments).alias("pos", "ln"),
    ).withColumn("h", F.md5(F.trim("ln")))
    line_df = lines.groupBy("h").agg(
        F.countDistinct(id_col).alias("line_df")
    )
    keep = F.col("line_df") <= max_line_df
    joined = lines.join(line_df, "h")
    rebuilt = joined.groupBy(id_col).agg(
        F.sum(keep.cast("bigint")).alias("n_kept"),
        F.sum((~keep).cast("bigint")).alias("n_dropped"),
        F.array_sort(
            F.collect_list(F.when(keep, F.struct("pos", "ln")))
        ).alias("_kept"),
    )
    return rebuilt.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform("_kept", lambda s: s["ln"]))
            .alias("clean_text"),
        "n_kept",
        "n_dropped",
    )


def incremental_dedup_pairs(new_docs: DataFrame, index_bands: DataFrame,
                            index_sets: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs of an INCREMENT against a persisted LSH index —
    the daily-crawl pattern: day-N documents are deduped against
    everything previously seen WITHOUT touching any old text.

    `index_bands` (id, band_id, band_key) and `index_sets`
    (id, sh_ids) are the store a previous run persisted (4 band rows
    and one shingle-id array per document — a sliver of the corpus).
    The increment is shingled/signed map-only, its band keys bucket-
    join against the UNION of the stored and new bands, and only the
    candidate pairs touch shingle sets for exact verification. Work
    scales with increment size × bucket density, never with corpus
    size; the index grows by appending the increment's bands/sets
    (sinks/audit.append_log shape).

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, every pair
    involving at least one new document — new-new pairs included, so
    running increments in sequence reproduces the batch result.
    """
    new_sets = _materialize(doc_shingle_sets(new_docs, text_col, id_col))
    new_bands = lsh_band_keys(minhash_signatures(new_sets, id_col), id_col)
    all_bands = index_bands.select(
        id_col, "band_id", "band_key"
    ).unionByName(new_bands)
    n = new_bands.select(
        F.col(id_col).alias("_nid"), "band_id", "band_key"
    )
    m = all_bands.select(
        F.col(id_col).alias("_mid"), "band_id", "band_key"
    )
    pairs = (
        n.join(m, ["band_id", "band_key"])
        .filter(F.col("_nid") != F.col("_mid"))
        .select(
            F.least("_nid", "_mid").alias("doc_a"),
            F.greatest("_nid", "_mid").alias("doc_b"),
        )
        .distinct()
    )
    sets_all = index_sets.select(id_col, "sh_ids").unionByName(new_sets)
    return jaccard_verify(pairs, sets_all, id_col, threshold)


def common_spans(docs: DataFrame, k: int = 5, max_gram_df: int = 20,
                 min_span_words: int = 8,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Exact substring-level duplication: the longest shared word span
    per document pair (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv 2107.06499 — the suffix-array
    exact-substring criterion, re-expressed relationally).

    Dataflow (all bucketed, never all-pairs):
      1. positional k-grams per doc — map-only (posexplode of a
         row-local array; the 60-bit gram id replaces the string
         BEFORE any shuffle, so the inverted index carries longs).
      2. document-frequency cap (`max_gram_df`) drops boilerplate
         grams exactly like x07's posting cap — the join fan-out is
         bounded by df^2 per gram, so the cap is the scale knob.
      3. inverted-index self-join on gram id -> matched position pairs.
      4. gaps-and-islands on each pair's match diagonal
         (pos_a - pos_b): consecutive matched positions merge into
         runs; a run of L k-grams is a shared span of L + k - 1 words.
         One window shuffle keyed by (pair, diagonal) — state per key
         is a row_number counter, nothing materializes.

    Returns (doc_a, doc_b, longest_span_words, n_matches) for pairs
    sharing a span of at least `min_span_words` words.
    """
    bound = docs.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_ws")
    )
    grams = bound.select(
        "doc_id",
        F.posexplode(ngrams_or_empty(F.col("_ws"), k)).alias("pos", "gram"),
    )
    g = grams.select(
        "doc_id", "pos", shingle_id(F.col("gram")).alias("gid")
    )
    dfc = g.groupBy("gid").agg(
        F.countDistinct("doc_id").alias("gram_df")
    )
    kept = g.join(dfc.filter(F.col("gram_df") <= max_gram_df), "gid")
    a = kept.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "gid"
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "gid"
    )
    from pyspark.sql import Window

    m = a.join(b, "gid").filter(F.col("doc_a") < F.col("doc_b"))
    diag = F.col("pos_a") - F.col("pos_b")
    w = Window.partitionBy("doc_a", "doc_b", diag).orderBy("pos_a")
    runs = m.select(
        "doc_a", "doc_b", "pos_a",
        diag.alias("diag"),
        (F.col("pos_a") - F.row_number().over(w)).alias("island"),
    )
    spans = runs.groupBy("doc_a", "doc_b", "diag", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            (F.max("run_len") + F.lit(k - 1)).cast("long")
            .alias("longest_span_words"),
            F.sum("run_len").cast("long").alias("n_matches"),
        )
        .filter(F.col("longest_span_words") >= min_span_words)
        .orderBy("doc_a", "doc_b")
    )


def prefix_jaccard_pairs(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         threshold: float = 0.5,
                         k: int = 3) -> DataFrame:
    """EXACT Jaccard-threshold similarity join with prefix filtering
    (Chaudhuri, Ganti, Kaushik 2006 ICDE "A Primitive Operator for
    Similarity Joins"; Bayardo, Ma, Srikant 2007 WWW "Scaling Up All
    Pairs Similarity Search").

    The exactness-preserving alternative to x07's df cap and x06's
    LSH: if J(a, b) >= t, the two docs must share a token among the
    first L = |d| - ceil(t * |d|) + 1 tokens of each doc under ANY
    single global token ordering. Only those L tokens are indexed.
    Ordering ascending by document frequency puts the RAREST tokens in
    the prefix, so the inverted index shrinks on both axes: fewer
    postings per doc (L < |d|) and the surviving postings are the
    short lists. Candidate generation cost drops from sum(df^2) over
    all tokens to sum(df_prefix^2) — typically orders of magnitude at
    corpus scale — while the verified result is IDENTICAL to the full
    index (the oracle computes the unfiltered join).

    Shuffles: one df aggregate, one df join back, one per-doc window
    for the prefix cut, the candidate equi-join, and the verify. All
    keyed; no all-pairs stage.
    """
    from pyspark.sql import Window

    sets = _materialize(doc_shingle_sets(df, text_col, id_col, k=k))
    postings = sets.select(
        F.col(id_col),
        F.size("sh_ids").alias("n"),
        F.explode_outer("sh_ids").alias("sh_id"),
    ).filter(F.col("sh_id").isNotNull())
    dfreq = postings.groupBy("sh_id").agg(
        F.count(F.lit(1)).alias("df")
    )
    ranked = postings.join(dfreq, "sh_id")
    w = Window.partitionBy(id_col).orderBy("df", "sh_id")
    pref_len = (
        F.col("n")
        - F.ceil(F.lit(float(threshold)) * F.col("n"))
        + F.lit(1)
    )
    # materialize: the self-join below consumes the prefix twice, and
    # Spark plans are trees — without the lineage cut the df aggregate,
    # join, and window would all run once PER SIDE. The prefix carries
    # (rk, n) — each token's 1-based rank in the doc's globally-sorted
    # token list and the doc's set size — for the candidate-time
    # filters below.
    prefix = _materialize(
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= pref_len)
        .select(id_col, "sh_id", "rk", "n")
    )
    a = prefix.select(F.col(id_col).alias("doc_a"), "sh_id",
                      F.col("rk").alias("rk_a"),
                      F.col("n").alias("n_a"))
    b = prefix.select(F.col(id_col).alias("doc_b"), "sh_id",
                      F.col("rk").alias("rk_b"),
                      F.col("n").alias("n_b"))
    # Exactness-preserving candidate filters (r12, guide §3 — shrink
    # the verified pair set, zero recall loss; the oracle still
    # computes the unfiltered join):
    # * LENGTH (AllPairs): J = |∩|/|∪| <= min(n)/max(n), so
    #   min < t*max proves J < t. The -1e-9 slack keeps boundary
    #   pairs (J == t exactly) when t*max rounds up in binary.
    # * POSITIONAL (PPJoin-style): both docs' tokens are sorted under
    #   the SAME global (df, sh_id) order, so for a shared token at
    #   ranks (i, j): common tokens up to it number <= min(i, j) and
    #   after it <= min(n_a-i, n_b-j) — an overlap upper bound that
    #   holds for EVERY shared token. J >= t needs
    #   |∩| >= t/(1+t)*(n_a+n_b); every shared-token row of a true
    #   pair satisfies the bound, so filtering rows before the
    #   distinct can only drop false candidates.
    t = float(threshold)
    alpha = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("n_a") + F.col("n_b"))
        - F.lit(1e-9))
    ub = (F.least("rk_a", "rk_b")
          + F.least(F.col("n_a") - F.col("rk_a"),
                    F.col("n_b") - F.col("rk_b")))
    cands = (
        a.join(b, "sh_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.least("n_a", "n_b")
                >= F.lit(t) * F.greatest("n_a", "n_b") - F.lit(1e-9))
        .filter(ub >= alpha)
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_verify(cands, sets, id_col, threshold)


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
    window of `window` consecutive hashes, keep the minimum of each
    window (rightmost on ties), emit the distinct (position, hash)
    pairs. Guarantee: every run of `window` grams contributes at least
    one fingerprint, so any shared substring of >= k+window-1 words is
    detectable from fingerprints alone — local dedup/plagiarism
    evidence with ~2/(window+1) of the grams retained.

    Scale shape: entirely MAP-ONLY. The gram array, hash array, and
    per-window argmin all happen row-locally with higher-order array
    expressions (the O(n·w) scan per doc is executor CPU, not
    shuffle); the only exchange is the final deterministic ORDER BY
    the correctness gate wants. Docs shorter than the window winnow
    over their effective length; docs with < k words emit nothing
    (ngrams_or_empty contract).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("ws")
    ).select(
        "doc_id", ngrams_or_empty(F.col("ws"), k).alias("grams")
    ).select(
        "doc_id",
        F.transform("grams", shingle_id).alias("hs"),
    ).select(
        "doc_id", "hs", F.size("hs").alias("nh"),
        F.least(F.lit(window), F.size("hs")).alias("eff"),
    )
    init = F.struct(
        F.lit(9223372036854775807).cast("long").alias("h"),
        F.lit(-1).alias("p"),
    )

    def win_min(i: Column) -> Column:
        # <= keeps the RIGHTMOST minimal hash (classic winnowing tie rule)
        return F.aggregate(
            F.sequence(i, i + F.col("eff") - 1),
            init,
            lambda acc, j: F.when(
                F.get("hs", j) <= acc["h"],
                F.struct(F.get("hs", j).alias("h"), j.alias("p")),
            ).otherwise(acc),
        )

    selected = F.when(
        F.col("nh") > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.col("nh") - F.col("eff")), win_min
            )
        ),
    ).otherwise(F.array().cast("array<struct<h:bigint,p:int>>"))
    return (
        base.select("doc_id", F.explode(selected).alias("fp"))
        .select(
            "doc_id",
            F.col("fp.p").alias("pos"),
            F.col("fp.h").alias("fp_hash"),
        )
        .orderBy("doc_id", "pos")
    )


def shingle_novelty(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's distinct
    shingles that appear in NO other document (document frequency 1).

    A leave-one-out originality signal for curation — boilerplate and
    template farms score near 0, unique prose near 1. Complements the
    pairwise dedup family: novelty is a per-doc scalar computed from
    the same inverted-index relation, so corpora can be FILTERED by
    originality without materializing pairs.

    Scale shape: `doc_shingles` is map-only (row-local distinct), then
    one shuffle by shingle id for the document-frequency count (8-byte
    keys, partial-aggregated), one join back on sh_id, and a final
    per-doc aggregate whose partial phase already collapses to one row
    per doc (a doc's shingle rows are colocated after the df join only
    by accident — the aggregate still moves at most |docs| rows).
    """
    # Two consumers (df count + the join back) — materialize once, or
    # both branches re-run the shingle projection and the join's
    # inferred predicates collapse into the lambda-bearing projection
    # (the _materialize hazard; measured 13.4 s -> ~3 s at sf0.1).
    sh = _materialize(
        doc_shingles(docs, text_col=text_col, id_col=id_col, k=k)
    )
    dfc = sh.groupBy("sh_id").agg(F.count(F.lit(1)).alias("sh_df"))
    per_doc = (
        sh.join(dfc, "sh_id")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("sh_df") == 1, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_unique"),
        )
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_unique",
        (
            F.col("n_unique").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("novelty"),
    )


def group_minhash_jaccard(docs: DataFrame, group_col: str = "source",
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          n_hashes: int = N_HASHES) -> DataFrame:
    """Estimated shingle-set Jaccard between every pair of GROUPS
    (sources/domains/snapshots) from per-group MinHash sketches —
    corpus-overlap analytics ("how much does src A duplicate src B")
    without ever joining shingle sets across groups.

    min over a group's docs of each doc's per-seed minimum IS the
    group's set minimum, so the group sketch folds out of the map-only
    per-doc signatures with one group-cardinality aggregate; the pair
    estimate is a tiny sketch-table self-join. Nothing corpus-sized
    crosses the wire after the signature stage.
    """
    sets = doc_shingle_sets(docs, text_col=text_col, id_col=id_col)
    sig = minhash_signatures(sets, id_col=id_col, n_hashes=n_hashes)
    keyed = sig.join(
        docs.select(F.col(id_col), F.col(group_col).alias("grp")), id_col
    )
    grp_sig = keyed.groupBy("grp").agg(
        *[F.min(f"mh{s}").alias(f"mh{s}") for s in range(n_hashes)]
    )
    a = grp_sig.select(
        F.col("grp").alias("src_a"),
        *[F.col(f"mh{s}").alias(f"a{s}") for s in range(n_hashes)],
    )
    b = grp_sig.select(
        F.col("grp").alias("src_b"),
        *[F.col(f"mh{s}").alias(f"b{s}") for s in range(n_hashes)],
    )
    match_terms = [
        F.when(F.col(f"a{s}") == F.col(f"b{s}"), F.lit(1)).otherwise(
            F.lit(0)
        )
        for s in range(n_hashes)
    ]
    n_match = sum(match_terms[1:], match_terms[0])
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            n_match.cast("long").alias("n_match"),
            (n_match.cast("double") / F.lit(float(n_hashes))).alias(
                "est_jaccard"
            ),
        )
        .orderBy("src_a", "src_b")
    )


def dedup_token_budget(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       group_col: str = "source") -> DataFrame:
    """Dedup-adjusted token accounting per group: how many tokens a
    group REALLY contributes once near-duplicates are discounted.

    Each document is weighted 1/|its duplicate cluster| (singletons
    weigh 1), so a cluster of n near-identical docs contributes its
    average token count once instead of n times — the honest corpus
    size that token-budget planning and mixture weighting should use
    (raw counts overstate heavily-mirrored sources).

    Pipeline: MinHash+LSH pairs -> connected components -> weight join
    -> one aggregate by group. Cluster ids ride on doc ids (text never
    re-shuffles); weights are exact integer ratios so the effective sum
    goes through DECIMAL(28,6) like every cross-row double sum.
    """
    pairs = minhash_dedup_pairs(
        docs, text_col=text_col, id_col=id_col, sort=False
    )
    clusters = duplicate_clusters(pairs, sort=False)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    weighted = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            F.size(words(F.col(text_col))).alias("n_tokens"),
        )
        .join(clusters, "doc_id", "left")
        .join(sizes, "cluster_id", "left")
        .select(
            "grp",
            "n_tokens",
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
        )
    )
    eff = F.sum(
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("cluster_size").cast("double"),
            6,
        ).cast("decimal(28,6)")
    )
    return (
        weighted.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("cluster_size") > 1, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias("n_in_clusters"),
            F.sum("n_tokens").alias("raw_tokens"),
            eff.cast("double").alias("effective_tokens"),
        )
        .select(
            F.col("grp").alias("source"),
            "n_docs",
            "n_in_clusters",
            "raw_tokens",
            "effective_tokens",
        )
        .orderBy("source")
    )


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      threshold: float = 0.8,
                      max_shingle_df: int | None = None) -> DataFrame:
    """Asymmetric containment similarity: |A∩B| / |A| (and / |B|) over
    shingle sets — the measure that catches SUBSET duplication
    (a document quoting or embedding another) which symmetric Jaccard
    dilutes away as the host document grows. Broder's containment
    (1997, "On the resemblance and containment of documents") is the
    standard excerpt-dedup criterion.

    Same candidate relation as `ngram_jaccard_pairs` — a different
    projection over `_shared_shingle_counts` (one shared
    implementation of the postings build and skew cap, so a fix there
    lands in both operators); a pair survives when EITHER direction is
    >= threshold. Containments and jaccard are exact-int divisions;
    the final order is materialize-then-orderBy for the same
    no-double-execution, density-safe reason as `ngram_jaccard_pairs`.
    """
    shared = _shared_shingle_counts(
        df, text_col, id_col, k=3, max_shingle_df=max_shingle_df
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cont_a = d("shared") / d("n_a")
    cont_b = d("shared") / d("n_b")
    jac = d("shared") / (
        (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
    )
    return (
        shared.select(
            "doc_a",
            "doc_b",
            cont_a.alias("containment_a"),
            cont_b.alias("containment_b"),
            jac.alias("jaccard"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= F.lit(float(threshold))
        )
        .localCheckpoint(eager=False)
        .orderBy("doc_a", "doc_b")
    )


def leakage_safe_split(docs: DataFrame, eval_pct: int = 10,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Near-dup-aware train/eval split: the UNIT of assignment is the
    duplicate CLUSTER, not the document, so no near-duplicate pair ever
    straddles the boundary — the standard guard against train→eval
    leakage that a row-level random split cannot give (a document's
    near-twin landing in eval silently inflates every metric).

    MinHash pairs -> connected components -> md5-bucket the cluster id
    (deterministic, engine-reproducible — the x18 sampling idiom);
    singleton documents are their own cluster. Returns (doc_id,
    cluster_id, split). One pair pipeline + two id-sized joins.
    """
    from mc_ns_data_pipeline_spark.functions.text import (
        hash_sample_bucket,
    )

    pairs = minhash_dedup_pairs(
        docs, text_col=text_col, id_col=id_col, sort=False
    )
    clusters = duplicate_clusters(pairs, sort=False)
    assigned = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    bucket = hash_sample_bucket(F.col("cluster_id"), buckets=100)
    return (
        assigned.select(
            "doc_id",
            "cluster_id",
            F.when(bucket < eval_pct, F.lit("eval"))
            .otherwise(F.lit("train")).alias("split"),
        )
        .orderBy("doc_id")
    )
