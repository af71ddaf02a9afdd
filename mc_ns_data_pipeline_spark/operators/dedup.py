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
    norm_text,
    shingles,
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


def doc_shingles(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct (id, shingle-id) pairs — the base relation for MinHash
    and n-gram Jaccard. Shingles are hashed to int64 immediately: the
    explode/distinct/join shuffles move 8-byte keys, not strings."""
    return (
        df.select(
            F.col(id_col),
            F.explode(shingles(F.col(text_col), k)).alias("sh"),
        )
        .select(F.col(id_col), shingle_id(F.col("sh")).alias("sh_id"))
        .distinct()
    )


def minhash_signatures(shingled: DataFrame, id_col: str = "doc_id",
                       n_hashes: int = N_HASHES) -> DataFrame:
    """MinHash signature per doc: for each seed, the min seeded-md5 over
    the doc's shingles. Single hash-aggregate (one shuffle on id)."""
    mins = [
        F.min(_seed_hash(s, F.col("sh_id"))).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return shingled.groupBy(id_col).agg(*mins)


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


def jaccard_verify(pairs: DataFrame, shingled: DataFrame,
                   id_col: str = "doc_id",
                   threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard for candidate pairs via per-doc shingle sets.

    collect_set is bounded by per-document shingle count (not corpus
    size), so rows stay small; the pair join ships only candidate docs.
    """
    sets = shingled.groupBy(id_col).agg(F.collect_set("sh_id").alias("ss"))
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("ss").alias("ss_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("ss").alias("ss_b"))
    inter = F.size(F.array_intersect("ss_a", "ss_b")).cast("double")
    union = (F.size("ss_a") + F.size("ss_b")).cast("double") - inter
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.5) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> sign -> band ->
    bucket-join -> exact-verify."""
    shingled = doc_shingles(df, text_col, id_col)
    sig = minhash_signatures(shingled, id_col)
    pairs = lsh_candidate_pairs(lsh_band_keys(sig, id_col), id_col)
    return jaccard_verify(pairs, shingled, id_col, threshold).orderBy(
        "doc_a", "doc_b"
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.4,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted-index join.

    Candidate pairs come from sharing >= 1 shingle (inverted index), so
    complexity follows posting-list sizes. `max_shingle_df` caps hot
    postings (frequent-shingle filtering) to keep the join skew-free at
    corpus scale; None = exact.
    """
    shingled = doc_shingles(df, text_col, id_col)
    postings = shingled
    if max_shingle_df is not None:
        small = (
            shingled.groupBy("sh_id").count()
            .filter(F.col("count") <= max_shingle_df)
            .select("sh_id")
        )
        postings = shingled.join(small, "sh_id")
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = postings.select(F.col(id_col).alias("doc_a"), "sh_id")
    b = postings.select(F.col(id_col).alias("doc_b"), "sh_id")
    shared = (
        a.join(b, "sh_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("shared").cast("double") / (
        (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
    )
    return (
        shared.join(na, "doc_a").join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document as a '0'/'1' bit string (bit 0 first).

    Per-word hash = md5(word); bit b of the hash is extracted from hex
    nibble b//4 (bit b%4, LSB-first) — pure string/arithmetic ops an SQL
    oracle can mirror. Word multiplicity is the weight. One explode +
    one aggregate.
    """
    w = df.select(
        F.col(id_col),
        F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("w"),
    ).withColumn("h", F.md5(F.col("w")))

    def bit(b: int) -> Column:
        # nibble value of hex char b//4 (1-indexed substring), LSB-first bit b%4
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(F.col("h"), 1 + b // 4, 1)) - 1
        return F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))

    sums = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = w.groupBy(id_col).agg(*sums)
    bitchars = [
        F.when(F.col(f"s{b}") >= 0, F.lit("1")).otherwise(F.lit("0"))
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
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("block_id"),
            F.substring("simhash", i * block + 1, block).alias("block_key"),
        )
        for i in range(n_blocks)
    ])
    long_ = sig.select(
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
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("h_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("h_b"))
    hamming = F.expr(
        f"size(filter(sequence(1, {bits}), i -> substr(h_a, i, 1) <> substr(h_b, i, 1)))"
    )
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )
