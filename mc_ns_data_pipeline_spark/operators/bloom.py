"""Bloom-filter semi-join reduction (pure DataFrame ops, JVM-side).

At 100 TB, `big SEMI JOIN keys` shuffles the full big side on the join
key even when only a sliver matches. The classic fix is semi-join
reduction: build a Bloom filter over the (much smaller) key side, test
it MAP-SIDE on the big side so non-matching rows die at the scan, and
only the survivors shuffle into the exact join. Spark's engine does
this internally for some shapes (runtime row-level filtering); this
operator makes it explicit and available to any plan.

Everything stays in whole-stage codegen: the k probe positions are
`xxhash64(key, seed_j) mod m` expressions, the filter itself is an
array-of-longs literal baked into the plan (one `element_at` +
`bitwAnd` per probe). No Python UDFs, no per-row driver work.

The filter build collects <= m/64 longs to the driver — bounded by the
CHOSEN filter size, never by data size (same documented tiny-collect
pattern as the IVF centroids, operators/similarity.py). False
positives only admit extra rows into the exact join that follows, so
results are exact regardless of fpp; the bloom stage is purely a
shuffle-volume optimization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_mask(pos: Column) -> Column:
    """1L << (pos % 64) — the PySpark shiftleft wrapper only takes a
    Python int shift, so go through the SQL function, which takes a
    column."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def _positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """k probe positions: xxhash64 with distinct integer seeds."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(num_bits))
        for j in range(num_hashes)
    ]


def build_bloom(keys: DataFrame, key_col: str, num_bits: int = 8192,
                num_hashes: int = 5) -> list[int]:
    """Aggregate the key side into a Bloom bit array (list of longs).

    One distributed pass: explode each key into its k (word, mask)
    pairs, BIT_OR-aggregate per word (partial-aggregated map-side, so
    shuffle volume is <= partitions x m/64 longs), then collect the
    <= m/64 aggregated words.
    """
    assert num_bits % 64 == 0
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_hashes, num_bits))
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    arr = [0] * (num_bits // 64)
    for r in words:
        arr[r["word_idx"]] = r["word"]
    return arr


def might_contain(key: Column, bloom_words: list[int],
                  num_hashes: int = 5) -> Column:
    """Membership-test Column against a built filter (codegen-friendly).

    The word array enters the plan as ONE parsed literal expression —
    `F.array(*[F.lit(w) ...])` would issue a py4j round-trip per word
    (measured cost note in operators/similarity.py).
    """
    num_bits = len(bloom_words) * 64
    words = F.expr(
        "array(" + ",".join(f"{w}L" for w in bloom_words) + ")"
    )
    cond = F.lit(True)
    for p in _positions(key, num_hashes, num_bits):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_mask(p)) != 0)
    return cond


def bloom_semi_join(big: DataFrame, keys: DataFrame, big_key: str,
                    keys_key: str, num_bits: int = 8192,
                    num_hashes: int = 5) -> DataFrame:
    """Exact semi-join with a Bloom prefilter on the big side.

    The prefilter evaluates at the big-side scan (map-side, pushable
    past projections), so the key shuffle only carries probable
    matches; the LEFT SEMI join then removes Bloom false positives.
    Size num_bits ~ 10-15 bits per distinct key for ~1% fpp.
    """
    distinct_keys = keys.select(F.col(keys_key).alias(big_key)).distinct()
    bloom = build_bloom(distinct_keys, big_key, num_bits, num_hashes)
    prefiltered = big.filter(
        might_contain(F.col(big_key), bloom, num_hashes)
    )
    return prefiltered.join(distinct_keys, big_key, "left_semi")
