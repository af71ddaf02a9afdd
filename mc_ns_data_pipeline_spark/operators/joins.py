"""Join operators — SURVEY.md §2.4 (J1-J9).

All reference joins are equi-joins against tiny dimensions, so every
join here defaults to broadcast. The interesting semantics are J4 (the
join-failure fallback: a missing/empty dim yields '' labels instead of
failing) and J9 (the already-processed anti-join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_left_join(fact: DataFrame, dim: DataFrame | None,
                        on: list[str], label_col: str,
                        out_col: str) -> DataFrame:
    """J1-J4: left join a (possibly missing/empty) dim; '' on miss.

    Reference bulk-mode semantics (bulk_fetch.py:114-137): each level
    falls back independently — a missing phase dim doesn't blank the
    unit label (the incremental mode's all-or-nothing variant at
    incremental_fetch.py:98-107 was a divergence; SURVEY.md §2.4 J4
    resolves to per-level fallback).
    """
    if dim is None or not set(on) <= set(dim.columns) or label_col not in dim.columns:
        return fact.withColumn(out_col, F.lit(""))
    d = dim.select(*on, F.col(label_col).alias(out_col))
    joined = fact.join(F.broadcast(d), on=on, how="left")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))


def enrich_with_structure(facts: DataFrame, unit: DataFrame | None,
                          operation: DataFrame | None,
                          phase: DataFrame | None) -> DataFrame:
    """J1+J2+J3 chain: 2-, 3-, 4-key composite left joins to the
    unit/operation/phase dims (bulk_fetch.py:115-125)."""
    out = broadcast_left_join(
        facts, unit, ["masterTemplateId", "unitProcedureId"], "title", "Unit"
    )
    out = broadcast_left_join(
        out, operation,
        ["masterTemplateId", "unitProcedureId", "operationId"],
        "title", "Operation",
    )
    out = broadcast_left_join(
        out, phase,
        ["masterTemplateId", "unitProcedureId", "operationId", "phaseId"],
        "title", "Phase",
    )
    return out


def scalar_enrich(df: DataFrame, meta: DataFrame,
                  cols: dict[str, str]) -> DataFrame:
    """J5: attach scalar metadata (first row of a 1-row-ish dim) as columns.

    The reference took `.unique()[0]` per column (bulk_fetch.py:106-109)
    — order-sensitive. Here: deterministic min-first via a 1-row
    broadcast cross join; multiplicity is the caller's diagnostic (A2).
    """
    one = meta.select(*[
        F.min(src).alias(dst) for dst, src in cols.items()
    ])
    return df.crossJoin(F.broadcast(one))


def anti_join_processed(ids: DataFrame, status_log: DataFrame,
                        id_col: str = "production_record_id",
                        on_col: str | None = None) -> DataFrame:
    """J9: drop IDs already marked Success in the status log
    (status_tracker.py:34-41 `is_already_processed`)."""
    done = (
        status_log.filter(F.col("status") == "Success")
        .select(F.col(id_col).alias("_done_id"))
        .distinct()
    )
    key = on_col or id_col
    return ids.join(
        F.broadcast(done), ids[key] == done["_done_id"], "left_anti"
    )


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              ts_col: str = "ts",
              right_cols: dict[str, str] | None = None,
              strict: bool = False) -> DataFrame:
    """As-of join: attach to each left row the most recent right row at
    or before (strict=True: strictly before) its timestamp, per key.
    Left rows with no prior right row keep NULLs (left-join semantics).

    Spark has no ASOF JOIN operator. The naive encoding — inequality
    join + per-left-row max — explodes to |L|·|R| per key before the
    aggregate prunes it, which dies on any hot key. The scale-safe
    shape used here: UNION both sides with a side tag, shuffle ONCE by
    key, and in a per-key (ts, side)-ordered window carry the latest
    right payload forward with last(ignorenulls). Cost is one shuffle
    of |L|+|R| rows — identical to a co-partitioned equi-join — and the
    window is a single pass, so hot keys cost O(rows), not O(rows²).

    `right_cols` maps output name -> right column; the payload rides in
    ONE struct so exactly one last() accumulator runs regardless of how
    many columns are carried. Rows of `right` must be unique per
    (key, ts) — pre-aggregate duplicates (e.g. F.max_by) or the carried
    row at a tied timestamp is nondeterministic.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or {}
    payload = F.struct(*[
        F.col(src).alias(dst) for dst, src in right_cols.items()
    ])
    # side tag doubles as the tie rank: inclusive mode sorts right rows
    # BEFORE left at equal ts (visible to the frame), strict mode after
    left_pri, right_pri = (0, 1) if strict else (1, 0)
    l_tagged = left.select(
        "*",
        F.lit(left_pri).alias("_pri"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        F.col(ts_col).alias(ts_col),
        F.lit(right_pri).alias("_pri"),
        payload.alias("_p"),
    )
    # align schemas: right side carries NULLs for left-only columns
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(dict(l_tagged.dtypes)[c])
            )
    u = r_tagged.select(*l_tagged.columns).unionByName(l_tagged)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_pri").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)
    return (
        u.withColumn("_carry", carried)
        .filter(F.col("_pri") == left_pri)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_carry.{dst}").alias(dst) for dst in right_cols],
        )
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: explode the small side across salt buckets.

    A hash-partitioned join puts every row of a hot key on one reducer;
    at corpus scale one key can stall a stage for hours. Salting splits
    each big-side key across `salt_buckets` reducers (deterministic
    pmod of the row hash) and replicates the small side once per bucket,
    so the join key becomes (key, salt) and hot keys parallelize.
    Complements AQE skew-join (which splits oversized partitions but not
    a single oversized key-group inside a sort-merge join).

    The small side grows `salt_buckets`x — keep it the dimension side.
    Result equals the unsalted join (tested property) ONLY for join
    types where replicated unmatched small-side rows can't leak into
    the output: right/full-outer would emit one row per salt bucket for
    each unmatched small-side key, so those fail fast here.
    """
    allowed = ("inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti")
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            f"small-side rows {salt_buckets}x; use one of {allowed}"
        )
    salt = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return (
        big_s.join(small_s, [key, "_salt"], how)
        .drop("_salt")
    )


def interval_join(points: DataFrame, intervals: DataFrame, point_ts: str,
                  start_col: str, end_col: str,
                  bucket_seconds: int = 3600) -> DataFrame:
    """Point-in-interval join with NO equi key, via time-bucket expansion.

    Spark has no native range join: `p.ts >= i.start AND p.ts < i.end`
    alone becomes BroadcastNestedLoopJoin (every point × every
    interval) — a scale killer once intervals outgrow a broadcast.
    Instead, both sides are mapped onto fixed-width time buckets: each
    point lands in exactly one bucket, each interval is exploded to the
    buckets it overlaps, and the join becomes a plain hash equi-join on
    bucket followed by the exact [start, end) refinement. Interval
    replication is bounded by ceil(duration / bucket_seconds), shuffle
    is hash-partitioned on bucket, and a point can meet a given
    interval in only its own bucket, so no post-join dedup is needed.

    Semantics: inner join, half-open [start, end). Pick bucket_seconds
    near the median interval duration: too small replicates intervals,
    too large piles unrelated intervals into each bucket.
    """
    from mc_ns_data_pipeline_spark.functions.scalar import epoch_seconds

    pb = points.withColumn(
        "_bucket",
        F.floor(epoch_seconds(point_ts) / F.lit(bucket_seconds)),
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(
                    epoch_seconds(start_col) / F.lit(bucket_seconds)
                ),
                # Include the bucket containing `end` even when `end`
                # is mid-bucket; the refinement filter removes the
                # false positives this admits.
                F.floor(
                    epoch_seconds(end_col) / F.lit(bucket_seconds)
                ),
            )
        ),
    )
    return (
        pb.join(ib, "_bucket", "inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )
