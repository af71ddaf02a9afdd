"""Incrementally-maintained aggregate views over versioned tables.

A materialized aggregate (group counts + sums) whose refresh consumes
ONLY the source table's changelog: per refresh, the delta files from
``read_appended_since`` are aggregated (small) and merged into the
view with file-granular COW — cost is bounded by delta bytes plus the
view files the changed groups hit, never by source-table size. On a
100 TB source with a daily 0.1% append, the view refresh reads
gigabytes, not the table.

Exactly-once with ZERO external state: the view's own manifest carries
the source watermark — each refresh commit is txn-stamped
``mv:<source_snapshot>``, so the watermark and the data it reflects
publish in ONE atomic pointer flip. A crash before the flip leaves the
old watermark (the retry recomputes the same delta); a crash after
leaves the new one (the retry no-ops). There is no cursor file to
drift out of sync with the data — compare ``consume_appends``, whose
separate cursor makes it at-least-once and pushes idempotence onto the
caller.

Maintainable aggregates are the self-maintainable ones (count, sum —
hence avg downstream) over an APPEND-ONLY source range. History that
rewrote rows (merge / delete / overwrite) cannot be folded
incrementally — sums need the OLD values to subtract — so the refresh
falls back to a full recompute, published as a fresh overwrite commit
(readers stay MVCC-consistent throughout). The fallback is reported,
never silent.

Reference anchor: the reference recomputes its nightly report tables
from scratch each run (mastercontrol_pipeline/report_queries.py);
this is the Spark-native shape that keeps such reports fresh without
the nightly rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.sinks import versioned as V
from mc_ns_data_pipeline_spark.sinks.lease import table_lease

#: Synthetic single-column merge key for (possibly multi-column)
#: groups. Stored in the view so merge_snapshot (single-key contract)
#: and the delta join stay one-column.
GROUP_KEY = "_gk"

_WATERMARK_PREFIX = "mv:"


def _with_group_key(df: DataFrame, group_cols: list[str]) -> DataFrame:
    # INJECTIVE encoding: each part is either "N" (NULL) or
    # "V<len>:<text>" — length-prefixing makes any byte content safe,
    # including separators and the N/V markers themselves, so two
    # distinct group tuples can never share a key (a collision would
    # cross-fold two groups on increment).
    parts = []
    for c in group_cols:
        s = F.col(c).cast("string")
        parts.append(F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(s), F.lit(":"), s)))
    return df.withColumn(GROUP_KEY, F.concat(*parts))


def _aggregate(df: DataFrame, group_cols: list[str],
               sum_cols: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    return (_with_group_key(df, group_cols)
            .groupBy(GROUP_KEY, *group_cols).agg(*aggs))


def view_watermark(view: str) -> str | None:
    """The source snapshot the view currently reflects, or None for a
    never-built view.

    The stamp is looked up by walking the view's lineage through
    row-preserving commits: maintenance compaction on the VIEW must
    not amnesia the watermark (it rewrites layout, not content). Any
    OTHER unstamped commit in between — someone mutated the view
    outside the refresh path — voids the watermark and the next
    refresh rebuilds from scratch rather than folding onto unknown
    content. A vacuumed-away lineage walks off the end to the same
    safe answer."""
    snap = V.current_snapshot(view)
    while snap is not None:
        try:
            man = V.read_manifest(view, snap)
        except FileNotFoundError:
            return None
        txn = man.get("txn_id") or ""
        if txn.startswith(_WATERMARK_PREFIX):
            return txn[len(_WATERMARK_PREFIX):]
        if man.get("op") != "compact":
            return None
        snap = man.get("parent")
    return None


def refresh_aggregate_view(spark: SparkSession, source: str, view: str,
                           group_cols: list[str],
                           sum_cols: list[str]) -> dict:
    """Bring ``view`` up to ``source``'s CURRENT snapshot. Returns
    ``{"mode": "noop"|"bootstrap"|"increment"|"rebuild",
    "from": wm|None, "to": snapshot}``.

    * no watermark (never built) → **bootstrap**: full aggregate of
      CURRENT, published as the view's first snapshot;
    * watermark == CURRENT → **noop** (idempotent replay);
    * append-only range since the watermark → **increment**: aggregate
      the delta files only, fold counts/sums into the affected groups
      via one broadcast join + file-granular COW merge;
    * rewritten history in range (NonIncrementalHistoryError) →
      **rebuild**: full recompute, honest and reported.

    Idempotence/atomicity: every publish is txn-stamped with the
    target source snapshot, so the watermark travels WITH the data in
    one pointer flip (see module docstring). Concurrent refreshes of
    the SAME view additionally serialize through a refresh-scope lease
    held from watermark read to publish — without it, two refreshes
    reading the same watermark but different targets would each fold
    the overlapping delta once (the commit-level lease can't see that;
    it only serializes the publishes). The second refresher fails fast
    with TableLockedError; retry after the winner and the new
    watermark makes the retry cheap or a no-op."""
    import os as _os

    with table_lease(_os.path.join(view, "refresh"),
                     owner="matview-refresh"):
        return _refresh_under_lease(spark, source, view, group_cols,
                                    sum_cols)


def _refresh_under_lease(spark: SparkSession, source: str, view: str,
                         group_cols: list[str],
                         sum_cols: list[str]) -> dict:
    target = V.current_snapshot(source)
    if target is None:
        raise V.NoCurrentSnapshotError(source)
    wm = view_watermark(view)
    stamp = f"{_WATERMARK_PREFIX}{target}"
    if wm == target:
        return {"mode": "noop", "from": wm, "to": target}

    if wm is None:
        full = _aggregate(V.read_snapshot(spark, source, target),
                          group_cols, sum_cols)
        V.write_snapshot(full, view, txn_id=stamp)
        return {"mode": "bootstrap", "from": None, "to": target}

    try:
        delta = V.read_appended_since(spark, source, wm, until=target)
    except V.NonIncrementalHistoryError:
        full = _aggregate(V.read_snapshot(spark, source, target),
                          group_cols, sum_cols)
        V.write_snapshot(full, view, txn_id=stamp)
        return {"mode": "rebuild", "from": wm, "to": target}

    dagg = _aggregate(delta, group_cols, sum_cols)
    # Fold into existing group rows: the delta's group set is small
    # (broadcast), so locating the affected view rows is one
    # broadcast semi join over the view scan — groups absent from the
    # delta are never read into the merge, and merge_snapshot rewrites
    # only the view files the affected groups live in.
    cur = V.read_current(spark, view)
    # Folded columns cast back to the VIEW's recorded types: Spark
    # widens decimal precision on every addition, and an uncast fold
    # would evolve the sum column's type each refresh until the
    # schema-evolution type check (correctly) refuses it.
    cur_type = {f.name: f.dataType for f in cur.schema.fields}
    affected_old = cur.join(
        F.broadcast(dagg.select(GROUP_KEY)), GROUP_KEY, "left_semi")
    old = affected_old.select(
        GROUP_KEY,
        F.col("n_rows").alias("_old_n"),
        *[F.col(f"sum_{c}").alias(f"_old_sum_{c}") for c in sum_cols])
    def fold_sum(c: str):
        # sum-ignoring-NULLs algebra: NULL means "no non-NULL value
        # seen yet" on BOTH sides, so the fold is NULL only when both
        # are (a delta whose rows for a group are all NULL must not
        # null out the running sum — coalescing only one side would).
        o, d = F.col(f"_old_sum_{c}"), F.col(f"sum_{c}")
        return (
            F.when(o.isNull() & d.isNull(), F.lit(None))
            .otherwise(F.coalesce(o, F.lit(0)) + F.coalesce(d, F.lit(0)))
            .cast(cur_type[f"sum_{c}"]).alias(f"sum_{c}")
        )

    folded = (
        dagg.join(F.broadcast(old), GROUP_KEY, "left")
        .select(
            GROUP_KEY, *group_cols,
            (F.coalesce(F.col("_old_n"), F.lit(0))
             + F.col("n_rows")).cast(cur_type["n_rows"])
            .alias("n_rows"),
            *[fold_sum(c) for c in sum_cols],
        )
    )
    # Materialize the fold ONCE: it is small by construction (one row
    # per delta group) but its lazy plan embeds a full view scan,
    # which merge_snapshot would otherwise re-execute for its locate
    # pass and again for the rewrite.
    folded = folded.localCheckpoint(eager=True)
    V.merge_snapshot(spark, folded, view, GROUP_KEY, txn_id=stamp)
    return {"mode": "increment", "from": wm, "to": target}
