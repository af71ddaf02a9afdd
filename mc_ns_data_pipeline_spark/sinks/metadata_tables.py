"""Metadata tables over versioned tables — the Iceberg ``t$snapshots``
/ ``t$files`` / ``t$refs`` / ``t$history`` inspection surface, as
DataFrames and SQL temp views.

The reference's operators debug their warehouse with ad-hoc psql
against PostgreSQL's own catalogs (information_schema /
file_processing_history — schema.py:40-51 is itself a hand-rolled
audit table); a lake engine owes its operators the same: "what
commits happened, what do they hold, what refs exist" answerable in
SQL without reading a byte of data. Everything here derives from the
manifest JSONs alone:

* ``snapshots`` — one row per snapshot on disk (published or
  orphaned): generation, parent, op, rows, file/delete-file counts,
  whether it is CURRENT, whether it sits on CURRENT's lineage.
* ``history`` — CURRENT's ancestry walk, newest first (the subset of
  ``snapshots`` a rollback can target).
* ``files`` — the CURRENT (or a named) snapshot's file list with
  per-file generation and recorded column stats (JSON-encoded — the
  stats schema is per-table opt-in, a fixed-width schema can't hold
  it).
* ``refs`` — tags and branch heads with their snapshot and generation.

Scale: ``snapshots``/``history``/``refs`` read O(commits) tiny core
manifests — cheap at any table size (paged/chunked cores stay
KB-sized). ``files`` materializes the full file list (O(table files)
driver memory, the same cost class as the mutation paths that
genuinely need the whole list); at 10M-file scale, prefer the pruned
planning paths for queries and keep ``files`` for inspection — or
filter by snapshot and let the caller page.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from mc_ns_data_pipeline_spark.sinks import versioned as V

_KINDS = ("snapshots", "history", "files", "refs")


def _lineage(table: str,
             cores: dict[str, dict] | None = None) -> list[str]:
    """CURRENT's ancestry, newest first (bounded by commit count).
    ``cores`` is an optional per-call manifest cache so callers that
    also read the cores themselves pay each JSON once, not twice."""
    out, seen = [], set()
    snap = V.current_snapshot(table)
    while snap is not None and snap not in seen:
        out.append(snap)
        seen.add(snap)
        try:
            core = (cores.get(snap) if cores is not None else None)
            if core is None:
                core = V._read_core(table, snap)
                if cores is not None:
                    cores[snap] = core
            snap = core.get("parent")
        except FileNotFoundError:
            break  # vacuumed below here: history ends where reach does
    return out


def _core_of(table: str, snap: str, cores: dict[str, dict]) -> dict:
    if snap not in cores:
        cores[snap] = V._read_core(table, snap)
    return cores[snap]


def snapshots_table(spark: SparkSession, table: str) -> DataFrame:
    cur = V.current_snapshot(table)
    cores: dict[str, dict] = {}
    on_lineage = set(_lineage(table, cores))
    rows = []
    for s in V.list_snapshots(table):
        man = _core_of(table, s, cores)
        rows.append((
            s, int(V._gen_of(s)), man.get("parent"),
            man.get("op"), int(man.get("rows") or 0),
            int(V._chunk_file_count(man) if "chunks" in man
                or "pages" in man else len(man.get("files") or [])),
            len(man.get("delete_files") or []),
            s == cur, s in on_lineage,
        ))
    return spark.createDataFrame(
        rows,
        "snapshot string, gen long, parent string, op string, "
        "n_rows long, n_files long, n_delete_files int, "
        "is_current boolean, on_current_lineage boolean",
    )


def history_table(spark: SparkSession, table: str) -> DataFrame:
    rows = []
    cores: dict[str, dict] = {}
    for pos, s in enumerate(_lineage(table, cores)):
        man = _core_of(table, s, cores)
        rows.append((pos, s, int(V._gen_of(s)), man.get("op"),
                     int(man.get("rows") or 0)))
    return spark.createDataFrame(
        rows,
        "steps_back int, snapshot string, gen long, op string, "
        "n_rows long",
    )


def files_table(spark: SparkSession, table: str,
                snapshot: str | None = None) -> DataFrame:
    snap = snapshot if snapshot is not None else V.current_snapshot(table)
    if snap is None:
        raise V.NoCurrentSnapshotError(table)
    man = V._materialize(table, V._read_core(table, snap))
    seq = man.get("file_seq") or {}
    stats = man.get("stats") or {}
    rows = [
        (f, int(seq.get(f, 0)),
         json.dumps(stats[f]) if f in stats else None)
        for f in man.get("files") or []
    ]
    return spark.createDataFrame(
        rows, "file string, gen long, stats_json string")


def refs_table(spark: SparkSession, table: str) -> DataFrame:
    rows = []
    for kind in ("tags", "heads"):
        for name, snap in V._list_refs_of(table, kind).items():
            rows.append((
                name, "tag" if kind == "tags" else "branch",
                snap, int(V._gen_of(snap)),
            ))
    return spark.createDataFrame(
        rows, "name string, kind string, snapshot string, gen long")


def metadata_table(spark: SparkSession, table: str,
                   kind: str, **kwargs) -> DataFrame:
    """Dispatch: ``kind`` in {'snapshots', 'history', 'files',
    'refs'} — the ``SELECT * FROM t$kind`` verbs as one call."""
    if kind == "snapshots":
        return snapshots_table(spark, table)
    if kind == "history":
        return history_table(spark, table)
    if kind == "files":
        return files_table(spark, table, **kwargs)
    if kind == "refs":
        return refs_table(spark, table)
    raise ValueError(f"unknown metadata table {kind!r}; "
                     f"one of {_KINDS}")


def register_metadata_views(spark: SparkSession, table: str,
                            prefix: str) -> list[str]:
    """Register every metadata kind as ``{prefix}_{kind}`` temp views
    so operators inspect the table in plain SQL. Views snapshot the
    metadata AT registration (they are createDataFrame results, not
    live plans) — re-register after commits, matching
    register_views' frozen-plan contract."""
    out = []
    for kind in _KINDS:
        name = f"{prefix}_{kind}"
        metadata_table(spark, table, kind).createOrReplaceTempView(name)
        out.append(name)
    return out


def register_for_catalog_table(spark: SparkSession, catalog_root: str,
                               name: str,
                               prefix: str | None = None) -> list[str]:
    """Catalog-name flavor: resolve ``ns.name`` through the table
    catalog and register its metadata views (default prefix = the
    SQL-safe table identifier, so ``sales.orders`` yields
    ``sales_orders_snapshots`` etc.)."""
    from mc_ns_data_pipeline_spark.sinks import table_catalog as TC

    root = TC.load_table(catalog_root, name)
    if prefix is None:
        prefix = TC.view_name_of(name)
    return register_metadata_views(spark, root, prefix)
