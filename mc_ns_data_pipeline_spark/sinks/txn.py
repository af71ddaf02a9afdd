"""Multi-table transactions over versioned tables: stage every write
on a per-table txn BRANCH (the write-audit-publish machinery), then
commit all tables with a write-ahead intent record and ordered
pointer flips under simultaneously-held leases — all-or-nothing
OUTCOME across tables, with crash ROLL-FORWARD via `recover_txns`.

    with multi_table_txn(log_dir, [orders_tbl, items_tbl]) as txn:
        txn.append(dfA, orders_tbl)
        txn.merge_mor(spark, updates, items_tbl, key="id")
    # exit without exception == commit; an exception == abort

Guarantees and their honest limits:

* **Staging is invisible**: every write lands on branch
  ``txn-<id>`` — readers of any table see nothing until commit
  (exactly the WAP contract each verb already has).
* **Commit is all-or-nothing in OUTCOME**: leases on every written
  table are acquired in sorted-path order (deadlock-free), every
  table's publish precondition is validated while nothing can move,
  the intent record is sealed, and only then do the pointers flip.
  A conflict (a commit landed directly on any table after staging)
  aborts BEFORE any flip — no table moves.
* **Crash atomicity is roll-forward**: a crash between flips leaves
  the sealed intent; `recover_txns` completes the remaining flips
  (idempotent — a flipped table is recognized by ancestry). A crash
  before sealing leaves only branch refs, which vacuum reaps like
  any abandoned staging.
* **Cross-table read isolation is opt-in via catalog GROUP pins**:
  per-table CURRENT readers can see table A's new state beside table
  B's old one during the flip window (and a crash window until
  recovery runs). Readers who resolve through
  ``table_catalog.read_group`` instead never do — `catalog_txn`
  with ``group=`` repins the whole group in ONE atomic file replace
  after the flips, so the group view switches between consistent
  multi-table states (the catalog-level pointer). Iceberg/Delta
  offer no multi-table commit at all.
* **Recovery edge**: if a crashed commit's lease expires and a new
  writer commits onto a not-yet-flipped table, that table's staged
  lineage no longer extends CURRENT. `recover_txns` then rolls the
  whole transaction BACK if no table had flipped (atomicity
  preserved), or reports it ``broken`` if some had — run recovery at
  process start, before new writers.

Reference anchor: the reference pipeline's multi-statement loads
commit atomically inside one PostgreSQL transaction
(data_load.py's INSERT…SELECT + status-log write); this module is
that contract re-expressed for a lake of versioned tables.
"""

from __future__ import annotations

import json
import os
import uuid
from contextlib import ExitStack

from pyspark.sql import DataFrame, SparkSession

from mc_ns_data_pipeline_spark.sinks import versioned as V
from mc_ns_data_pipeline_spark.sinks.lease import table_lease

__all__ = ["multi_table_txn", "MultiTableTxn", "recover_txns",
           "commit_staged", "TxnBrokenError"]

_COMMIT_WAIT_S = 120.0


class TxnBrokenError(RuntimeError):
    """A partially-flipped transaction could not be rolled forward."""


def _intent_path(log_dir: str, txn_id: str) -> str:
    return os.path.join(log_dir, f"{txn_id}.json")


def _is_reachable(table: str, anc: str,
                  snap: str | None) -> bool | None:
    """True if ``anc`` is ``snap`` or an ancestor of it; False when
    the lineage walks to its origin without finding it; None when the
    walk hits a VACUUMED hole before deciding — the caller must not
    treat a retention gap as proof the flip never happened."""
    seen: set[str] = set()
    while snap is not None and snap not in seen:
        if snap == anc:
            return True
        seen.add(snap)
        try:
            snap = V._read_core(table, snap).get("parent")
        except FileNotFoundError:
            return None  # lineage reaped: undecidable from here
    return False


class MultiTableTxn:
    def __init__(self, log_dir: str, tables: list[str],
                 catalog_root: str | None = None,
                 group: str | None = None,
                 names: dict[str, str] | None = None):
        """``catalog_root`` + ``group`` + ``names`` (table root →
        catalog name) additionally repin the catalog GROUP to the
        committed snapshots in one atomic file replace AFTER the
        pointer flips — readers resolving through
        ``table_catalog.read_group`` then never observe a torn
        multi-table state, closing the per-table flip window for
        group-resolving readers (use `catalog_txn` for the resolved
        convenience shape)."""
        self.log_dir = log_dir
        # realpath mirrors commit_staged's canonicalization so
        # abort() deletes staged refs on the SAME spelling the
        # protocol leased (ADVICE r10)
        self.tables = [os.path.realpath(t) for t in tables]
        self.catalog_root = catalog_root
        self.group = group
        self.names = {os.path.realpath(t): n
                      for t, n in (names or {}).items()}
        if group is not None and (catalog_root is None or not names):
            raise ValueError("group pinning needs catalog_root+names")
        self.txn_id = uuid.uuid4().hex[:16]
        self.branch = f"txn-{self.txn_id}"
        self._written: list[str] = []  # insertion order, deduped
        self._done = False

    # -- staging wrappers: every verb that takes branch= works; these
    # -- cover the common three and record which tables were touched
    def _touch(self, table: str) -> str:
        table = os.path.realpath(table)
        if table not in self.tables:
            raise ValueError(
                f"{table} not declared in this transaction")
        if table not in self._written:
            self._written.append(table)
        return table

    def append(self, df: DataFrame, table: str) -> str:
        return V.append_snapshot(df, self._touch(table),
                                 branch=self.branch)

    def merge_mor(self, spark: SparkSession, updates: DataFrame,
                  table: str, key: str) -> str:
        return V.merge_snapshot_mor(spark, updates,
                                    self._touch(table), key,
                                    branch=self.branch)

    def delete_mor(self, spark: SparkSession, table: str, key: str,
                   doomed: DataFrame) -> str:
        return V.delete_keys_mor(spark, self._touch(table), key,
                                 doomed, branch=self.branch)

    # -- outcome --------------------------------------------------------
    def commit(self) -> dict:
        """Validate every table, seal the intent, flip every pointer.
        Raises CommitConflictError (nothing flipped) if any table
        moved since staging."""
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        group_info = None
        if self.group is not None:
            group_info = {"catalog": self.catalog_root,
                          "group": self.group,
                          "names": {t: self.names[t]
                                    for t in self._written}}
        return commit_staged(self.log_dir, self.txn_id, self.branch,
                             list(self._written), group_info)

    def abort(self) -> None:
        """Drop every staged branch; staged manifests and files are
        vacuum orphans exactly like any abandoned WAP staging."""
        if self._done:
            return
        self._done = True
        for t in self._written:
            try:
                V.delete_ref(t, self.branch)
            except FileNotFoundError:
                pass

    def __enter__(self) -> "MultiTableTxn":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self.abort()
        return False


def commit_staged(log_dir: str, txn_id: str, branch: str,
                  staged: list[str],
                  group_info: dict | None = None) -> dict:
    """The transaction COMMIT protocol, callable by any authority that
    can reach the tables: validate every staged branch under
    simultaneously-held sorted-order leases, seal the write-ahead
    intent, flip every pointer, repin the catalog group. This is the
    body `MultiTableTxn.commit` always ran — factored out so the REST
    catalog service can run the identical protocol server-side for
    remote clients (clients stage writes on `txn-<id>` branches
    data-plane; only this control-plane step crosses the wire — the
    Iceberg-REST commit split).

    ``group_info`` is the intent's group-pin record
    (``{"catalog", "group", "names": {root: catalog_name}}``).
    Raises CommitConflictError with NOTHING flipped (staged branches
    dropped) when any table moved past its staging. The returned
    ``tables`` dict is keyed by the CALLER's spellings (the wire
    handler maps them back to catalog names); the sealed intent on
    disk always records canonical paths so recovery flips the same
    spellings the leases guarded."""
    if not staged:
        return {"txn": txn_id, "tables": {}}
    # canonicalize INSIDE the protocol so every caller (local
    # MultiTableTxn, the REST service's wire path, recovery) leases
    # the same spelling of the same table set in the same sorted
    # order — two spellings that sort differently would degrade the
    # deadlock-free-by-sorted-order invariant to a lease-timeout
    # conflict (ADVICE r9). realpath, not abspath: two SYMLINKED
    # spellings of the same table must lease the same path too —
    # and therefore DEDUPE to one lease, not a self-deadlocking pair
    # (ADVICE r10)
    spelling: dict[str, str] = {}  # canonical -> caller's spelling
    for t in staged:
        spelling.setdefault(os.path.realpath(t), t)
    staged = list(spelling)
    if group_info is not None and group_info.get("names"):
        group_info = dict(group_info)
        group_info["names"] = {os.path.realpath(t): n
                               for t, n in group_info["names"].items()}
    os.makedirs(log_dir, exist_ok=True)
    targets: dict[str, str] = {}
    with ExitStack() as stack:
        # sorted-path lease order: two overlapping transactions
        # can never deadlock, one just waits
        for t in sorted(staged):
            stack.enter_context(table_lease(
                t, owner=f"txn:{txn_id}",
                wait_s=_COMMIT_WAIT_S))
        # pass 1: EVERY precondition while nothing can move; a
        # conflict is an ABORT (drop the staged branches — the
        # caller re-runs the whole transaction, not one table)
        try:
            for t in staged:
                targets[t] = V._check_ref_publishable(t, branch)
        except Exception:
            for t in staged:
                V.delete_ref(t, branch)
            raise
        # seal: the commit decision survives a crash from here on
        intent = {"txn": txn_id, "state": "committing",
                  "branch": branch,
                  "tables": {t: targets[t] for t in staged}}
        if group_info is not None:
            intent["group"] = group_info
        V._atomic_write_json(_intent_path(log_dir, txn_id), intent)
        # pass 2: flip — crash mid-way rolls FORWARD via recover
        for t in staged:
            V._publish_ref_locked(t, branch)
        # pass 3: repin the catalog group AFTER every flip — one
        # atomic replace; a crash before this line is completed
        # by recovery, and a rolled-back txn never pins
        _pin_intent_group(intent)
    os.remove(_intent_path(log_dir, txn_id))
    return {"txn": txn_id,
            "tables": {spelling[t]: snap
                       for t, snap in targets.items()}}


def multi_table_txn(log_dir: str, tables: list[str],
                    **kwargs) -> MultiTableTxn:
    return MultiTableTxn(log_dir, tables, **kwargs)


def catalog_txn(catalog_root: str, names: list[str],
                group: str | None = None,
                log_dir: str | None = None) -> MultiTableTxn:
    """Catalog-addressed transaction: resolve every name through
    sinks/table_catalog, log intents under ``<catalog>/_txns`` by
    default, and (with ``group``) repin that group atomically at
    commit so group readers switch between consistent multi-table
    views."""
    from mc_ns_data_pipeline_spark.sinks import table_catalog as TC

    roots = {TC.load_table(catalog_root, n): n for n in names}
    return MultiTableTxn(
        log_dir or os.path.join(catalog_root, "_txns"),
        list(roots),
        catalog_root=catalog_root if group is not None else None,
        group=group,
        names=roots if group is not None else None)


def _pin_intent_group(intent: dict) -> None:
    """Repin the catalog group an intent names (no-op without one).
    MONOTONIC per member: a pin only moves a table's entry FORWARD in
    generation — when recovery replays an old sealed intent after a
    LATER transaction already committed and repinned, the newer pin
    survives (snapshot names carry the table's monotonic commit
    generation, so the comparison needs no lineage walk). Idempotent
    — replaying the same intent is a same-content merge."""
    g = intent.get("group")
    if not g:
        return
    from mc_ns_data_pipeline_spark.sinks import table_catalog as TC

    TC.pin_group(g["catalog"], g["group"],
                 {g["names"][t]: snap
                  for t, snap in intent["tables"].items()
                  if t in g["names"]},
                 monotonic=True)


def recover_txns(log_dir: str) -> dict:
    """Resolve every sealed-but-unfinished transaction in ``log_dir``.

    Per intent: classify each table — ``flipped`` (the recorded
    target is CURRENT or an ancestor of it), ``pending`` (branch ref
    still publishable), or ``stuck`` (the table moved past the staged
    lineage). Then:

    * any table flipped  -> roll FORWARD the pending ones; if any is
      stuck, the transaction is reported broken (and kept on disk
      for inspection) — partial visibility already happened;
    * no table flipped   -> roll FORWARD when every table is pending
      (the sealed decision completes), roll BACK otherwise (drop the
      branches; atomicity preserved — nothing ever became visible).

    Idempotent: re-running after a crash mid-recovery converges."""
    out = {"completed": [], "rolled_back": [], "broken": []}
    if not os.path.isdir(log_dir):
        return out
    for fname in sorted(os.listdir(log_dir)):
        if not fname.endswith(".json"):
            continue
        path = os.path.join(log_dir, fname)
        try:
            with open(path) as fh:
                intent = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if intent.get("state") != "committing":
            continue
        branch = intent["branch"]
        tables = intent["tables"]
        with ExitStack() as stack:
            for t in sorted(tables):
                stack.enter_context(table_lease(
                    t, owner=f"txn-recover:{intent['txn']}",
                    wait_s=_COMMIT_WAIT_S))
            state: dict[str, str] = {}
            for t, target in tables.items():
                reach = _is_reachable(t, target, V.current_snapshot(t))
                if reach:
                    state[t] = "flipped"
                    continue
                try:
                    V._check_ref_publishable(t, branch)
                    state[t] = "pending"
                    continue
                except (FileNotFoundError, V.CommitConflictError):
                    pass
                # Not publishable and not provably unflipped. If the
                # ancestry walk broke on a VACUUMED hole and the
                # branch ref is gone (consumed at flip), the txn
                # almost certainly completed long ago and retention
                # ate the evidence — classify flipped rather than
                # reporting a fully-visible commit as rolled back.
                if (reach is None
                        and V._ref_read(
                            V._ref_path(t, branch, "heads")) is None):
                    state[t] = "flipped"
                else:
                    state[t] = "stuck"
            any_flipped = "flipped" in state.values()
            all_ok = all(s in ("flipped", "pending")
                         for s in state.values())
            if all_ok:
                for t, s in state.items():
                    if s == "pending":
                        V._publish_ref_locked(t, branch)
                _pin_intent_group(intent)
                os.remove(path)
                out["completed"].append(intent["txn"])
            elif not any_flipped:
                for t in tables:
                    try:
                        V.delete_ref(t, branch)
                    except FileNotFoundError:
                        pass
                os.remove(path)
                out["rolled_back"].append(intent["txn"])
            else:
                out["broken"].append(intent["txn"])
    return out
