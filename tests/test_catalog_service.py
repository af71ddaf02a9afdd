"""REST catalog service e2e: a real localhost HTTP server in front of
the filesystem catalog, driven through RestCatalog — same call shapes
as table_catalog, same atomicity (the filesystem primitives behind
the service ARE the concurrency control)."""

from __future__ import annotations

import pytest

from mc_ns_data_pipeline_spark.sinks import catalog_service as CS
from mc_ns_data_pipeline_spark.sinks import table_catalog as TC
from mc_ns_data_pipeline_spark.sinks import versioned as V


@pytest.fixture
def service(tmp_path):
    cat = str(tmp_path / "catalog")
    srv = CS.serve_catalog(cat)
    client = CS.RestCatalog(
        f"http://127.0.0.1:{srv.server_address[1]}")
    yield cat, client
    srv.shutdown()


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_table_lifecycle_over_http(spark, service):
    cat, rc = service
    root = rc.create_table("sales.orders")
    assert rc.load_table("sales.orders") == root
    assert rc.table_exists("sales.orders")
    assert not rc.table_exists("sales.nope")
    # a second create of the same name is a 409 -> TableExistsError
    with pytest.raises(TC.TableExistsError):
        rc.create_table("sales.orders")

    # the resolved root is a REAL versioned table
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
    assert rc.read_table(spark, "sales.orders").count() == 2

    assert rc.list_tables() == {"sales.orders": root}
    assert rc.rename_table("sales.orders", "sales.live") == root
    with pytest.raises(TC.NoSuchTableError):
        rc.load_table("sales.orders")
    assert rc.load_table("sales.live") == root
    # client and direct-filesystem views agree (same catalog dir)
    assert TC.load_table(cat, "sales.live") == root
    rc.drop_table("sales.live")
    assert rc.list_tables() == {}


def test_group_pins_over_http(spark, service):
    cat, rc = service
    a = rc.create_table("sales.a")
    b = rc.create_table("sales.b")
    V.write_snapshot(_df(spark, [(1, "a-base")]), a)
    V.write_snapshot(_df(spark, [(1, "b-base")]), b)
    snaps = rc.pin_current_group("nightly", ["sales.a", "sales.b"])
    assert set(snaps) == {"sales.a", "sales.b"}
    # later commit invisible through the group, visible via CURRENT
    V.append_snapshot(_df(spark, [(9, "later")]), a)
    assert rc.read_group(spark, "nightly", "sales.a").count() == 1
    assert rc.read_table(spark, "sales.a").count() == 2
    assert rc.group_snapshots("nightly") == snaps
    rc.drop_group("nightly")
    with pytest.raises(TC.NoSuchTableError):
        rc.group_snapshots("nightly")


def test_error_mapping(service):
    _, rc = service
    with pytest.raises(TC.NoSuchTableError):
        rc.load_table("no.such")
    with pytest.raises(ValueError):
        rc.create_table("bad/name.x")
    with pytest.raises(TC.NoSuchTableError):
        rc.rename_table("no.such", "other.name")


def test_catalog_txn_through_resolved_roots(spark, service,
                                            tmp_path):
    """The transaction layer composes with HTTP resolution: roots
    resolved through the service drive a multi_table_txn, and the
    group repin is visible to every other client of the catalog."""
    from mc_ns_data_pipeline_spark.sinks import txn as T

    cat, rc = service
    a = rc.create_table("sales.a")
    b = rc.create_table("sales.b")
    V.write_snapshot(_df(spark, [(1, "a-base")]), a)
    V.write_snapshot(_df(spark, [(1, "b-base")]), b)
    rc.pin_current_group("nightly", ["sales.a", "sales.b"])
    with T.multi_table_txn(
            str(tmp_path / "log"), [a, b], catalog_root=cat,
            group="nightly",
            names={a: "sales.a", b: "sales.b"}) as txn:
        txn.append(_df(spark, [(2, "a-txn")]), a)
        txn.append(_df(spark, [(2, "b-txn")]), b)
    assert rc.read_group(spark, "nightly", "sales.a").count() == 2
    assert rc.read_group(spark, "nightly", "sales.b").count() == 2


def test_catalog_serve_cli_check(tmp_path, capsys):
    from mc_ns_data_pipeline_spark.cli import main

    assert main(["catalog-serve", "--catalog",
                 str(tmp_path / "cat"), "--check"]) == 0
    assert "catalog service at http://" in capsys.readouterr().out


def test_wrong_method_rejected(service):
    """Mutating routes must check the HTTP method: a DELETE against
    /rename or /pin-current is 405, junk subpaths are 404 — a
    retrying intermediary can never mutate the catalog by accident."""
    import urllib.error
    import urllib.request

    _, rc = service
    rc.create_table("sales.a")

    def req(method, path, body=None):
        import json as _json
        data = _json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(rc.base_url + path, data=data,
                                   method=method)
        try:
            with urllib.request.urlopen(r) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    assert req("DELETE", "/v1/tables/sales.a/rename",
               {"to": "sales.b"}) == 405
    assert rc.table_exists("sales.a")  # nothing renamed
    assert req("GET", "/v1/tables/sales.a/rename") == 405
    assert req("DELETE", "/v1/groups/g/pin-current",
               {"names": ["sales.a"]}) == 405
    assert req("GET", "/v1/groups/g/anything") == 404
    assert req("GET", "/v1/groups/g/x/y") == 404
    assert req("POST", "/v1/tables/sales.a/junk") == 404


def test_racing_clients_disjoint_group_merges(spark, service):
    """VERDICT r07 #6: two RestCatalog clients hammer the SAME group
    over live HTTP with merge-pins of DISJOINT member sets. The
    per-group lease serializes the read-modify-write server-side, so
    every round both members' newest pins must survive — the lost
    update a lockless merge drops exactly when the feature matters."""
    import threading

    cat, rc = service
    rc2 = CS.RestCatalog(rc.base_url)  # second client, own connections
    rounds, errs = 12, []

    def hammer(client, member):
        try:
            for i in range(rounds):
                client.pin_group("nightly", {member: f"{i:020d}-s"})
        except Exception as e:  # pragma: no cover - fail loudly below
            errs.append(e)

    ta = threading.Thread(target=hammer, args=(rc, "sales.a"))
    tb = threading.Thread(target=hammer, args=(rc2, "sales.b"))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errs, errs
    final = rc.group_snapshots("nightly")
    last = f"{rounds - 1:020d}-s"
    assert final == {"sales.a": last, "sales.b": last}


def test_racing_clients_monotonic_repin(spark, service):
    """Generation monotonicity over the wire: a stale transaction
    intent (older snapshot generation) racing a newer pin can never
    roll the group backward, whichever request lands last."""
    import threading

    cat, rc = service
    rc2 = CS.RestCatalog(rc.base_url)
    root = rc.create_table("sales.t")
    V.write_snapshot(_df(spark, [(1, "g1")]), root)
    old = V.current_snapshot(root)
    V.append_snapshot(_df(spark, [(2, "g2")]), root)
    new = V.current_snapshot(root)
    assert V._gen_of(old) < V._gen_of(new)

    for _ in range(8):
        rc.drop_group("g")
        barrier = threading.Barrier(2)
        errs = []

        def pin(client, snap):
            try:
                barrier.wait()
                client.pin_group("g", {"sales.t": snap},
                                 monotonic=True)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        t1 = threading.Thread(target=pin, args=(rc, old))
        t2 = threading.Thread(target=pin, args=(rc2, new))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert not errs, errs
        assert rc.group_snapshots("g") == {"sales.t": new}

    # and the stale intent STILL can't regress an established pin
    rc.pin_group("g", {"sales.t": old}, monotonic=True)
    assert rc.group_snapshots("g") == {"sales.t": new}


def test_register_views_over_http(spark, service):
    """SQL views over HTTP-resolved tables: a remote consumer pins a
    group and speaks plain SQL against it; a repin after registration
    does not move the resolved views (same MVCC contract as local)."""
    cat, rc = service
    a = rc.create_table("sales.facts")
    V.write_snapshot(_df(spark, [(1, "x"), (2, "y")]), a)
    rc.pin_current_group("g", ["sales.facts"])
    views = rc.register_views(spark, group="g", prefix="http_")
    assert set(views) == {"http_sales_facts"}
    assert spark.sql(
        "SELECT count(*) AS n FROM http_sales_facts").collect()[0].n == 2

    V.append_snapshot(_df(spark, [(3, "z")]), a)
    rc.pin_current_group("g", ["sales.facts"])
    assert spark.table("http_sales_facts").count() == 2  # frozen
    rc.register_views(spark, group="g", prefix="http_")  # refresh
    assert spark.table("http_sales_facts").count() == 3


def test_wire_txn_commit_and_group_pin(spark, service):
    """VERDICT r08 #6: the full multi-table txn protocol over live
    HTTP — the client stages data-plane writes on txn branches, the
    SERVICE validates + seals + flips + repins the group."""
    cat, rc = service
    a = rc.create_table("sales.a")
    b = rc.create_table("sales.b")
    V.write_snapshot(_df(spark, [(1, "a0")]), a)
    V.write_snapshot(_df(spark, [(1, "b0")]), b)
    rc.pin_current_group("live", ["sales.a", "sales.b"])

    with rc.txn(["sales.a", "sales.b"], group="live") as t:
        t.append(_df(spark, [(2, "a1")]), "sales.a")
        t.append(_df(spark, [(2, "b1")]), "sales.b")
    assert rc.read_table(spark, "sales.a").count() == 2
    assert rc.read_table(spark, "sales.b").count() == 2
    # the group repinned atomically to the committed pair
    snaps = rc.group_snapshots("live")
    assert snaps["sales.a"] == V.current_snapshot(a)
    assert snaps["sales.b"] == V.current_snapshot(b)
    # no leftover branches or intents
    assert V.list_refs(a) == {} and V.list_refs(b) == {}


def test_wire_txn_conflict_flips_nothing(spark, service):
    """A direct commit interposing on ONE table aborts the whole wire
    txn with CommitConflictError — neither table moves, staged
    branches are dropped."""
    cat, rc = service
    a = rc.create_table("sales.a")
    b = rc.create_table("sales.b")
    V.write_snapshot(_df(spark, [(1, "a0")]), a)
    V.write_snapshot(_df(spark, [(1, "b0")]), b)
    base_a, base_b = V.current_snapshot(a), V.current_snapshot(b)

    t = rc.txn(["sales.a", "sales.b"])
    t.append(_df(spark, [(2, "a1")]), "sales.a")
    t.append(_df(spark, [(2, "b1")]), "sales.b")
    V.append_snapshot(_df(spark, [(9, "direct")]), b)  # interpose
    with pytest.raises(V.CommitConflictError):
        t.commit()
    assert V.current_snapshot(a) == base_a  # nothing flipped on a
    assert V.current_snapshot(b) != base_b  # only the direct append
    assert rc.read_table(spark, "sales.b").count() == 2
    assert V.list_refs(a) == {} and V.list_refs(b) == {}


def test_racing_wire_txns_one_wins(spark, service):
    """Two clients race overlapping wire txns to the SAME two tables:
    the service's sorted-order leases + validate-all admit exactly
    one; the loser aborts with nothing flipped and both tables land
    at the winner's snapshots (never a torn mix)."""
    import threading

    cat, rc = service
    rc2 = CS.RestCatalog(rc.base_url)
    a = rc.create_table("sales.a")
    b = rc.create_table("sales.b")
    V.write_snapshot(_df(spark, [(1, "a0")]), a)
    V.write_snapshot(_df(spark, [(1, "b0")]), b)

    t1 = rc.txn(["sales.a", "sales.b"])
    t1.append(_df(spark, [(2, "t1a")]), "sales.a")
    t1.append(_df(spark, [(2, "t1b")]), "sales.b")
    t2 = rc2.txn(["sales.a", "sales.b"])
    t2.append(_df(spark, [(3, "t2a")]), "sales.a")
    t2.append(_df(spark, [(3, "t2b")]), "sales.b")

    barrier = threading.Barrier(2)
    outcomes = {}

    def run(tag, t):
        try:
            barrier.wait()
            t.commit()
            outcomes[tag] = "committed"
        except V.CommitConflictError:
            outcomes[tag] = "conflict"

    th1 = threading.Thread(target=run, args=("t1", t1))
    th2 = threading.Thread(target=run, args=("t2", t2))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert sorted(outcomes.values()) == ["committed", "conflict"]
    winner = [k for k, v in outcomes.items() if v == "committed"][0]
    val = {r.v for r in rc.read_table(spark, "sales.a").collect()}
    want = {"a0", "t1a"} if winner == "t1" else {"a0", "t2a"}
    assert val == want
    val_b = {r.v for r in rc.read_table(spark, "sales.b").collect()}
    want_b = {"b0", "t1b"} if winner == "t1" else {"b0", "t2b"}
    assert val_b == want_b
    assert V.list_refs(a) == {} and V.list_refs(b) == {}


def test_wire_txn_recovery_rolls_forward(spark, service):
    """Crash between flips, recovered OVER THE WIRE: a sealed intent
    with one table already flipped — POST /v1/txns/recover completes
    the remaining flip and repins the group atomically."""
    import os

    cat, rc = service
    a = rc.create_table("sales.a")
    b = rc.create_table("sales.b")
    V.write_snapshot(_df(spark, [(1, "a0")]), a)
    V.write_snapshot(_df(spark, [(1, "b0")]), b)
    rc.pin_current_group("live", ["sales.a", "sales.b"])

    t = rc.txn(["sales.a", "sales.b"], group="live")
    ha = t.append(_df(spark, [(2, "a1")]), "sales.a")
    hb = t.append(_df(spark, [(2, "b1")]), "sales.b")
    # simulate the service crashing mid-commit: seal the intent by
    # hand, flip ONLY table a, leave b's branch staged
    log_dir = os.path.join(cat, "_txns")
    os.makedirs(log_dir, exist_ok=True)
    intent = {"txn": t.txn_id, "state": "committing",
              "branch": t.branch,
              "tables": {os.path.abspath(a): ha,
                         os.path.abspath(b): hb},
              "group": {"catalog": cat, "group": "live",
                        "names": {os.path.abspath(a): "sales.a",
                                  os.path.abspath(b): "sales.b"}}}
    V._atomic_write_json(
        os.path.join(log_dir, f"{t.txn_id}.json"), intent)
    V.publish_ref(a, t.branch)  # the one flip that "happened"

    out = rc.recover_txns()
    assert out["completed"] == [t.txn_id]
    assert V.current_snapshot(b) == hb  # rolled forward
    snaps = rc.group_snapshots("live")
    assert snaps == {"sales.a": ha, "sales.b": hb}
    assert not os.listdir(log_dir)  # intent consumed


def test_wire_txn_recovery_rolls_back_unflipped(spark, service):
    """A sealed intent whose staging was invalidated before ANY flip
    rolls BACK over the wire — atomicity preserved, branches dropped."""
    import os

    cat, rc = service
    a = rc.create_table("sales.a")
    V.write_snapshot(_df(spark, [(1, "a0")]), a)
    t = rc.txn(["sales.a"])
    ha = t.append(_df(spark, [(2, "a1")]), "sales.a")
    base = V.current_snapshot(a)
    log_dir = os.path.join(cat, "_txns")
    os.makedirs(log_dir, exist_ok=True)
    V._atomic_write_json(
        os.path.join(log_dir, f"{t.txn_id}.json"),
        {"txn": t.txn_id, "state": "committing", "branch": t.branch,
         "tables": {os.path.abspath(a): ha}})
    # the table moves past the staged lineage before any flip
    V.append_snapshot(_df(spark, [(9, "direct")]), a)
    out = rc.recover_txns()
    assert out["rolled_back"] == [t.txn_id]
    assert V.current_snapshot(a) != base
    assert {r.v for r in rc.read_table(spark, "sales.a").collect()} \
        == {"a0", "direct"}
    assert V.list_refs(a) == {}


def test_wire_txn_rejects_hostile_txn_and_branch(spark, service):
    """ADVICE r9 (medium): POST /v1/txns/commit used to pass the
    client-controlled txn id straight into the intent path (a
    '../x' escapes _txns) and the branch straight into publish/
    delete_ref (any long-lived ref could be destroyed). The wire
    contract is now pinned: hex txn ids, branch == txn-<id>."""
    import json as _json
    import os
    import urllib.request

    cat, rc = service
    a = rc.create_table("sales.a")
    V.write_snapshot(_df(spark, [(1, "a0")]), a)
    # a long-lived branch a hostile commit must NOT be able to touch
    V.append_snapshot(_df(spark, [(7, "audit")]), a,
                      branch="wap-audit")

    def post_commit(body):
        req = urllib.request.Request(
            f"{rc.base_url}/v1/txns/commit",
            data=_json.dumps(body).encode(), method="POST",
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    # path-traversal txn id -> 400, nothing written outside _txns
    assert post_commit({"txn": "../escape", "branch": "txn-../escape",
                        "tables": ["sales.a"]}) == 400
    assert not os.path.exists(os.path.join(cat, "escape.json"))
    # non-hex txn -> 400
    assert post_commit({"txn": "ZZZZZZZZ", "branch": "txn-ZZZZZZZZ",
                        "tables": ["sales.a"]}) == 400
    # valid txn id but branch naming an unrelated ref -> 400, and the
    # ref survives untouched
    assert post_commit({"txn": "aaaabbbbccccdddd",
                        "branch": "wap-audit",
                        "tables": ["sales.a"]}) == 400
    assert "wap-audit" in V.list_refs(a)
    # the legitimate protocol still round-trips
    with rc.txn(["sales.a"]) as t:
        t.append(_df(spark, [(2, "a1")]), "sales.a")
    assert rc.read_table(spark, "sales.a").count() == 2


def test_commit_staged_canonicalizes_paths(spark, tmp_path):
    """ADVICE r9 + r10 (low): commit_staged canonicalizes the staged
    list itself (realpath — dots, trailing slashes AND symlinks), so
    a caller handing a noisy spelling leases and flips the same
    canonical roots as MultiTableTxn would — the sorted-lease
    deadlock-freedom invariant holds across caller styles. The
    RETURN value is keyed by the CALLER's spellings (the wire
    handler maps them back to catalog names); two spellings of the
    same table dedupe to ONE lease instead of self-deadlocking."""
    import os

    from mc_ns_data_pipeline_spark.sinks import txn as TXN

    root = str(tmp_path / "t1")
    V.write_snapshot(_df(spark, [(1, "base")]), root)
    branch = "txn-deadbeefdeadbeef"
    V.append_snapshot(_df(spark, [(2, "staged")]), root,
                      branch=branch)
    link = str(tmp_path / "t1_link")
    os.symlink(root, link)
    noisy = str(tmp_path) + "/./t1/"
    # two spellings of the SAME table: canonicalized to one lease,
    # one flip; the result echoes the first caller spelling
    out = TXN.commit_staged(str(tmp_path / "_txns"),
                            "deadbeefdeadbeef", branch,
                            [noisy, link])
    assert list(out["tables"]) == [noisy]
    assert V.read_current(spark, root).count() == 2
    assert V.list_refs(root) == {}
    assert V.list_refs(link) == {}
