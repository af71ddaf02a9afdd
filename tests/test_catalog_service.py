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
