"""REST catalog service + client over the filesystem table catalog.

sinks/table_catalog.py is the durable name → table-root mapping; this
module puts the Iceberg-REST-shaped transport in front of it so a
MULTI-TENANT estate can resolve names without mounting the catalog
filesystem: jobs carry one base URL, the service owns the catalog
directory, and every catalog verb (create / resolve / list / rename /
drop, group pin / show / drop) is one small JSON request. The server
is a stdlib ThreadingHTTPServer delegating straight to the
table_catalog functions — their filesystem atomicity (exclusive
link-create, atomic replace for group pins) IS the concurrency
control, so racing clients get the same guarantees as racing local
writers. The client mirrors the table_catalog call shapes
(`RestCatalog.load_table(name) -> root`), so call sites swap
transports without changing shape — the seam table_catalog.py's
docstring promised.

Endpoints (all JSON):

    GET    /v1/tables                    list  (?namespace=ns)
    POST   /v1/tables/{ns.name}          create (body {"root": ...?})
    GET    /v1/tables/{ns.name}          resolve -> {"root", "managed"}
    POST   /v1/tables/{ns.name}/rename   body {"to": "ns.other"}
    DELETE /v1/tables/{ns.name}          (?purge=true)
    POST   /v1/txns/commit               multi-table txn commit: body
                                         {"txn", "branch",
                                          "tables": [names...],
                                          "group": g?} — the server
                                         runs the FULL commit protocol
                                         (leases, validate, sealed
                                         intent, ordered flips, group
                                         repin) against branches the
                                         client staged data-plane
    POST   /v1/txns/recover              roll forward/back every
                                         sealed-but-unfinished txn
    GET    /v1/groups/{group}            pinned {name: snapshot}
    PUT    /v1/groups/{group}            body {"snapshots": {...},
                                               "merge": true,
                                               "monotonic": false}
    POST   /v1/groups/{group}/pin-current  body {"names": [...]}
    DELETE /v1/groups/{group}

Errors map to status codes: 404 NoSuchTableError, 409
TableExistsError, 400 ValueError. Scale: resolution stays O(1) — one
entry read behind one HTTP round trip; the service holds no state
beyond the catalog directory, so it scales out behind any
load-balancer pointed at a shared filesystem (or gets replaced by a
managed REST catalog speaking the same shapes).

Reference anchor: the reference resolves its table names inside
PostgreSQL — the database server IS its network catalog
(data_load.py); this gives the lake engine the same property.
"""

from __future__ import annotations

import json
import re as _re
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from mc_ns_data_pipeline_spark.sinks import table_catalog as TC
from mc_ns_data_pipeline_spark.sinks import versioned as V

__all__ = ["CatalogHandler", "serve_catalog", "RestCatalog",
           "RemoteCatalogTxn"]


class CatalogHandler(BaseHTTPRequestHandler):
    server_version = "VtableCatalog/1.0"

    def log_message(self, *args):  # quiet under test
        pass

    # -- plumbing -------------------------------------------------------
    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        return json.loads(self.rfile.read(n))

    def _route(self) -> tuple[str, list[str], dict]:
        url = urllib.parse.urlparse(self.path)
        qs = {k: v[0] for k, v in
              urllib.parse.parse_qs(url.query).items()}
        parts = [urllib.parse.unquote(p)
                 for p in url.path.strip("/").split("/")]
        return url.path, parts, qs

    def _dispatch(self, method: str) -> None:
        _, parts, qs = self._route()
        root = self.server.catalog_root
        try:
            if parts[:2] == ["v1", "tables"]:
                self._tables(method, parts[2:], qs, root)
            elif parts[:2] == ["v1", "groups"]:
                self._groups(method, parts[2:], qs, root)
            elif parts[:2] == ["v1", "txns"]:
                self._txns(method, parts[2:], root)
            else:
                self._send(404, {"error": "no such route"})
        except V.LineageCycleError as e:
            # corrupted lineage must NOT look like ordinary divergence
            # to a remote writer's retry loop (ADVICE r8's typed-error
            # contract, preserved across the wire)
            self._send(409, {"error": str(e),
                             "kind": "lineage-cycle"})
        except V.CommitConflictError as e:
            self._send(409, {"error": str(e),
                             "kind": "commit-conflict"})
        except TC.TableExistsError as e:
            self._send(409, {"error": str(e)})
        except TC.NoSuchTableError as e:
            self._send(404, {"error": str(e)})
        except (ValueError, KeyError) as e:
            self._send(400, {"error": str(e)})

    # -- routes ---------------------------------------------------------
    def _tables(self, method: str, rest: list[str], qs: dict,
                root: str) -> None:
        if not rest:
            if method != "GET":
                self._send(405, {"error": "method"})
                return
            self._send(200, {"tables": TC.list_tables(
                root, qs.get("namespace"))})
            return
        if len(rest) > 2 or (len(rest) == 2
                             and rest[1] != "rename"):
            self._send(404, {"error": "no such route"})
            return
        name = rest[0]
        if len(rest) == 2 and rest[1] == "rename":
            if method != "POST":
                self._send(405, {"error": "method"})
                return
            new_root = TC.rename_table(root, name, self._body()["to"])
            self._send(200, {"root": new_root})
        elif method == "POST":
            table_root = TC.create_table(
                root, name, root=self._body().get("root"))
            self._send(201, {"root": table_root})
        elif method == "GET":
            self._send(200, TC._read_entry(root, name))
        elif method == "DELETE":
            TC.drop_table(root, name,
                          purge=qs.get("purge") == "true")
            self._send(200, {"dropped": name})
        else:
            self._send(405, {"error": "method"})

    def _groups(self, method: str, rest: list[str], qs: dict,
                root: str) -> None:
        if not rest or len(rest) > 2 or (
                len(rest) == 2 and rest[1] != "pin-current"):
            self._send(404, {"error": "no such route"})
            return
        group = rest[0]
        if len(rest) == 2:  # .../pin-current
            if method != "POST":
                self._send(405, {"error": "method"})
                return
            snaps = TC.pin_current_group(root, group,
                                         self._body()["names"])
            self._send(200, {"snapshots": snaps})
        elif method == "GET":
            self._send(200,
                       {"snapshots": TC.group_snapshots(root, group)})
        elif method == "PUT":
            body = self._body()
            snaps = TC.pin_group(root, group, body["snapshots"],
                                 merge=body.get("merge", True),
                                 monotonic=body.get("monotonic", False))
            self._send(200, {"snapshots": snaps})
        elif method == "DELETE":
            TC.drop_group(root, group)
            self._send(200, {"dropped": group})
        else:
            self._send(405, {"error": "method"})

    def _txns(self, method: str, rest: list[str], root: str) -> None:
        """Wire-level multi-table transactions (VERDICT r08 #6): the
        client stages writes on ``txn-<id>`` branches data-plane (its
        own Spark writes the files); only the COMMIT decision crosses
        the wire, and the SERVICE — the single catalog authority —
        runs the identical protocol `catalog_txn` runs locally
        (txn.commit_staged: sorted-order leases, validate-all, sealed
        write-ahead intent, ordered flips, atomic group repin). Crash
        recovery is a wire verb too (`/v1/txns/recover` →
        txn.recover_txns over the service's own intent log), so a
        fleet of stateless remote writers gets roll-forward/roll-back
        without mounting the intent directory."""
        import os as _os

        from mc_ns_data_pipeline_spark.sinks import txn as TXN

        if method != "POST" or len(rest) != 1 or rest[0] not in (
                "commit", "recover"):
            self._send(404, {"error": "no such route"})
            return
        log_dir = _os.path.join(root, "_txns")
        if rest[0] == "recover":
            self._send(200, TXN.recover_txns(log_dir))
            return
        body = self._body()
        # validate client-controlled fields BEFORE they reach the
        # commit protocol (ADVICE r9): the txn id is joined into the
        # intent-log path (a '../x' would escape _txns), and the
        # branch names which ref gets published-or-deleted on every
        # staged table (an arbitrary name could destroy an unrelated
        # long-lived branch, e.g. a WAP audit branch). The wire
        # contract is therefore pinned to the data-plane staging
        # convention: hex txn ids on their own txn-<id> branch.
        txn_id = body.get("txn", "")
        if not _re.fullmatch(r"[0-9a-f]{8,32}", str(txn_id)):
            self._send(400, {"error": "txn must match [0-9a-f]{8,32}"})
            return
        if body.get("branch") != f"txn-{txn_id}":
            self._send(400, {"error": "branch must be txn-<txn>"})
            return
        names = body["tables"]
        roots = {TC.load_table(root, n): n for n in names}
        group = body.get("group")
        group_info = None
        if group is not None:
            group_info = {"catalog": root, "group": group,
                          "names": roots}
        out = TXN.commit_staged(
            log_dir, body["txn"], body["branch"],
            list(roots), group_info)
        self._send(200, {
            "txn": out["txn"],
            "tables": {roots[t]: snap
                       for t, snap in out["tables"].items()}})

    def do_GET(self):  # noqa: N802 - http.server contract
        self._dispatch("GET")

    def do_POST(self):  # noqa: N802
        self._dispatch("POST")

    def do_PUT(self):  # noqa: N802
        self._dispatch("PUT")

    def do_DELETE(self):  # noqa: N802
        self._dispatch("DELETE")


def serve_catalog(catalog_root: str, host: str = "127.0.0.1",
                  port: int = 0) -> ThreadingHTTPServer:
    """Start the catalog service on a daemon thread; returns the
    server (its ``server_address[1]`` is the bound port; call
    ``shutdown()`` to stop)."""
    srv = ThreadingHTTPServer((host, port), CatalogHandler)
    srv.catalog_root = catalog_root
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


class RestCatalog:
    """table_catalog call shapes over HTTP — swap
    ``TC.load_table(root, name)`` for
    ``RestCatalog(url).load_table(name)`` and nothing else changes."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _call(self, method: str, path: str,
              body: dict | None = None, **qs) -> dict:
        url = f"{self.base_url}{path}"
        filtered = {k: v for k, v in qs.items() if v is not None}
        if filtered:
            url += "?" + urllib.parse.urlencode(filtered)
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            msg = e.read().decode(errors="replace")
            if e.code == 404:
                raise TC.NoSuchTableError(msg)
            if e.code == 409:
                try:
                    kind = json.loads(msg).get("kind")
                except (ValueError, AttributeError):
                    kind = None
                if kind == "lineage-cycle":
                    raise V.LineageCycleError(msg)
                if kind == "commit-conflict":
                    raise V.CommitConflictError(msg)
                raise TC.TableExistsError(msg)
            raise ValueError(f"catalog service {e.code}: {msg}")

    # -- table verbs ----------------------------------------------------
    def create_table(self, name: str, root: str | None = None) -> str:
        body = {"root": root} if root else {}
        return self._call("POST", f"/v1/tables/{urllib.parse.quote(name, safe='')}", body)["root"]

    def load_table(self, name: str) -> str:
        return self._call("GET", f"/v1/tables/{urllib.parse.quote(name, safe='')}")["root"]

    def table_exists(self, name: str) -> bool:
        try:
            self.load_table(name)
            return True
        except TC.NoSuchTableError:
            return False

    def list_tables(self, namespace: str | None = None
                    ) -> dict[str, str]:
        return self._call("GET", "/v1/tables",
                          namespace=namespace)["tables"]

    def rename_table(self, src: str, dst: str) -> str:
        return self._call("POST", f"/v1/tables/{urllib.parse.quote(src, safe='')}/rename",
                          {"to": dst})["root"]

    def drop_table(self, name: str, purge: bool = False) -> None:
        self._call("DELETE", f"/v1/tables/{urllib.parse.quote(name, safe='')}",
                   purge="true" if purge else None)

    # -- group verbs ----------------------------------------------------
    def pin_group(self, group: str, snapshots: dict[str, str],
                  merge: bool = True,
                  monotonic: bool = False) -> dict[str, str]:
        return self._call("PUT", f"/v1/groups/{urllib.parse.quote(group, safe='')}",
                          {"snapshots": snapshots,
                           "merge": merge,
                           "monotonic": monotonic})["snapshots"]

    def pin_current_group(self, group: str,
                          names: list[str]) -> dict[str, str]:
        return self._call("POST", f"/v1/groups/{urllib.parse.quote(group, safe='')}/pin-current",
                          {"names": names})["snapshots"]

    # -- transactions ---------------------------------------------------
    def txn(self, names: list[str],
            group: str | None = None) -> "RemoteCatalogTxn":
        """Open a wire-level multi-table transaction (VERDICT r08 #6):
        stage locally, commit through the service."""
        return RemoteCatalogTxn(self, names, group=group)

    def recover_txns(self) -> dict:
        """Run txn recovery on the SERVICE (its intent log, its
        leases): completes or rolls back every sealed-but-unfinished
        transaction — the wire twin of txn.recover_txns."""
        return self._call("POST", "/v1/txns/recover")

    def group_snapshots(self, group: str) -> dict[str, str]:
        return self._call("GET", f"/v1/groups/{urllib.parse.quote(group, safe='')}")["snapshots"]

    def drop_group(self, group: str) -> None:
        self._call("DELETE", f"/v1/groups/{urllib.parse.quote(group, safe='')}")

    # -- reads ----------------------------------------------------------
    def read_table(self, spark, name: str, **kwargs):
        from mc_ns_data_pipeline_spark.sinks import versioned as V

        return V.read_current(spark, self.load_table(name), **kwargs)

    def read_group(self, spark, group: str, name: str, **kwargs):
        from mc_ns_data_pipeline_spark.sinks import versioned as V

        snaps = self.group_snapshots(group)
        if name not in snaps:
            raise TC.NoSuchTableError(
                f"{name} not pinned by group {group!r}")
        return V.read_snapshot(spark, self.load_table(name),
                               snaps[name], **kwargs)

    def register_views(self, spark, names: list[str] | None = None,
                       group: str | None = None, prefix: str = "",
                       snapshots: dict[str, str] | None = None
                       ) -> dict[str, str]:
        """table_catalog.register_views over the wire: name/group/
        snapshot resolution goes through the service (one JSON call
        per name plus one per group), then the frozen MVCC temp views
        register locally — a remote consumer gets plain-SQL access to
        a consistent multi-table snapshot without mounting the
        catalog filesystem. Same three modes and the same frozen-view
        contract as the local function — one shared body
        (``table_catalog.resolve_and_register_views``), so the two
        surfaces cannot drift."""
        return TC.resolve_and_register_views(
            spark, self.load_table, self.group_snapshots,
            names=names, group=group, prefix=prefix,
            snapshots=snapshots)

class RemoteCatalogTxn:
    """Client half of the wire txn protocol: staging verbs run
    LOCALLY against catalog-resolved table roots (this client's Spark
    writes the data files onto ``txn-<id>`` branches — the data plane
    never crosses the wire), and ``commit()`` posts the control-plane
    decision to the service, which validates + flips under its own
    leases. Mirrors `MultiTableTxn`'s verbs and context-manager shape
    (exit clean = commit, exception = abort)."""

    def __init__(self, catalog: "RestCatalog", names: list[str],
                 group: str | None = None):
        import uuid

        self.catalog = catalog
        self.group = group
        self.roots = {n: catalog.load_table(n) for n in names}
        self.txn_id = uuid.uuid4().hex[:16]
        self.branch = f"txn-{self.txn_id}"
        self._written: list[str] = []
        self._done = False

    def _touch(self, name: str) -> str:
        if name not in self.roots:
            raise ValueError(f"{name} not declared in this txn")
        if name not in self._written:
            self._written.append(name)
        return self.roots[name]

    def append(self, df, name: str) -> str:
        return V.append_snapshot(df, self._touch(name),
                                 branch=self.branch)

    def merge_mor(self, spark, updates, name: str, key: str) -> str:
        return V.merge_snapshot_mor(spark, updates, self._touch(name),
                                    key, branch=self.branch)

    def delete_mor(self, spark, name: str, key: str, doomed) -> str:
        return V.delete_keys_mor(spark, self._touch(name), key,
                                 doomed, branch=self.branch)

    def commit(self) -> dict:
        """Post the commit decision to the service.

        Raises CommitConflictError (server already dropped the staged
        branches) when any table moved. A TRANSPORT failure (service
        down, connection lost) deliberately leaves the staged
        ``txn-<id>`` branches in place: the client cannot know whether
        the server sealed the intent — deleting refs here could strand
        a roll-forward mid-flip — so resolution belongs to
        ``recover_txns()`` (completes or rolls back any sealed
        intent) plus vacuum, which reaps never-sealed staging branches
        by age exactly like a crashed local writer's."""
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self._written:
            return {"txn": self.txn_id, "tables": {}}
        body = {"txn": self.txn_id, "branch": self.branch,
                "tables": list(self._written)}
        if self.group is not None:
            body["group"] = self.group
        try:
            return self.catalog._call("POST", "/v1/txns/commit", body)
        except (V.CommitConflictError, TC.NoSuchTableError):
            raise  # server resolved it: branches already dropped
        except Exception as e:
            raise RuntimeError(
                f"wire txn {self.txn_id} commit did not complete "
                f"({e!r}); staged txn-branches remain on "
                f"{self._written} — run recover_txns() to resolve "
                "any sealed intent, then retry with a NEW "
                "transaction") from e

    def abort(self) -> None:
        if self._done:
            return
        self._done = True
        for n in self._written:
            try:
                V.delete_ref(self.roots[n], self.branch)
            except FileNotFoundError:
                pass

    def __enter__(self) -> "RemoteCatalogTxn":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self.abort()
        return False
