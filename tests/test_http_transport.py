"""Production HTTP transport e2e: a real localhost HTTP server serving
the reference pagination contract (auth, dual response shapes, sort
params, transient 500s) driven through HttpFetcher, fetch_paginated,
and the full fetch-bulk CLI with --transport requests (VERDICT r3 #4).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from mc_ns_data_pipeline_spark.sources import rest_fixture
from mc_ns_data_pipeline_spark.sources.http_transport import (
    CAPTURES_PATH,
    META_PATH,
    STRUCTURES_PATH,
    HttpFetcher,
    fetcher_from_env,
)


class _ApiHandler(BaseHTTPRequestHandler):
    """The reference API's observable behavior: Bearer auth, currentPage
    pagination, `content` vs `pageResult.content` shapes, server-side
    sort, and (optionally) one 500 per (path, page) to exercise retries.
    """

    server_version = "FixtureAPI/1.0"

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):  # noqa: N802 - http.server contract
        url = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(url.query).items()}
        state = self.server.state
        state["requests"].append({
            "path": url.path,
            "query": qs,
            "auth": self.headers.get("Authorization"),
            "cookie": self.headers.get("Cookie"),
        })
        token = state["token"]
        if token and self.headers.get("Authorization") != f"Bearer {token}":
            self._send(401, {"error": "unauthorized"})
            return
        page = int(qs.get("currentPage", "0"))
        if state["fail_once"] and (url.path, page) not in state["failed"]:
            state["failed"].add((url.path, page))
            self._send(500, {"error": "transient"})
            return
        if url.path == CAPTURES_PATH:
            if "sortColumn" in qs:
                payload = rest_fixture.fetch_captures_page_sortable(
                    page, sortColumn=qs["sortColumn"],
                    sortDirection=qs.get("sortDirection", "asc"),
                )
            else:
                payload = rest_fixture.fetch_captures_page(page)
        elif url.path == META_PATH:
            # dual-shape coverage: meta uses the nested pageResult form
            records = rest_fixture.batch_meta_records() if page == 0 else []
            payload = {"pageResult": {"content": records, "last": True}}
        elif url.path == STRUCTURES_PATH:
            records = rest_fixture.structure_records() if page == 0 else []
            payload = {"content": records, "last": True}
        else:
            self._send(404, {"error": f"no route {url.path}"})
            return
        self._send(200, payload)

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def api_server():
    """Yield (base_url, state) for a live localhost API fixture."""
    server = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    server.state = {
        "token": "test-token",
        "fail_once": False,
        "failed": set(),
        "requests": [],
    }
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", server.state
    finally:
        server.shutdown()
        t.join(timeout=5)


def test_http_fetcher_pagination_auth_and_retry(api_server):
    """fetch_paginated over real HTTP: all records across pages, auth
    header on every request, a transient 500 absorbed by the standard
    retry policy, and 401 surfacing when the token is wrong."""
    import requests

    from mc_ns_data_pipeline_spark.sources.rest import fetch_paginated

    base, state = api_server
    state["fail_once"] = True  # every (path, page) 500s exactly once

    fetcher = HttpFetcher(base + CAPTURES_PATH, token="test-token")
    rows = fetch_paginated(fetcher,
                           page_size=rest_fixture.CAPTURE_PAGE_SIZE)
    assert len(rows) == rest_fixture.CAPTURE_TOTAL
    assert {r["productionRecordId"] for r in rows} == set(
        range(rest_fixture.CAPTURE_TOTAL)
    )
    assert all(
        r["auth"] == "Bearer test-token" for r in state["requests"]
    )
    # the 500s really happened and were retried through
    assert state["failed"]

    bad = HttpFetcher(base + CAPTURES_PATH, token="wrong")
    with pytest.raises(requests.HTTPError):
        bad(0)


def test_fetcher_from_env_requires_base_url():
    with pytest.raises(ValueError, match="BASE_URL"):
        fetcher_from_env("CAPTURES_PATH", CAPTURES_PATH, env={})
    f = fetcher_from_env(
        "CAPTURES_PATH", CAPTURES_PATH,
        env={"BASE_URL": "http://h/api/", "API_TOKEN": "t",
             "API_COOKIE": "c=1", "API_TIMEOUT_S": "3"},
    )
    assert f.url == "http://h/api" + CAPTURES_PATH
    assert f.headers == {"Authorization": "Bearer t", "Cookie": "c=1"}
    assert f.timeout_s == 3.0


def test_http_fetcher_is_picklable():
    """fetch_distributed ships the fetcher to executors via
    cloudpickle; plain pickle is the stricter bar."""
    import pickle

    f = HttpFetcher("http://h/x", token="t", cookie="c", timeout_s=7)
    g = pickle.loads(pickle.dumps(f))
    assert (g.url, g.headers, g.timeout_s, g.page_size) == (
        f.url, f.headers, f.timeout_s, f.page_size
    )


def test_cli_fetch_bulk_over_real_http(spark, tmp_path, monkeypatch,
                                       api_server):
    """The switch-over proof: `fetch-bulk --transport requests` against
    a live HTTP endpoint completes the whole pipeline — executor-side
    paginated fan-out, driver-side dim fetches (nested pageResult
    shape), checkpoint, delivery — with zero injected fixtures."""
    from mc_ns_data_pipeline_spark.cli import main

    base, state = api_server
    monkeypatch.setenv("BASE_URL", base)
    monkeypatch.setenv("API_TOKEN", "test-token")
    out = str(tmp_path / "exchange")
    sdir = str(tmp_path / "state")
    assert main([
        "fetch-bulk", "--n-pages", "4", "--start", "0", "--end", "60000",
        "--transport", "requests", "--out-dir", out, "--state-dir", sdir,
    ]) == 0
    ckpt = json.load(open(os.path.join(sdir, "checkpoint.json")))
    assert ckpt["last_processed_id"] == rest_fixture.CAPTURE_TOTAL - 1
    assert any(d.startswith("batch_from_") for d in os.listdir(out))
    paths = {r["path"] for r in state["requests"]}
    assert {CAPTURES_PATH, META_PATH, STRUCTURES_PATH} <= paths
    assert all(r["auth"] == "Bearer test-token"
               for r in state["requests"])


def test_cli_sort_pushdown_over_real_http(spark, tmp_path, monkeypatch,
                                          api_server):
    """O3 over the production transport: --sort-column reaches the
    server as sortColumn/sortDirection query params."""
    from mc_ns_data_pipeline_spark.cli import main

    base, state = api_server
    monkeypatch.setenv("BASE_URL", base)
    monkeypatch.setenv("API_TOKEN", "test-token")
    assert main([
        "fetch-bulk", "--n-pages", "4", "--start", "0", "--end", "60000",
        "--transport", "requests",
        "--sort-column", "productionRecordId", "--sort-direction", "desc",
        "--out-dir", str(tmp_path / "exchange"),
        "--state-dir", str(tmp_path / "state"),
    ]) == 0
    capture_queries = [
        r["query"] for r in state["requests"]
        if r["path"] == CAPTURES_PATH and "sortColumn" in r["query"]
    ]
    assert capture_queries, "sort params never reached the server"
    assert all(
        q["sortColumn"] == "productionRecordId"
        and q["sortDirection"] == "desc"
        for q in capture_queries
    )


def test_cli_fetch_incremental_over_real_http(spark, tmp_path,
                                              monkeypatch, api_server):
    """fetch-incremental with --transport requests: the 6-hour window
    accounting runs against live HTTP (executor fan-out + driver dim
    fetches), and a rerun at the same now-epoch is exactly-once."""
    import os as _os

    from mc_ns_data_pipeline_spark.cli import FIRST_RUN_EPOCH, main

    base, state_ = api_server
    monkeypatch.setenv("BASE_URL", base)
    monkeypatch.setenv("API_TOKEN", "test-token")
    out = str(tmp_path / "exchange")
    sdir = str(tmp_path / "state")
    now = FIRST_RUN_EPOCH + 4 * 6 * 3600
    args = [
        "fetch-incremental", "--n-pages", "4", "--transport", "requests",
        "--out-dir", out, "--state-dir", sdir, "--now-epoch", str(now),
    ]
    assert main(args) == 0
    log = spark.read.csv(
        _os.path.join(sdir, "window_log.csv"), header=True,
        inferSchema=True,
    )
    assert log.count() == 3
    assert main(args) == 0  # exactly-once on rerun
    assert spark.read.csv(
        _os.path.join(sdir, "window_log.csv"), header=True,
        inferSchema=True,
    ).count() == 3
    assert all(r["auth"] == "Bearer test-token"
               for r in state_["requests"])
