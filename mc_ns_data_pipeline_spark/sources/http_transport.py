"""Production HTTP transport — the concrete client the reference ships.

The reference's `MasterControlAPIClient` (data_fetch_system/
api_client.py:14-37) sends authenticated GETs — `Authorization: Bearer
{API_TOKEN}` + `Cookie: {API_COOKIE}` headers, `requests.get(...,
timeout=10)` — against `?currentPage={p}&itemsPerPage=1000` pages, with
3 retries and a 0.2 s delay. This module is that client re-expressed
for the injected-transport contract (`sources/rest.py:16`): it builds
picklable `(page, **sort_params) -> dict` fetchers the CLI and
`fetch_distributed` fan out ACROSS EXECUTORS, instead of one
driver-side loop.

Division of labour (deliberately different from the reference, which
retries inside `perform_get_request`): HERE is only the transport —
auth headers, URL/params, timeout, raise-for-status. The retry policy
(same 3x / 0.2 s) is applied by the call sites through
`rest.with_retries`, exactly as for every other transport, so HTTP is
not double-retried.

Configuration mirrors the reference env surface
(data_fetch_system/config.py:10-35):

  BASE_URL       API root, e.g. https://host/api  (required)
  API_TOKEN      Bearer token (optional; header omitted when unset)
  API_COOKIE     Cookie header value (optional)
  API_TIMEOUT_S  per-request timeout, default 10

and the endpoint paths default to the reference's API_ENDPOINTS map
(config.py:30-35), overridable via CAPTURES_PATH / META_PATH /
STRUCTURES_PATH.

Executor note: the env is read WHERE THE FETCHER RUNS. In local mode
that is the driver's env; on a real cluster ship the variables with
``spark.executorEnv.BASE_URL=...`` (or bake them into the worker
image) — the fetcher instances themselves carry their config after
construction, so `HttpFetcher` built on the driver works on executors
with no env at all, while the zero-config module-level functions
(`fetch_page`, `batch_meta_records`, `structure_records`) resolve env
lazily per process.
"""

from __future__ import annotations

import os

from mc_ns_data_pipeline_spark.sources.rest import (
    PAGE_SIZE,
    fetch_paginated,
)

DEFAULT_TIMEOUT_S = 10.0  # api_client.py:31

# Reference API_ENDPOINTS (data_fetch_system/config.py:30-35), as
# paths relative to BASE_URL.
CAPTURES_PATH = "/manufacturing/execution/production-record-data-captures"
META_PATH = "/manufacturing/execution/batch-records/production-records-list"
STRUCTURES_PATH = "/manufacturing/execution/production-records"


class HttpFetcher:
    """Picklable `(page, **params) -> dict` fetcher over requests.

    Carries only plain config (URL, headers, timeout) — no session
    object — so cloudpickle ships it to executors unchanged; each call
    is an independent `requests.get`, the reference's own usage
    (api_client.py:31). Server errors raise (`raise_for_status`) so
    `with_retries` sees them; the payload is returned as parsed JSON.
    """

    def __init__(self, url: str, token: str | None = None,
                 cookie: str | None = None,
                 timeout_s: float = DEFAULT_TIMEOUT_S,
                 page_size: int = PAGE_SIZE):
        self.url = url
        self.headers: dict[str, str] = {}
        if token:
            self.headers["Authorization"] = f"Bearer {token}"
        if cookie:
            self.headers["Cookie"] = cookie
        self.timeout_s = timeout_s
        self.page_size = page_size

    def __call__(self, page: int, **params: str) -> dict:
        import requests

        query = {
            "currentPage": str(page),
            "itemsPerPage": str(self.page_size),
            **{k: str(v) for k, v in params.items()},
        }
        resp = requests.get(self.url, headers=self.headers, params=query,
                            timeout=self.timeout_s)
        resp.raise_for_status()
        return resp.json()


def fetcher_from_env(path_var: str, default_path: str,
                     env: dict[str, str] | None = None,
                     page_size: int = PAGE_SIZE) -> HttpFetcher:
    """Build an `HttpFetcher` for `BASE_URL + path` from the env."""
    e = os.environ if env is None else env
    base = e.get("BASE_URL")
    if not base:
        raise ValueError(
            "BASE_URL is not set: the HTTP transport needs the API root "
            "(reference config.py:29)"
        )
    timeout = float(e.get("API_TIMEOUT_S") or DEFAULT_TIMEOUT_S)
    return HttpFetcher(
        base.rstrip("/") + e.get(path_var, default_path),
        token=e.get("API_TOKEN"),
        cookie=e.get("API_COOKIE"),
        timeout_s=timeout,
        page_size=page_size,
    )


# --- zero-config entry points for the module:function injection -------
# Usable directly as CLI flags / env settings, e.g.
#   CAPTURES_FETCHER=mc_ns_data_pipeline_spark.sources.http_transport:fetch_page


def fetch_page(page: int, **params: str) -> dict:
    """Captures page fetcher (S1 contract) against the env-configured
    endpoint; sort params (O3) pass through to the server."""
    return fetcher_from_env("CAPTURES_PATH", CAPTURES_PATH)(page, **params)


def batch_meta_records() -> list[dict]:
    """All batch-record metadata rows (driver-side dim fetch — small),
    paginated per the reference contract with the standard retries."""
    return fetch_paginated(fetcher_from_env("META_PATH", META_PATH))


def structure_records() -> list[dict]:
    """All production-record structure rows (driver-side dim fetch)."""
    return fetch_paginated(
        fetcher_from_env("STRUCTURES_PATH", STRUCTURES_PATH)
    )
