"""Paginated REST source — SURVEY.md §2.1 S1-S3.

The reference fetches sequentially on one thread: GET
`?currentPage={p}&itemsPerPage=1000`, accumulating `content` (or
`pageResult.content`) pages until the `last` flag, with 3 retries and a
0.2 s delay (reference: api_client.py:23-73). Note its pagination bug —
reading `last` from the wrong nesting level in the pageResult branch
(api_client.py:65-67) — is NOT replicated; we stop when a page is
exhausted (the intent).

Scale design: the fetch fans out ACROSS EXECUTORS. `fetch_distributed`
partitions the page/ID space with `spark.range` and runs the HTTP calls
inside `mapInPandas`, so 1000 executors fetch 1000 page-ranges
concurrently; the driver never holds the payload. The transport is
injected (`fetch_page: (page:int) -> list[dict]`) so tests run against
fixtures and production swaps in `requests` with the same retry policy.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_SIZE = 1_000
MAX_RETRIES = 3
RETRY_DELAY_S = 0.2


def sort_params(sort_column: str | None,
                sort_direction: str | None = None) -> dict[str, str]:
    """O3 server-side sort pushdown: the query params the reference
    sends so the API pre-sorts (`sortColumn=create_date&
    sortDirection=desc`, data_processor.py:99-105). Returned as a dict
    the transport merges into the request; empty when no sort is asked,
    so plain fetchers stay untouched."""
    params: dict[str, str] = {}
    if sort_column:
        params["sortColumn"] = sort_column
        if sort_direction:
            direction = sort_direction.lower()
            if direction not in ("asc", "desc"):
                raise ValueError(
                    f"sort_direction must be asc|desc, got {sort_direction!r}"
                )
            params["sortDirection"] = direction
    elif sort_direction:
        raise ValueError("sort_direction given without sort_column")
    return params


def with_retries(fetch: Callable[..., object], *args,
                 max_retries: int = MAX_RETRIES,
                 delay_s: float = RETRY_DELAY_S, **kwargs):
    """S2: the reference's retry policy (3 attempts, 0.2 s delay).

    TypeError is NOT retried: the only way the call itself raises it
    is a signature mismatch (e.g. a sort param pushed at a plain
    `(page) -> dict` fetcher) — a programming error that three sleeps
    per executor task would mask as a transient fetch failure
    (ADVICE r3). Transport errors never surface as TypeError.
    """
    last_err: Exception | None = None
    for _ in range(max_retries):
        try:
            return fetch(*args, **kwargs)
        except TypeError:
            raise
        except Exception as err:  # noqa: BLE001 - transport errors vary
            last_err = err
            time.sleep(delay_s)
    raise last_err  # type: ignore[misc]


def extract_content(payload: dict) -> list[dict]:
    """Both response shapes: `content` or `pageResult.content`."""
    if "content" in payload:
        return payload["content"] or []
    return (payload.get("pageResult") or {}).get("content") or []


def fetch_paginated(fetch_page: Callable[[int], dict],
                    page_size: int | None = None,
                    sort_column: str | None = None,
                    sort_direction: str | None = None) -> list[dict]:
    """S1 driver-side loop: accumulate pages until exhausted.

    Retains the reference's sequential shape for small result sets
    (lot-level lookups); use `fetch_distributed` for bulk extraction.

    Termination: the `last` flag (either nesting level) or an EMPTY
    page always stops; a SHORT page stops only when the caller states
    the server's page size via `page_size`. A hard-coded short-page
    heuristic would silently truncate to one page on any server whose
    page size is smaller than the assumed constant — the short-page
    shortcut is an optimization only the caller can make safe.

    `sort_column`/`sort_direction` (O3) are pushed to the server as
    query params via the fetcher's keyword surface — the server
    pre-sorts, so the caller reads rows in order WITHOUT a Spark sort
    stage. Plain `(page) -> dict` fetchers keep working when no sort
    is requested.
    """
    params = sort_params(sort_column, sort_direction)
    rows: list[dict] = []
    page = 0
    while True:
        payload = with_retries(fetch_page, page, **params)
        content = extract_content(payload)
        rows.extend(content)
        # `last` can live at either nesting level (mirrors
        # extract_content's dual-shape handling); servers that 404 past
        # the end would otherwise burn retries and lose accumulated rows
        last = payload.get("last", False) or (
            (payload.get("pageResult") or {}).get("last", False)
        )
        short = page_size is not None and len(content) < page_size
        if not content or short or last:
            return rows
        page += 1


def pages_exhausted(fetch_page: Callable[[int], dict],
                    n_pages: int) -> bool:
    """True iff a scan of pages [0, n_pages) covered the whole dataset:
    the first UNSCANNED page is empty (or the server refuses it — a
    past-the-end 404 means the same thing).

    This is the coverage gate for checkpoint/watermark advancement:
    pagination carries no ordering promise relative to ids or
    timestamps, so any unscanned non-empty page may hold rows inside
    the span being marked processed — advancing state without this
    probe silently loses them forever.
    """
    try:
        payload = with_retries(fetch_page, n_pages)
    except Exception:
        return True
    return not extract_content(payload)


def fetch_distributed(spark: SparkSession, n_pages: int,
                      fetch_page: Callable[[int], dict],
                      schema: T.StructType,
                      pages_per_task: int = 4,
                      sort_column: str | None = None,
                      sort_direction: str | None = None) -> DataFrame:
    """S1 at scale: page-range fan-out across executors.

    Each task fetches `pages_per_task` pages and yields Arrow batches;
    rows are JSON-round-tripped through the declared schema so ragged
    payloads can't corrupt types.

    Sort pushdown (O3): with a server-side sort the GLOBAL order is a
    property of the page numbering, so `fetch_distributed` stays
    order-correct per page range; a consumer needing total order sorts
    by (page, position) — already materialized per partition — instead
    of re-sorting the payload columns.
    """
    import pandas as pd

    names = schema.fieldNames()
    params = sort_params(sort_column, sort_direction)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for page in pdf["page"]:
                payload = with_retries(fetch_page, int(page), **params)
                out.extend(extract_content(payload))
            yield pd.DataFrame(
                {n: [r.get(n) for r in out] for n in names}
            )

    pages = spark.range(0, n_pages, 1, max(1, n_pages // pages_per_task))
    pages = pages.withColumnRenamed("id", "page")
    return pages.mapInPandas(run, schema)


def records_to_df(spark: SparkSession, records: list[dict],
                  schema: T.StructType) -> DataFrame:
    """S4: flatten JSON records into a typed DataFrame (replaces
    `pandas.json_normalize`, reference data_processor.py:62)."""
    if not records:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in records])
    return spark.read.schema(schema).json(rdd)
