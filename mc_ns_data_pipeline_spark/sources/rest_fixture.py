"""Deterministic fake REST transport for tests and local development.

Emulates the MasterControl pagination contract (both response shapes)
without a network; production swaps in an HTTP fetcher with the same
signature (see rest_datasource options doc).
"""

from __future__ import annotations

PAGE_SIZE = 5
TOTAL_RECORDS = 57  # deliberately not a multiple of PAGE_SIZE


def fetch_page(page: int) -> dict:
    """Records page*PAGE_SIZE .. min(+PAGE_SIZE, TOTAL) as `content`."""
    start = page * PAGE_SIZE
    end = min(start + PAGE_SIZE, TOTAL_RECORDS)
    records = [
        {
            "productionRecordId": i,
            "lotNumber": f"LOT-{i // 10:03d}",
            "dataCaptureName": f"capture_{i % 3}",
            "current": i % 2 == 0,
        }
        for i in range(start, end)
    ]
    return {"content": records}


def fetch_page_nested(page: int) -> dict:
    """Same records via the `pageResult.content` response shape."""
    return {"pageResult": fetch_page(page)}
