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


def fetch_page_sortable(page: int, sortColumn: str | None = None,
                        sortDirection: str = "asc") -> dict:
    """O3 fixture: a server that honors sortColumn/sortDirection query
    params (reference data_processor.py:99-105). Pages are slices of
    the GLOBALLY re-sorted record list, and each record's
    dataCaptureName is stamped with the params the server received so
    tests can prove the pushdown reached the transport (executors are
    separate processes — state can't be inspected, output can)."""
    records = [
        {
            "productionRecordId": i,
            "lotNumber": f"LOT-{i // 10:03d}",
            "dataCaptureName": f"sort={sortColumn}:{sortDirection}",
            "current": i % 2 == 0,
        }
        for i in range(TOTAL_RECORDS)
    ]
    if sortColumn:
        records.sort(
            key=lambda r: r[sortColumn], reverse=sortDirection == "desc"
        )
    start = page * PAGE_SIZE
    return {"content": records[start:start + PAGE_SIZE]}


# --- full-contract fixtures for the CLI (cli.py) -----------------------

CAPTURE_PAGE_SIZE = 10
CAPTURE_TOTAL = 37


def fetch_captures_page(page: int) -> dict:
    """Full DATA_CAPTURES_SCHEMA records, paginated — the dev/test
    transport behind `cli.py fetch-bulk/--captures-fetcher`."""
    start = page * CAPTURE_PAGE_SIZE
    end = min(start + CAPTURE_PAGE_SIZE, CAPTURE_TOTAL)
    records = [
        {
            "productionRecordId": i,
            "orderLabel": str(10 + i),
            "masterTemplateId": 5,
            "unitProcedureId": 6,
            "operationId": 7,
            "phaseId": 8,
            "title": f"Step {i}",
            "value": f"v{i}",
            "userName": "alice" if i % 5 else "VOD_system",
            "dateTime": f"2025-03-10T{i % 24:02d}:30:00Z",
            "actionTaken": "entry",
            "dataCaptureName": "TEMP",
            "current": True,
            "iterationNumber": 1 + (i % 3),
        }
        for i in range(start, end)
    ]
    return {"content": records}


def fetch_captures_page_sortable(page: int, sortColumn: str | None = None,
                                 sortDirection: str = "asc") -> dict:
    """Sortable variant of fetch_captures_page (O3 CLI pushdown test):
    stamps each record's dataCaptureName with the params the server
    received, and serves pages of the globally re-sorted record list."""
    records = [
        rec
        for p in range((CAPTURE_TOTAL + CAPTURE_PAGE_SIZE - 1)
                       // CAPTURE_PAGE_SIZE)
        for rec in fetch_captures_page(p)["content"]
    ]
    for rec in records:
        rec["dataCaptureName"] = f"sort={sortColumn}:{sortDirection}"
    if sortColumn:
        records.sort(
            key=lambda r: r[sortColumn], reverse=sortDirection == "desc"
        )
    start = page * CAPTURE_PAGE_SIZE
    return {"content": records[start:start + CAPTURE_PAGE_SIZE]}


def batch_meta_records() -> list[dict]:
    """Single-lot batch metadata (the reference fetches one lot per
    record id; the fixture models one lot batch)."""
    return [
        {
            "lotNumber": "LOT-001",
            "productId": "P-9",
            "productName": "Widget",
            "status": "Released",
        }
    ]


def structure_records() -> list[dict]:
    return [
        {"title": "Unit U1", "level": "UNIT_PROCEDURE",
         "masterTemplateId": 5, "unitProcedureId": 6,
         "operationId": None, "phaseId": None},
        {"title": "Op O1", "level": "OPERATION",
         "masterTemplateId": 5, "unitProcedureId": 6,
         "operationId": 7, "phaseId": None},
        {"title": "Phase P1", "level": "PHASE",
         "masterTemplateId": 5, "unitProcedureId": 6,
         "operationId": 7, "phaseId": 8},
    ]
