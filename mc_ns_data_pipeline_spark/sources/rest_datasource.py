"""Paginated REST scan as a Spark Python DataSource — SURVEY.md §2.1 S1.

`spark.read.format("paginated_rest")` with one input partition per page
range: 1000 executors fetch 1000 page ranges concurrently, records
stream straight into executor memory, and the driver never touches the
payload. This is the DataSource-v2-style realization of the reference's
sequential fetch loop (api_client.py:39-73).

Options:
  n_pages         total pages to scan (required)
  pages_per_part  pages per input partition (default 8)
  fetcher         "module.path:function" resolved ON THE EXECUTOR; the
                  function takes a page number and returns the decoded
                  payload dict ({"content": [...]} or
                  {"pageResult": {"content": [...]}}). Production passes
                  an HTTP fetcher (urllib/requests wrapped in the retry
                  policy of sources.rest.with_retries); tests pass a
                  deterministic fixture. String-typed options are the
                  DataSource API contract, hence import-path injection.

  sort_column     O3 server-side sort pushdown: forwarded to the
  sort_direction  fetcher as sortColumn/sortDirection query params
                  (asc|desc), mirroring data_processor.py:99-105 —
                  the server pre-sorts, so no Spark sort stage is
                  needed to read in order.

Filter pushdown (record-id ranges, epoch windows) maps to fetcher
closure parameters in production; the page range itself IS the
partition-level pushdown.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from mc_ns_data_pipeline_spark.sources.rest import (
    extract_content,
    sort_params,
)

DEFAULT_PAGES_PER_PARTITION = 8


def _resolve(path: str):
    mod, _, fn = path.partition(":")
    return getattr(importlib.import_module(mod), fn)


class PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self._schema = schema
        self._n_pages = int(options["n_pages"])
        self._per_part = int(
            options.get("pages_per_part", DEFAULT_PAGES_PER_PARTITION)
        )
        self._fetcher_path = options["fetcher"]
        # validated at plan time so a bad direction fails fast on the
        # driver, not per-task on the executors
        self._sort_params = sort_params(
            options.get("sort_column"), options.get("sort_direction")
        )

    def partitions(self) -> list[PageRange]:
        return [
            PageRange(start, min(start + self._per_part, self._n_pages))
            for start in range(0, self._n_pages, self._per_part)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        fetch_page = _resolve(self._fetcher_path)
        names = self._schema.fieldNames()
        for page in range(partition.start, partition.end):
            payload = fetch_page(page, **self._sort_params)
            for rec in extract_content(payload):
                yield tuple(rec.get(n) for n in names)


class RestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> str:
        # no inference: callers must declare the contract (SURVEY §1.3)
        raise NotImplementedError(
            "paginated_rest requires an explicit .schema(...)"
        )

    def reader(self, schema: StructType) -> RestReader:
        return RestReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(RestDataSource)
