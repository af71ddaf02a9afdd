"""S1 as a Python DataSource: partition-per-page-range REST scan."""

from __future__ import annotations

import pytest

SCHEMA = (
    "productionRecordId long, lotNumber string, "
    "dataCaptureName string, current boolean"
)


@pytest.fixture(scope="module")
def registered(spark):
    from mc_ns_data_pipeline_spark.sources.rest_datasource import register

    register(spark)
    return spark


def _read(spark, fetcher: str, n_pages: int, per_part: int = 4):
    return (
        spark.read.format("paginated_rest")
        .schema(SCHEMA)
        .option("n_pages", str(n_pages))
        .option("pages_per_part", str(per_part))
        .option("fetcher", fetcher)
        .load()
    )


def test_reads_all_records_across_partitions(registered):
    df = _read(
        registered,
        "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_page",
        n_pages=12,
    )
    assert df.count() == 57  # TOTAL_RECORDS; later pages are empty
    assert df.rdd.getNumPartitions() == 3  # 12 pages / 4 per partition
    ids = sorted(r.productionRecordId for r in df.collect())
    assert ids == list(range(57))


def test_nested_page_result_shape(registered):
    df = _read(
        registered,
        "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_page_nested",
        n_pages=12,
    )
    assert df.count() == 57


def test_sort_pushdown_reaches_fetcher(registered):
    """O3: sort_column/sort_direction options must be forwarded to the
    transport as sortColumn/sortDirection — proven by the fixture
    stamping the received params into each record AND by the globally
    descending id order across page partitions (only a server-side
    sort can order ACROSS pages)."""
    df = (
        registered.read.format("paginated_rest")
        .schema(SCHEMA)
        .option("n_pages", "12")
        .option("pages_per_part", "4")
        .option(
            "fetcher",
            "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_page_sortable",
        )
        .option("sort_column", "productionRecordId")
        .option("sort_direction", "desc")
        .load()
    )
    rows = df.collect()  # partition order == page order
    assert [r.productionRecordId for r in rows] == list(range(56, -1, -1))
    assert {r.dataCaptureName for r in rows} == {
        "sort=productionRecordId:desc"
    }


def test_sort_pushdown_bad_direction_fails_at_plan_time(registered):
    with pytest.raises(Exception, match="asc|desc"):
        (
            registered.read.format("paginated_rest")
            .schema(SCHEMA)
            .option("n_pages", "2")
            .option(
                "fetcher",
                "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_page_sortable",
            )
            .option("sort_column", "productionRecordId")
            .option("sort_direction", "sideways")
            .load()
            .collect()
        )


def test_fetch_paginated_sort_pushdown():
    """Driver-side loop (S1 small-result path) pushes the same params."""
    from mc_ns_data_pipeline_spark.sources.rest import fetch_paginated
    from mc_ns_data_pipeline_spark.sources.rest_fixture import (
        fetch_page_sortable,
    )

    rows = fetch_paginated(
        fetch_page_sortable,
        page_size=5,
        sort_column="productionRecordId",
        sort_direction="desc",
    )
    assert [r["productionRecordId"] for r in rows] == list(range(56, -1, -1))
    # no sort requested -> fetcher sees no params, natural order
    plain = fetch_paginated(fetch_page_sortable, page_size=5)
    assert [r["productionRecordId"] for r in plain] == list(range(57))


def test_projection_into_source_schema(registered):
    df = _read(
        registered,
        "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_page",
        n_pages=3,
    ).select("lotNumber")
    lots = {r.lotNumber for r in df.collect()}
    assert lots == {"LOT-000", "LOT-001"}  # ids 0..14
