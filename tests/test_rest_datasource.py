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


def test_projection_into_source_schema(registered):
    df = _read(
        registered,
        "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_page",
        n_pages=3,
    ).select("lotNumber")
    lots = {r.lotNumber for r in df.collect()}
    assert lots == {"LOT-000", "LOT-001"}  # ids 0..14
