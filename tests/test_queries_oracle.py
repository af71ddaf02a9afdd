"""Differential tests: every declared query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from mc_ns_data_pipeline_spark.plans import ORACLES, QUERIES
from mc_ns_data_pipeline_spark.testing import assert_query_matches

ORACLE_CHECKED = sorted(set(QUERIES) & set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_queries_nonempty(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert fn(spark, sf_dir).count() >= 0, name
