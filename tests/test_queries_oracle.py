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


def test_driver_gate_window_composition():
    """The external driver hash-checks only the FIRST 50 registered
    names in sort order. This pin keeps the window's composition
    deliberate: all reference-parity q-queries (incl. the two streaming
    ones) plus x01–x34, every one oracle-checked. A new registration
    that sorts before x35 would silently evict a gate row — name new
    queries x97+/xs15+ unless displacement is intended."""
    window = sorted(QUERIES)[:50]
    q_names = [n for n in window if n.startswith("q")]
    assert len(q_names) == 18 and q_names[-1] == "q18_stream_dedup"
    assert [n for n in window if n.startswith("xs")] == []
    assert window[-1].startswith("x34")
    assert all(n in ORACLES for n in window), "no_oracle row inside gate"
