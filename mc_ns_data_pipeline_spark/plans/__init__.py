"""Declared query plans (Q1-Q14 + extensions) and their DuckDB oracles."""

from mc_ns_data_pipeline_spark.plans.queries import QUERIES as _CORE_QUERIES
from mc_ns_data_pipeline_spark.plans.oracles import ORACLES as _CORE_ORACLES
from mc_ns_data_pipeline_spark.plans.extensions import (
    EXT_ORACLES as _EXT_ORACLES,
    EXT_QUERIES as _EXT_QUERIES,
)

QUERIES = {**_CORE_QUERIES, **_EXT_QUERIES}
ORACLES = {**_CORE_ORACLES, **_EXT_ORACLES}
