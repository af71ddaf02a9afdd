"""Declared query plans (Q1-Q14 + extensions) and their DuckDB oracles."""

from mc_ns_data_pipeline_spark.plans.queries import QUERIES  # noqa: F401
from mc_ns_data_pipeline_spark.plans.oracles import ORACLES  # noqa: F401
