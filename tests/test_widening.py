"""Schema-evolution type widening (VERDICT r04 #5): a batch may widen
an existing column along the lattice the Parquet vectorized reader can
up-cast AT SCAN TIME (int chain, float→double, decimal growth) — a
metadata-only commit, no file rewrite; everything else still raises
SchemaEvolutionError. Property tests pin the lattice algebra without a
SparkSession; the Spark matrix proves every allowed pair actually
round-trips narrow physical files under the widened read schema."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mc_ns_data_pipeline_spark.sinks import versioned as V
from mc_ns_data_pipeline_spark.sinks.versioned import (
    SchemaEvolutionError,
    _merge_schema,
    _widened_type,
)

# ---------------------------------------------------------------------------
# Lattice algebra (no Spark) — Hypothesis over the full type matrix
# ---------------------------------------------------------------------------

_SCALARS = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
    T.TimestampType(), T.DateType(),
    T.DecimalType(10, 2), T.DecimalType(20, 2), T.DecimalType(20, 4),
    T.DecimalType(38, 10), T.DecimalType(10, 0), T.DecimalType(19, 0),
    T.DecimalType(38, 0),
]

_types = st.sampled_from(_SCALARS)


@given(_types)
def test_widening_idempotent(a):
    assert _widened_type(a, a) == a


@settings(max_examples=300)
@given(_types, _types)
def test_widening_commutative(a, b):
    assert _widened_type(a, b) == _widened_type(b, a)


@settings(max_examples=300)
@given(_types, _types)
def test_widened_dominates_both_inputs(a, b):
    """The result must be a (possibly trivial) widening of EACH input
    — re-widening an input against the result is a no-op."""
    w = _widened_type(a, b)
    if w is not None:
        assert _widened_type(w, a) == w
        assert _widened_type(w, b) == w


@settings(max_examples=300)
@given(_types, _types, _types)
def test_widening_associative_when_defined(a, b, c):
    """((a∨b)∨c) == (a∨(b∨c)) whenever both sides are defined — the
    order appends arrive in cannot change the table's final type."""
    ab = _widened_type(a, b)
    bc = _widened_type(b, c)
    if ab is not None and bc is not None:
        left, right = _widened_type(ab, c), _widened_type(a, bc)
        if left is not None and right is not None:
            assert left == right


def test_widening_refuses_lossy_and_unrelated():
    assert _widened_type(T.LongType(), T.DoubleType()) is None  # 63>53
    assert _widened_type(T.StringType(), T.LongType()) is None
    assert _widened_type(T.BooleanType(), T.ByteType()) is None
    assert _widened_type(T.DateType(), T.TimestampType()) is None
    # decimal must dominate on BOTH integer digits and scale
    assert _widened_type(T.DecimalType(10, 2),
                         T.DecimalType(10, 4)) is None
    # integral→decimal needs the full range to fit
    assert _widened_type(T.LongType(), T.DecimalType(18, 0)) is None
    assert _widened_type(T.LongType(),
                         T.DecimalType(19, 0)) == T.DecimalType(19, 0)


def test_merge_schema_widens_in_place_and_accepts_narrower():
    parent = T.StructType([
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.StringType(), True),
    ])
    widened = _merge_schema(
        parent, T.StructType([T.StructField("k", T.LongType(), True)]))
    assert widened["k"].dataType == T.LongType()
    assert widened["k"].nullable  # either era's files may project NULL
    assert [f.name for f in widened.fields] == ["k", "v"]  # in place
    # narrower incoming: schema unchanged
    again = _merge_schema(
        widened, T.StructType([T.StructField("k", T.ByteType(), True)]))
    assert again["k"].dataType == T.LongType()
    with pytest.raises(SchemaEvolutionError, match="widening"):
        _merge_schema(parent, T.StructType(
            [T.StructField("v", T.LongType(), True)]))


# ---------------------------------------------------------------------------
# The real contract: narrow physical files under the widened schema
# ---------------------------------------------------------------------------

_MATRIX = [
    ("cast(5 as byte)", "short"),
    ("cast(5 as byte)", "long"),
    ("cast(70000 as int)", "long"),
    ("cast(7 as int)", "double"),
    ("cast(1.5 as float)", "double"),
    ("cast(12.34 as decimal(10,2))", "decimal(20,2)"),
    ("cast(12.34 as decimal(10,2))", "decimal(20,4)"),
    ("cast(7 as int)", "decimal(20,0)"),
]


@pytest.mark.parametrize("narrow_expr,wide", _MATRIX)
def test_widened_read_of_narrow_files(spark, tmp_path, narrow_expr,
                                      wide, request):
    """Lifecycle per pair: write narrow, append wide (widening
    commit), and the full read — old narrow file AND new wide file
    under the widened manifest schema — returns both rows exactly."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        spark.sql(f"select {narrow_expr} as k, 'old' as v"), table)
    V.append_snapshot(
        spark.sql(f"select cast(null as {wide}) as k, 'new' as v"),
        table)
    got = V.read_current(spark, table)
    want = spark.sql(f"select cast(null as {wide}) as k").schema["k"]
    assert got.schema["k"].dataType == want.dataType
    rows = {(str(r.k), r.v) for r in got.collect()}
    assert len(rows) == 2 and ("None", "new") in rows


def test_widening_through_merge_and_compact(spark, tmp_path):
    """Widening composes with the rest of the lifecycle: COW merge
    under the widened schema rewrites narrow files correctly, and
    compaction lands everything at the widened type."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        table)
    V.append_snapshot(
        spark.createDataFrame([(2 ** 40, "big")], "k long, v string"),
        table)
    V.merge_snapshot(
        spark,
        spark.createDataFrame([(2, "B"), (2 ** 41, "huge")],
                              "k long, v string"), table, "k")
    got = dict((r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got == {1: "a", 2: "B", 2 ** 40: "big", 2 ** 41: "huge"}
    V.compact_snapshot(spark, table, sort_col="k", target_files=1)
    got2 = dict((r.k, r.v)
                for r in V.read_current(spark, table).collect())
    assert got2 == got
    man = V.read_manifest(table, V.current_snapshot(table))
    assert "long" in (man.get("schema") or "")
