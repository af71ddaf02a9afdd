"""T7 dead-letter gate: declarative rules, lossless split, replayability."""

from __future__ import annotations

from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.quality import (
    VIOLATIONS_COL,
    apply_gate,
    split_valid,
)

def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "lot_present": F.col("lot").isNotNull() & (F.col("lot") != ""),
        "qty_positive": F.col("qty") > 0,
    }


def _batch(spark):
    return spark.createDataFrame(
        [
            ("L1", 5),      # valid
            ("", 3),        # lot_present fails
            ("L2", -1),     # qty_positive fails
            (None, None),   # both fail (NULL predicate counts as failure)
        ],
        "lot string, qty int",
    )


def test_split_is_lossless_and_names_violations(spark):
    valid, dead = split_valid(_batch(spark), _rules())
    assert valid.count() == 1
    assert valid.columns == ["lot", "qty"]
    rows = {
        (r["lot"], tuple(sorted(r[VIOLATIONS_COL])))
        for r in dead.collect()
    }
    assert rows == {
        ("", ("lot_present",)),
        ("L2", ("qty_positive",)),
        (None, ("lot_present", "qty_positive")),
    }


def test_gate_persists_dead_letters_for_replay(spark, tmp_path):
    path = str(tmp_path / "dead")
    valid = apply_gate(_batch(spark), _rules(), dead_letter_path=path)
    assert valid.count() == 1
    replay = spark.read.parquet(path)
    assert replay.count() == 3
    assert "_dead_lettered_at" in replay.columns
    # replay after fixing: rejecting rows re-enter the gate
    fixed = replay.select(
        F.coalesce(F.col("lot"), F.lit("L9")).alias("lot"),
        F.abs(F.coalesce(F.col("qty"), F.lit(1))).alias("qty"),
    )
    fixed = fixed.withColumn(
        "lot", F.when(F.col("lot") == "", "L8").otherwise(F.col("lot"))
    )
    revalid, redead = split_valid(fixed, _rules())
    assert revalid.count() == 3
    assert redead.count() == 0
