"""catalog.table_rows: exact footer counts, spark.read.parquet-shaped
directory semantics (recursive, hidden/metadata entries skipped), and
a loud failure on an empty/missing table dir (ADVICE r11 — silently
returning 0 would feed wrong literals into plans on a bad
SPARK_GRAFT_SF_DIR)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mc_ns_data_pipeline_spark import catalog


def _write(path: str, n: int) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"k": pa.array(range(n), pa.int64())}), path)


def test_table_rows_flat_dir(tmp_path):
    d = tmp_path / "t.parquet"
    _write(str(d / "a.parquet"), 3)
    _write(str(d / "b.parquet"), 4)
    (d / "_SUCCESS").write_text("")
    assert catalog.table_rows(str(tmp_path), "t") == 7


def test_table_rows_recurses_partitioned_layout(tmp_path):
    d = tmp_path / "t.parquet"
    _write(str(d / "g=1" / "a.parquet"), 2)
    _write(str(d / "g=2" / "b.parquet"), 5)
    _write(str(d / "_temporary" / "junk.parquet"), 99)  # skipped
    assert catalog.table_rows(str(tmp_path), "t") == 7


def test_table_rows_raises_on_missing_or_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        catalog.table_rows(str(tmp_path), "nope")
    os.makedirs(tmp_path / "empty.parquet")
    with pytest.raises(FileNotFoundError):
        catalog.table_rows(str(tmp_path), "empty")
