"""K9/K10 warehouse DDL + S6 JDBC reader construction."""

from __future__ import annotations

import pytest

from mc_ns_data_pipeline_spark.sources.jdbc import (
    JdbcPartitioning,
    jdbc_options,
    jdbc_reader,
)
from mc_ns_data_pipeline_spark.warehouse import create_warehouse, insert_select


def test_jdbc_query_pushdown_options():
    opts = jdbc_options("jdbc:postgresql://h/db", "SELECT a FROM t WHERE x=1")
    assert opts["query"] == "SELECT a FROM t WHERE x=1"
    assert opts["fetchsize"] == "10000"
    assert "dbtable" not in opts


def test_jdbc_partitioned_scan_options():
    opts = jdbc_options(
        "jdbc:postgresql://h/db",
        "SELECT id, v FROM t",
        properties={"user": "u"},
        partitioning=JdbcPartitioning("id", 0, 60_000, 32),
    )
    # query + partitioning must be presented as a dbtable subquery
    assert opts["dbtable"] == "(SELECT id, v FROM t) src"
    assert "query" not in opts
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "60000"
    assert opts["user"] == "u"


def test_jdbc_reader_is_lazy(spark):
    # building the reader must not touch the (absent) driver/network
    jdbc_reader(spark, "jdbc:postgresql://h/db", "SELECT 1")


def test_jdbc_pushdown_roundtrip(spark):
    """S6 end-to-end against a real JDBC engine (Spark's bundled Derby,
    in-memory). The WHERE-filtered row set proves the pushed statement
    executed inside Derby; the partitioned variant proves the
    range-split scan produces the requested task layout."""
    from mc_ns_data_pipeline_spark.sources.jdbc import (
        JdbcPartitioning,
        read_query,
    )

    url = "jdbc:derby:memory:s6e2e;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE items (id INT PRIMARY KEY, name VARCHAR(20), qty INT)"
    )
    for i in range(10):
        st.execute(f"INSERT INTO items VALUES ({i}, 'n{i}', {i * 10})")
    st.close()
    conn.close()

    df = read_query(
        spark, url, "SELECT id, name, qty FROM items WHERE qty >= 50"
    )
    assert sorted(tuple(r) for r in df.collect()) == [
        (i, f"n{i}", i * 10) for i in range(5, 10)
    ]

    part = JdbcPartitioning("id", 0, 10, 3)
    dfp = read_query(spark, url, "SELECT id, qty FROM items",
                     partitioning=part)
    assert dfp.rdd.getNumPartitions() == 3
    assert dfp.count() == 10


def test_jdbc_write_options_shape():
    from mc_ns_data_pipeline_spark.sinks.jdbc import jdbc_write_options

    opts = jdbc_write_options(
        "jdbc:postgresql://h/db", "wh.lots",
        properties={"user": "u"}, batchsize=5000, truncate=True,
    )
    assert opts["dbtable"] == "wh.lots"
    assert opts["batchsize"] == "5000"
    assert opts["truncate"] == "true"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["user"] == "u"


def test_jdbc_write_roundtrip_append_and_truncate_reload(spark):
    """K5/K8 end-to-end against Derby: append accumulates, a second
    append proves per-batch insert (not replace), truncate-reload
    replaces the rows while preserving the remote table's DDL (the
    PRIMARY KEY constraint still rejects duplicates afterwards)."""
    from mc_ns_data_pipeline_spark.sinks.jdbc import (
        write_append,
        write_truncate_reload,
    )
    from mc_ns_data_pipeline_spark.sources.jdbc import read_query

    url = "jdbc:derby:memory:k5e2e;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE sink_items (id INT PRIMARY KEY, name VARCHAR(20))"
    )
    st.close()
    conn.close()

    df1 = spark.createDataFrame(
        [(i, f"a{i}") for i in range(5)], "id INT, name STRING"
    )
    write_append(df1, url, "sink_items", num_connections=2)
    df2 = spark.createDataFrame(
        [(i, f"b{i}") for i in range(5, 8)], "id INT, name STRING"
    )
    write_append(df2, url, "sink_items", batchsize=2)
    got = read_query(spark, url, "SELECT id, name FROM sink_items")
    assert got.count() == 8

    fresh = spark.createDataFrame(
        [(100, "fresh"), (101, "fresh2")], "id INT, name STRING"
    )
    write_truncate_reload(fresh, url, "sink_items", num_connections=1)
    rows = sorted(
        tuple(r)
        for r in read_query(
            spark, url, "SELECT id, name FROM sink_items"
        ).collect()
    )
    assert rows == [(100, "fresh"), (101, "fresh2")]

    # DDL preserved by truncate-reload: PK constraint must still fire
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    with pytest.raises(Exception):
        st.execute("INSERT INTO sink_items VALUES (100, 'dup')")
    st.close()
    conn.close()


def test_jdbc_write_num_connections_validates():
    from mc_ns_data_pipeline_spark.sinks.jdbc import _prepare

    with pytest.raises(ValueError):
        _prepare(None, 0)


@pytest.fixture()
def warehouse_db(spark, tmp_path):
    db = "wh_test"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path / 'wh'}'"
    )
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_create_warehouse_idempotent(spark, warehouse_db):
    create_warehouse(spark, warehouse_db)
    create_warehouse(spark, warehouse_db)  # IF NOT EXISTS: no error
    tables = {
        r.tableName for r in spark.sql(f"SHOW TABLES IN {warehouse_db}").collect()
    }
    assert {"lots", "lot_data", "file_processing_history"} <= tables


def test_lot_data_ddl_matches_load_contract(spark, warehouse_db):
    """The lot_data DDL must accept exactly what to_lot_data emits —
    both now derive from schemas.LOT_DATA_SCHEMA, so an insert of the
    load pipeline's output cannot misalign."""
    from mc_ns_data_pipeline_spark.pipelines.load import to_lot_data
    from mc_ns_data_pipeline_spark.schemas import LOT_CSV_SCHEMA

    create_warehouse(spark, warehouse_db)
    exchange = spark.createDataFrame(
        [tuple(f"v{i}" for i in range(14))], LOT_CSV_SCHEMA
    )
    rows = to_lot_data(exchange)
    target_cols = [
        f.name for f in spark.table(f"{warehouse_db}.lot_data").schema.fields
    ]
    assert [f.name for f in rows.schema.fields] == target_cols
    rows.write.insertInto(f"{warehouse_db}.lot_data")
    assert spark.table(f"{warehouse_db}.lot_data").count() == 1


def test_insert_select_enrichment(spark, warehouse_db):
    create_warehouse(spark, warehouse_db)
    # staged rows follow the shared LOTS_SCHEMA contract (INSERT ...
    # SELECT is positional, so order matters)
    spark.sql(
        "SELECT 'L1' AS lot_number, 'P1' AS product_id, 'tmpl' AS product_name,"
        " 'ok' AS status, current_timestamp() AS first_loaded,"
        " current_timestamp() AS last_updated"
    ).createOrReplaceTempView("staged_lots")
    insert_select(
        spark, f"{warehouse_db}.lots", "SELECT * FROM staged_lots"
    )
    assert spark.table(f"{warehouse_db}.lots").count() == 1
    # K8 full refresh: INSERT OVERWRITE replaces, not appends
    insert_select(
        spark, f"{warehouse_db}.lots", "SELECT * FROM staged_lots",
        overwrite=True,
    )
    assert spark.table(f"{warehouse_db}.lots").count() == 1
