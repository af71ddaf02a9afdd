#!/usr/bin/env python
"""Build the 10x scale-stress dataset used by BASELINE.md's stress study.

Replicates an sf directory N times (default 10x of sf0.1 -> ~sf1) with:
  * id offsets per replica (keeps keys unique, preserves o<->l integrity),
  * one extra text token per replica (documents become NEAR-duplicates of
    their replicas, not exact ones — dedup work tracks true pair density),
  * a small first-component perturbation on embeddings (same reason).

Usage:
  python scripts/make_stress_data.py [SRC_SF_DIR] [OUT_DIR] [N_REPLICAS]
  # defaults: /root/testdata/sf0.1 /tmp/stress_sf1 10

DuckDB writes the parquet (same physical layout class as the fixtures);
timestamps land as TIMESTAMP(us), which catalog.load_table handles.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 100_000_000  # per-replica id offset, far above any sf0.1 key


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def rep_union(template: str) -> str:
        return "\nUNION ALL\n".join(
            template.format(r=r, off=r * OFFSET) for r in range(n)
        )

    writes = {
        # key-bearing fact tables: offset every key column consistently
        "orders": rep_union(
            "SELECT o_orderkey + {off} AS o_orderkey,"
            " o_custkey + {off} AS o_custkey,"
            " * EXCLUDE (o_orderkey, o_custkey)"
            " FROM src"
        ),
        # l_partkey/l_suppkey are NOT offset: part/supplier are copied
        # as-is below, so offsetting would dangle every replica's
        # part/supplier joins (90% of lineitem silently dropping at the
        # join — the stress numbers would measure 1/10 of the matched
        # volume). Shared dim keys across replicas keep FK integrity
        # and make the dims 10x hotter, which is the realistic shape.
        "lineitem": rep_union(
            "SELECT l_orderkey + {off} AS l_orderkey,"
            " * EXCLUDE (l_orderkey)"
            " FROM src"
        ),
        "customer": rep_union(
            "SELECT c_custkey + {off} AS c_custkey,"
            " * EXCLUDE (c_custkey) FROM src"
        ),
        "events": rep_union(
            "SELECT event_id + {off} AS event_id,"
            " user_id + {off} AS user_id,"
            " * EXCLUDE (event_id, user_id) FROM src"
        ),
        "documents": rep_union(
            "SELECT doc_id + {off} AS doc_id,"
            " text || ' rep{r}tok' AS text,"
            " * EXCLUDE (doc_id, text) FROM src"
        ),
        "embeddings": rep_union(
            "SELECT vec_id + {off} AS vec_id,"
            " list_prepend(embedding[1] + {r} * 0.001,"
            "              embedding[2:]) AS embedding,"
            " * EXCLUDE (vec_id, embedding) FROM src"
        ),
    }
    # small dims copied as-is (they broadcast regardless of sf)
    for t in ("region", "nation", "supplier", "part"):
        writes[t] = "SELECT * FROM src"

    for table, sql in writes.items():
        src_path = f"{src}/{table}.parquet"
        if not os.path.exists(src_path):
            print(f"skip {table} (no {src_path})")
            continue
        con.execute(f"CREATE OR REPLACE VIEW src AS FROM '{src_path}'")
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {rows} rows")


if __name__ == "__main__":
    main()
