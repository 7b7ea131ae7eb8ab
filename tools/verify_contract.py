#!/usr/bin/env python
"""Driver-style contract check: run every __spark_entry__ query on Spark
and its oracle SQL on DuckDB at sf0.01, compare row count + sorted column
names + an order-insensitive bit-exact value hash (floats as big-endian
IEEE hex bits) — the same bar as the external driver's CORRECTNESS gate.

Usage: python tools/verify_contract.py [name ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return struct.pack(">d", v).hex()
    if isinstance(v, bool):
        return "b" + str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return "x" + bytes(v).hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from document_retrieval_system_spark.session import get_spark

    spark = get_spark("verify-contract", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    queries = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_rows_only = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = [str(d[1]) for d in res.description]
            orows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        bad_types = [t for t in otypes if t in ("HUGEINT", "DECIMAL") or t.startswith("DECIMAL")]
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems and table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("value hash mismatch")
        if bad_types:
            problems.append(f"oracle output types {bad_types} (driver hash hazard)")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} PASS, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
