"""Local stand-in for the driver's correctness gate: run every queries() entry
in Spark AND its oracle_sql() twin in DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value comparison.

Usage: PYTHONPATH=/root/repo python tools/parity_check.py [names...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from crawler_service_spark.session import get_spark

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()) if v != 0 else "0")
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return (type(v).__name__[:1], v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(names=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark("parity", cpus=8, shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and rowset(
            [tuple(r) for r in srows], [c.lower() for c in scols]
        ) == rowset(drows, dcols)
        status = "OK   " if (ok_cols and ok_count and ok_vals) else "FAIL "
        print(
            f"{status}{name}: rows {len(srows)}/{len(drows)} cols={ok_cols} vals={ok_vals} "
            f"[{time.monotonic()-t0:.1f}s]"
        )
        if status.startswith("FAIL"):
            failed.append(name)
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
            elif ok_count:
                a = rowset([tuple(r) for r in srows], [c.lower() for c in scols])
                b = rowset(drows, dcols)
                for x, y in zip(a, b):
                    if x != y:
                        print(f"   first diff:\n    spark {x}\n    duck  {y}")
                        break
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
