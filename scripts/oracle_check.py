"""Grade declared queries against the DuckDB oracle — the same
compare as tests/test_oracle_overflow.py (rows, columns,
order-insensitive normalized values) — at an arbitrary SF dir.

Usage: python scripts/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from notjusthtml_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-check",
        master=f"local[{args.cpus}]",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    oracles = entry.oracle_sql()
    names = args.names or list(oracles)
    failed = []
    for name in names:
        sdf = entry.queries()[name](spark, args.sf)
        srows, scols = sdf.collect(), sdf.columns
        ddf = con.sql(oracles[name])
        drows = ddf.fetchall()
        dcols = [c[0] for c in ddf.description]
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and len(srows) > 0
            and _key(srows, scols) == _key(drows, dcols)
        )
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(srows)} rows)")
        if not ok:
            failed.append(name)
            sk, dk = _key(srows, scols), _key(drows, dcols)
            for a, b in [(a, b) for a, b in zip(sk, dk) if a != b][:3]:
                print("  spark:", a)
                print("  duck: ", b)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
