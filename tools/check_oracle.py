"""Local mirror of the driver's CORRECTNESS gate.

Runs each REGISTRY query on Spark and its oracle SQL on DuckDB over the
same parquet tables, compares row count + column names + order-insensitive
values (sorted-rows compare with canonical stringification).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ocr_platform_spark.queries import REGISTRY
from ocr_platform_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = []
    for name in names:
        fn, sql = REGISTRY[name]
        if callable(sql):
            sql = sql()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            failures.append(name)
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"cols spark={scols} duck={dcols}")
        if not status:
            sk, dk = rows_key(srows, scols), rows_key(drows, dcols)
            if sk != dk:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sk, dk)) if a != b),
                    min(len(sk), len(dk)),
                )
                status.append(
                    f"values differ at sorted row {diff}: "
                    f"spark={sk[diff] if diff < len(sk) else '<none>'} "
                    f"duck={dk[diff] if diff < len(dk) else '<none>'}"
                )
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    spark.stop()
    if failures:
        print("FAILURES:", ", ".join(failures))
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
