"""Local mirror of the driver's CORRECTNESS gate.

Runs each REGISTRY query on Spark and its oracle SQL on DuckDB over the
same parquet tables, compares row count + column names + order-insensitive
values (sorted-rows compare with canonical stringification).

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a driver-schema artifact (rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err per query;
rows-only queries carry ``"rows_only": true`` and no oracle fields) — the
committed ``CORRECTNESS_LOCAL_rNN.json`` covering the queries past the
driver gate's 50-entry cap (VERDICT r3 next-round #3).
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
    import json

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = []
    report: dict[str, dict] = {}
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
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark error: {e}",
            }
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            report[name] = {
                "rows_only": True, "spark_rows": len(srows), "err": None,
            }
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb error: {str(e).splitlines()[0]}",
            }
            continue
        status = []
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = False
        if not rows_match:
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not schema_match:
            status.append(f"cols spark={scols} duck={dcols}")
        if not status:
            sk, dk = rows_key(srows, scols), rows_key(drows, dcols)
            hash_match = sk == dk
            if not hash_match:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sk, dk)) if a != b),
                    min(len(sk), len(dk)),
                )
                status.append(
                    f"values differ at sorted row {diff}: "
                    f"spark={sk[diff] if diff < len(sk) else '<none>'} "
                    f"duck={dk[diff] if diff < len(dk) else '<none>'}"
                )
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(status) or None,
        }
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    if failures:
        print("FAILURES:", ", ".join(failures))
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
