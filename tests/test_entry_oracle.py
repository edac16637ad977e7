"""Local mirror of the driver's CORRECTNESS gate: every REGISTRY query
with an oracle must match DuckDB on the same parquet tables (row count +
columns + order-insensitive values); rows-only queries must run and
return a stable schema.

Uses sf0.001 for speed; the driver runs the same compare at sf0.01.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ocr_platform_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _canon(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        # rows-only contract: runs, stable non-empty schema
        assert len(sdf.schema.fields) > 0
        return
    if callable(sql):  # lazy oracle (mirrors __spark_entry__.oracle_sql)
        sql = sql()
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"{name}: rowcount mismatch"
    assert sorted(sdf.columns) == sorted(dcols), f"{name}: column mismatch"
    assert _key(srows, sdf.columns) == _key(drows, dcols), (
        f"{name}: value mismatch"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "doc_id", "pos", "kind", "text", "media_ref", "offset"
    }
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)
