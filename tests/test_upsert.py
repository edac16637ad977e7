"""Upsert surface (U1–U3): span edit/delete application + bucketed
MERGE that rewrites only affected partitions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_platform_spark import corpus, schemas
from ocr_platform_spark.lineage import run_extract_job, read_result
from ocr_platform_spark.operators.upsert import apply_span_edits, upsert_results


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, schema=schemas.DOCUMENTS)


def test_apply_span_edits_edit_and_delete(spark):
    rows = [
        {
            "doc_id": "a",
            "spans": [
                {"kind": "text", "text": "one", "media_ref": None, "offset": 0},
                {"kind": "text", "text": "two", "media_ref": "m", "offset": 1},
                {"kind": "text", "text": "three", "media_ref": None, "offset": 2},
            ],
        },
        {
            "doc_id": "b",
            "spans": [
                {"kind": "text", "text": "keep", "media_ref": None, "offset": 0}
            ],
        },
    ]
    docs = _docs_df(spark, rows)
    edits = spark.createDataFrame(
        [
            ("a", 0, "edit", "ONE!"),
            ("a", 1, "delete", None),
            ("zz", 0, "edit", "ignored"),  # unknown doc: no-op
        ],
        "doc_id string, offset int, op string, new_text string",
    )
    got = {r["doc_id"]: r["spans"] for r in apply_span_edits(docs, edits).collect()}
    a = [(s["text"], s["media_ref"], s["offset"]) for s in got["a"]]
    assert a == [("ONE!", None, 0), ("three", None, 1)]
    b = [(s["text"], s["offset"]) for s in got["b"]]
    assert b == [("keep", 0)]


def test_conflicting_edits_resolve_deterministically(spark):
    """Duplicate (doc_id, offset) edits must not abort the job: delete
    beats edit, then greatest new_text wins."""
    rows = [
        {
            "doc_id": "a",
            "spans": [
                {"kind": "text", "text": "one", "media_ref": None, "offset": 0},
                {"kind": "text", "text": "two", "media_ref": None, "offset": 1},
            ],
        }
    ]
    docs = _docs_df(spark, rows)
    edits = spark.createDataFrame(
        [
            ("a", 0, "edit", "AAA"),
            ("a", 0, "delete", None),   # delete wins over edit
            ("a", 1, "edit", "BBB"),
            ("a", 1, "edit", "CCC"),    # greatest new_text wins
        ],
        "doc_id string, offset int, op string, new_text string",
    )
    got = {r["doc_id"]: r["spans"] for r in apply_span_edits(docs, edits).collect()}
    assert [(s["text"], s["offset"]) for s in got["a"]] == [("CCC", 0)]


def test_upsert_results_rewrites_only_touched_buckets(spark, tmp_path):
    docs, media = corpus.generate(20, seed=31, max_pages=4)
    docs_df = _docs_df(spark, docs)
    media_df = spark.createDataFrame(
        [{"media_ref": k, **v} for k, v in sorted(media.items())],
        schema=schemas.MEDIA,
    )
    out = str(tmp_path / "out")
    run_extract_job(
        spark, docs_df, media_df, out_dir=out, run_id="r1", num_buckets=8,
        chunk_buckets=8,
    )
    before = {
        r["doc_id"]: [(s["text"], s["offset"]) for s in r["spans"]]
        for r in read_result(spark, out).collect()
    }
    target = sorted(before)[0]
    edits = spark.createDataFrame(
        [(target, 0, "edit", "EDITED")],
        "doc_id string, offset int, op string, new_text string",
    )
    n = upsert_results(spark, out, edits, num_buckets=8)
    assert n >= 1
    after = {
        r["doc_id"]: [(s["text"], s["offset"]) for s in r["spans"]]
        for r in read_result(spark, out).collect()
    }
    assert set(after) == set(before)
    assert after[target][0] == ("EDITED", 0)
    assert after[target][1:] == before[target][1:]
    for d in before:
        if d != target:
            assert after[d] == before[d]
    # untouched bucket files not rewritten: at least one partition dir
    # retains its original file set
    data = os.path.join(out, "data")
    parts = [p for p in os.listdir(data) if p.startswith("partition_id=")]
    assert len(parts) > 1


def test_upsert_staging_cleanup_and_crash_recovery(spark, tmp_path):
    from ocr_platform_spark.operators import upsert as upsert_mod

    docs, media = corpus.generate(16, seed=35, max_pages=3)
    docs_df = _docs_df(spark, docs)
    media_df = spark.createDataFrame(
        [{"media_ref": k, **v} for k, v in sorted(media.items())],
        schema=schemas.MEDIA,
    )
    out = str(tmp_path / "out")
    run_extract_job(
        spark, docs_df, media_df, out_dir=out, run_id="r1", num_buckets=8,
        chunk_buckets=8,
    )
    target = sorted(
        r["doc_id"] for r in read_result(spark, out).select("doc_id").collect()
    )[0]
    edits = spark.createDataFrame(
        [(target, 0, "edit", "EDITED")],
        "doc_id string, offset int, op string, new_text string",
    )

    # 1. a successful upsert leaves no staging behind
    upsert_results(spark, out, edits, num_buckets=8)
    staging = upsert_mod._staging_dir(out)
    assert not os.path.exists(staging)

    # 2. crash between staging and publish: stage a second edit manually
    # (exactly what upsert_results writes), skip the publish
    edits2 = spark.createDataFrame(
        [(target, 0, "edit", "EDITED-TWICE")],
        "doc_id string, offset int, op string, new_text string",
    )
    from ocr_platform_spark.lineage import with_partition_id
    from ocr_platform_spark.operators.upsert import apply_span_edits as ase

    touched_pid = with_partition_id(
        edits2.select("doc_id").distinct(), 8
    ).select("partition_id").first()["partition_id"]
    current = spark.read.parquet(os.path.join(out, "data")).filter(
        f"partition_id = {touched_pid}"
    )
    staged = ase(current.drop("partition_id"), edits2)
    with_partition_id(staged, 8).write.mode("overwrite").parquet(staging)
    assert os.path.exists(os.path.join(staging, "_SUCCESS"))

    # recovery re-publishes the completed staging and removes it
    assert upsert_mod.recover_pending_upsert(spark, out) is True
    assert not os.path.exists(staging)
    got = {
        r["doc_id"]: [(s["text"], s["offset"]) for s in r["spans"]]
        for r in read_result(spark, out).collect()
    }
    assert got[target][0] == ("EDITED-TWICE", 0)

    # 3. crash mid-staging (no _SUCCESS): recovery drops the garbage copy
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")
    assert upsert_mod.recover_pending_upsert(spark, out) is False
    assert not os.path.exists(staging)
    after = {
        r["doc_id"]: [(s["text"], s["offset"]) for s in r["spans"]]
        for r in read_result(spark, out).collect()
    }
    assert after == got
