"""Resume/lineage tests (SURVEY.md §5 item 4): kill after k chunks, re-run,
converge with no duplicates and output identical to a single uninterrupted run."""

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark import lineage


@pytest.fixture(scope="module")
def io(spark, corpus_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media.parquet")
    return spark, docs, media, tmp_path_factory


def _collect_result(spark, out_dir):
    rows = lineage.read_result(spark, str(out_dir)).collect()
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }


def test_kill_and_resume_converges(io):
    spark, docs, media, tmp = io
    ref_dir = tmp.mktemp("ref_run")
    lineage.run_extract_job(
        spark, docs, media, str(ref_dir), "run-a", num_buckets=8, chunk_buckets=8
    )
    reference = _collect_result(spark, ref_dir)

    out_dir = tmp.mktemp("resumed_run")
    # "kill" after 1 of 4 chunks
    n1 = lineage.run_extract_job(
        spark, docs, media, str(out_dir), "run-b",
        num_buckets=8, chunk_buckets=2, max_chunks=1,
    )
    assert n1 == 1
    done_after_kill = lineage.completed_buckets(spark, f"{out_dir}/lineage", "run-b")
    assert len(done_after_kill) <= 2
    # resume: only remaining chunks run
    n2 = lineage.run_extract_job(
        spark, docs, media, str(out_dir), "run-b", num_buckets=8, chunk_buckets=2
    )
    assert n2 == 3
    assert _collect_result(spark, out_dir) == reference

    lin = spark.read.parquet(f"{out_dir}/lineage").filter(F.col("run_id") == "run-b")
    # no duplicate lineage rows per bucket
    assert lin.count() == lin.select("partition_id").distinct().count()
    assert lin.agg(F.sum("doc_count")).first()[0] == docs.count()


def test_rerun_after_completion_is_noop(io):
    spark, docs, media, tmp = io
    out_dir = tmp.mktemp("noop_run")
    lineage.run_extract_job(
        spark, docs, media, str(out_dir), "run-c", num_buckets=4, chunk_buckets=2
    )
    before = spark.read.parquet(f"{out_dir}/lineage").count()
    executed = lineage.run_extract_job(
        spark, docs, media, str(out_dir), "run-c", num_buckets=4, chunk_buckets=2
    )
    assert executed == 0
    assert spark.read.parquet(f"{out_dir}/lineage").count() == before


def test_checksums_stable_across_runs(io):
    """Bucket checksums are order-insensitive across tasks: two independent
    runs at different chunking produce identical per-bucket checksums."""
    spark, docs, media, tmp = io
    a, b = tmp.mktemp("chk_a"), tmp.mktemp("chk_b")
    lineage.run_extract_job(spark, docs, media, str(a), "r", num_buckets=4, chunk_buckets=4)
    lineage.run_extract_job(spark, docs, media, str(b), "r", num_buckets=4, chunk_buckets=1)
    ca = {
        (r["partition_id"]): (r["doc_count"], r["span_checksum"])
        for r in spark.read.parquet(f"{a}/lineage").collect()
    }
    cb = {
        (r["partition_id"]): (r["doc_count"], r["span_checksum"])
        for r in spark.read.parquet(f"{b}/lineage").collect()
    }
    assert ca == cb


def test_sparse_corpus_converges_with_empty_buckets(io):
    """Regression: with more buckets than occupied ones, empty buckets must
    still commit (doc_count=0) lineage rows — previously they never did,
    so a completed run re-executed chunks for them on every re-invocation
    and resume never converged."""
    spark, docs, media, tmp = io
    few = docs.limit(5)
    out_dir = tmp.mktemp("sparse_run")
    lineage.run_extract_job(
        spark, few, media, str(out_dir), "run-s", num_buckets=64, chunk_buckets=16
    )
    lin = spark.read.parquet(f"{out_dir}/lineage").filter(F.col("run_id") == "run-s")
    # every bucket committed exactly once, occupied or not
    assert lin.select("partition_id").distinct().count() == 64
    assert lin.count() == 64
    assert lin.agg(F.sum("doc_count")).first()[0] == 5
    # re-run is a true no-op
    executed = lineage.run_extract_job(
        spark, few, media, str(out_dir), "run-s", num_buckets=64, chunk_buckets=16
    )
    assert executed == 0


def test_out_dir_reuse_across_run_ids_no_stale_rows(io):
    """A bucket that lands rows in run A but ZERO rows in run B (same
    out_dir) must not leak run-A rows into run B's output or lineage:
    dynamic overwrite alone leaves the stale partition dir in place, so
    run_extract_job clears each chunk's dirs before the write."""
    spark, docs, media, tmp = io
    out_dir = tmp.mktemp("reuse_run")
    lineage.run_extract_job(
        spark, docs, media, str(out_dir), "run-a", num_buckets=4, chunk_buckets=4
    )
    full = _collect_result(spark, out_dir)

    # run B: keep only the docs of ONE bucket -> the other 3 buckets land
    # zero rows and their run-A dirs must be cleared, not re-checksummed
    pid = lineage.with_partition_id(docs, 4)
    keep_bucket = pid.select("partition_id").first()[0]
    subset = pid.filter(F.col("partition_id") == keep_bucket).drop("partition_id")
    lineage.run_extract_job(
        spark, subset, media, str(out_dir), "run-b", num_buckets=4, chunk_buckets=4
    )

    got = _collect_result(spark, out_dir)
    expected_ids = {r["doc_id"] for r in subset.select("doc_id").collect()}
    assert set(got) == expected_ids  # no stale run-A docs survive
    assert {k: v for k, v in full.items() if k in expected_ids} == got

    lin = spark.read.parquet(f"{out_dir}/lineage").filter(F.col("run_id") == "run-b")
    by_bucket = {r["partition_id"]: r["doc_count"] for r in lin.collect()}
    assert by_bucket[keep_bucket] == len(expected_ids)
    for b, n in by_bucket.items():
        if b != keep_bucket:
            assert n == 0  # empty-bucket sentinel, not stale run-A counts
