"""Iceberg seam: the catalog can't run in this sandbox, so the tests pin
(a) the generated MERGE INTO SQL, (b) identifier validation, and (c) that
run_extract_job actually routes chunk commits through a sink — using a
fake sink whose write_chunk is the parquet dynamic overwrite, which must
produce byte-identical results to the default path."""

from __future__ import annotations

import os

import pytest

from ocr_platform_spark import corpus, schemas
from ocr_platform_spark.iceberg import IcebergSink
from ocr_platform_spark.lineage import read_result, run_extract_job


class ParquetFakeSink:
    """Duck-typed sink shared by the seam tests: commits chunks the way
    the parquet fallback does, but through the sink interface — proving
    run_extract_job's routing for both seam methods."""

    def __init__(self, data_dir):
        self.data_dir = data_dir
        self.chunks = 0
        self.deleted = []

    def write_chunk(self, out_pid):
        self.chunks += 1
        (
            out_pid.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id")
            .parquet(self.data_dir)
        )

    def delete_partitions(self, spark, buckets):
        import shutil

        self.deleted += list(buckets)
        for b in buckets:
            d = os.path.join(self.data_dir, f"partition_id={b}")
            if os.path.isdir(d):
                shutil.rmtree(d)


def test_merge_sql_shape():
    sink = IcebergSink("ice", "prod", "documents_out")
    sql = sink.merge_sql("edits_v")
    assert sql == (
        "MERGE INTO ice.prod.documents_out t\n"
        "USING edits_v u\n"
        "ON t.doc_id = u.doc_id\n"
        "WHEN MATCHED THEN UPDATE SET t.spans = u.spans"
    )


def test_identifiers_validated():
    with pytest.raises(ValueError):
        IcebergSink("ice", "prod", "t; DROP TABLE x").qualified
    with pytest.raises(ValueError):
        IcebergSink("ice", "prod", "t").merge_sql("bad view")


def test_run_extract_job_routes_chunks_through_sink(spark, tmp_path):
    docs, media = corpus.generate(12, seed=44, max_pages=3)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(
        [{"media_ref": k, **v} for k, v in sorted(media.items())],
        schema=schemas.MEDIA,
    )

    out_a = str(tmp_path / "default")
    out_b = str(tmp_path / "sinked")
    run_extract_job(
        spark, docs_df, media_df, out_dir=out_a, run_id="r", num_buckets=4,
        chunk_buckets=2,
    )
    sink = ParquetFakeSink(os.path.join(out_b, "data"))
    n = run_extract_job(
        spark, docs_df, media_df, out_dir=out_b, run_id="r", num_buckets=4,
        chunk_buckets=2, sink=sink,
    )
    assert sink.chunks == n > 0
    a = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in read_result(spark, out_a).collect()
    }
    b = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in read_result(spark, out_b).collect()
    }
    assert a == b


def test_write_chunk_builds_overwrite_partitions_plan(spark):
    """Plan-level coverage of the chunk-commit seam method (the catalog
    itself can't run here). Two layers:

    (a) call shape — write_chunk must route through
        DataFrame.writeTo(<qualified>).overwritePartitions(), nothing else;
    (b) real plan construction — invoking it on a real DataFrame builds
        the V2 OverwritePartitionsDynamic plan and reaches the ANALYZER,
        failing only at catalog resolution (the `ice` catalog is not
        configured in-sandbox), not at plan construction.
    """
    sink = IcebergSink("ice", "prod", "documents_out")

    calls = {}

    class FakeWriter:
        def overwritePartitions(self):
            calls["overwrite"] = True

    class FakeDF:
        def writeTo(self, table):
            calls["table"] = table
            return FakeWriter()

    sink.write_chunk(FakeDF())
    assert calls == {"table": "ice.prod.documents_out", "overwrite": True}

    from pyspark.errors import AnalysisException

    df = spark.range(3).selectExpr(
        "cast(id as string) as doc_id", "cast(id as int) as partition_id"
    )
    with pytest.raises(AnalysisException) as ei:
        sink.write_chunk(df)
    # failure is catalog RESOLUTION (unconfigured `ice` falls through to
    # spark_catalog's single-part-namespace rule) — proving the analyzer
    # consumed the constructed overwritePartitions plan
    assert "ice" in str(ei.value)


def test_merge_and_delete_sql_shapes():
    sink = IcebergSink("ice", "prod", "documents_out")
    assert sink.delete_partitions_sql([3, 1]) == (
        "DELETE FROM ice.prod.documents_out WHERE partition_id IN (3, 1)"
    )
    with pytest.raises(ValueError, match="bucket"):
        sink.delete_partitions_sql([])


def test_sink_reuse_across_run_ids_deletes_empty_buckets(spark, tmp_path):
    """Iceberg-path twin of test_resume's out_dir-reuse test: a bucket
    that lands zero rows in run B must have its prior-run partition
    DELETEd (overwritePartitions alone leaves it in the table)."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.lineage import with_partition_id

    docs, media = corpus.generate(16, seed=45, max_pages=3)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(
        [{"media_ref": k, **v} for k, v in sorted(media.items())],
        schema=schemas.MEDIA,
    )

    out = str(tmp_path / "sink_reuse")
    sink = ParquetFakeSink(os.path.join(out, "data"))
    run_extract_job(
        spark, docs_df, media_df, out_dir=out, run_id="ra", num_buckets=4,
        chunk_buckets=4, sink=sink,
    )
    assert sink.deleted == []  # full corpus: every bucket has docs

    pid = with_partition_id(docs_df, 4)
    keep = pid.select("partition_id").first()[0]
    subset = pid.filter(F.col("partition_id") == keep).drop("partition_id")
    run_extract_job(
        spark, subset, media_df, out_dir=out, run_id="rb", num_buckets=4,
        chunk_buckets=4, sink=sink,
    )
    assert sorted(sink.deleted) == sorted(b for b in range(4) if b != keep)
    got = {r["doc_id"] for r in read_result(spark, out).collect()}
    assert got == {r["doc_id"] for r in subset.select("doc_id").collect()}
