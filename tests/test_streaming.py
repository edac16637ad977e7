"""Streaming ingestion: the file-stream drain must produce exactly the
batch pipeline's output (same span sequences), across multiple
micro-batches, with one lineage row per batch."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_platform_spark import corpus, streaming
from ocr_platform_spark.corpus import DOCUMENTS_SCHEMA, MEDIA_SCHEMA
from ocr_platform_spark.operators.extract import extract_documents


def _spans_by_doc(df):
    rows = df.collect()
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in rows
    }


def test_stream_drain_equals_batch(spark, tmp_path):
    docs, media = corpus.generate(20, seed=11, max_pages=6)
    landing = tmp_path / "landing"
    landing.mkdir()
    # three landing files -> with maxFilesPerTrigger=1, three micro-batches
    for i in range(3):
        chunk = docs[i * 7 : (i + 1) * 7]
        if chunk:
            pq.write_table(
                pa.Table.from_pylist(chunk, schema=DOCUMENTS_SCHEMA),
                str(landing / f"part-{i}.parquet"),
            )
    media_rows = [{"media_ref": k, **v} for k, v in sorted(media.items())]
    media_path = tmp_path / "media.parquet"
    pq.write_table(
        pa.Table.from_pylist(media_rows, schema=MEDIA_SCHEMA), str(media_path)
    )
    media_df = spark.read.parquet(str(media_path))

    out_dir = str(tmp_path / "out")
    batches: list[tuple[int, int]] = []
    q = streaming.stream_extract(
        spark,
        str(landing),
        media_df,
        out_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        on_batch=lambda bid, n: batches.append((bid, n)),
    )
    q.awaitTermination()

    assert len(batches) == 3
    assert sum(n for _, n in batches) == len(docs)

    streamed = spark.read.parquet(os.path.join(out_dir, "data"))
    docs_df = spark.read.parquet(str(landing))
    expected = extract_documents(docs_df, media_df)
    assert _spans_by_doc(streamed) == _spans_by_doc(expected)

    lineage = spark.read.parquet(os.path.join(out_dir, "lineage"))
    assert lineage.count() == 3
    assert lineage.select("batch_id").distinct().count() == 3


def test_stream_resume_no_duplicates(spark, tmp_path):
    """A restarted stream (same checkpoint) must not reprocess drained
    files; newly landed files are picked up exactly once."""
    docs, media = corpus.generate(10, seed=13, max_pages=4)
    landing = tmp_path / "landing"
    landing.mkdir()
    pq.write_table(
        pa.Table.from_pylist(docs[:5], schema=DOCUMENTS_SCHEMA),
        str(landing / "part-0.parquet"),
    )
    media_rows = [{"media_ref": k, **v} for k, v in sorted(media.items())]
    media_path = tmp_path / "media.parquet"
    pq.write_table(
        pa.Table.from_pylist(media_rows, schema=MEDIA_SCHEMA), str(media_path)
    )
    media_df = spark.read.parquet(str(media_path))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = streaming.stream_extract(
        spark, str(landing), media_df, out_dir, checkpoint_dir=ckpt
    )
    q.awaitTermination()
    first = spark.read.parquet(os.path.join(out_dir, "data")).count()
    assert first == 5

    # land more files, "restart" the stream with the same checkpoint
    pq.write_table(
        pa.Table.from_pylist(docs[5:], schema=DOCUMENTS_SCHEMA),
        str(landing / "part-1.parquet"),
    )
    q2 = streaming.stream_extract(
        spark, str(landing), media_df, out_dir, checkpoint_dir=ckpt
    )
    q2.awaitTermination()
    out = spark.read.parquet(os.path.join(out_dir, "data"))
    assert out.count() == 10
    assert out.select("doc_id").distinct().count() == 10
