"""Structured Streaming ingestion for the extraction pipeline.

The reference has no streaming surface (SURVEY.md §2.9) — its Celery
queue is a backpressure buffer in front of batch workers. The Spark-native
analog of "documents keep arriving, workers drain the queue" is a file/
table stream: ``readStream`` over the documents table's landing directory,
micro-batches drained through the *same* batch pipeline via
``foreachBatch`` (the extraction plan needs windows + groupBy over the
whole micro-batch, which is exactly what foreachBatch provides), with the
sink append + per-batch lineage rows giving the same resumability story as
:mod:`ocr_platform_spark.lineage` — plus Spark's own streaming checkpoint
(WAL of processed files) for exactly-once file pickup.

Scale posture: at 10^12 docs the landing zone is an Iceberg table and this
becomes ``spark.readStream.format("iceberg")``; the micro-batch body is
unchanged. Trigger ``availableNow`` drains a backlog as a sequence of
bounded batches (the Celery-queue-drain analog); a processing-time trigger
runs continuous ingestion.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract import extract_documents
from .schemas import DOCUMENTS


def stream_extract(
    spark: SparkSession,
    landing_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    num_partitions: int | None = None,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Stream documents parquet from ``landing_dir`` through the extraction
    pipeline into ``out_dir`` (append), micro-batch lineage into
    ``out_dir``/lineage.

    Returns the started ``StreamingQuery``; with ``available_now`` the
    caller should ``awaitTermination()`` to drain the backlog.
    """
    reader = (
        spark.readStream.schema(DOCUMENTS)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)

    data_dir = os.path.join(out_dir, "data")
    lineage_dir = os.path.join(out_dir, "lineage")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        out = extract_documents(batch_df, media, num_partitions=num_partitions)
        out.write.mode("append").parquet(data_dir)
        wall = time.perf_counter() - t0
        lineage = batch_df.sparkSession.createDataFrame(
            [(int(batch_id), float(wall))], "batch_id long, wall_time_s double"
        ).withColumn("completed_at", F.current_timestamp())
        lineage.write.mode("append").parquet(lineage_dir)
        if on_batch is not None:
            on_batch(batch_id, batch_df.count())

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
