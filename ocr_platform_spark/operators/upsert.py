"""Result-edit upsert: the MERGE INTO surface (SURVEY.md §2.7 U1–U3).

The reference's human-in-the-loop edits PATCH whole JSON columns
(detect boxes: ``routes_jobs.py:230-249``; result text edit / block
delete: ``json-editor.component.ts:186-207`` + ``routes_jobs.py:252-270``).
The engine-side equivalents:

* :func:`apply_span_edits` — relational application of an edits table
  (``doc_id, offset, op, new_text``) onto the ``spans`` array column:
  ``edit`` rewrites a span's text, ``delete`` removes the span and
  re-sequences the remaining offsets. Pure higher-order array ops on a
  per-doc map — no explode/regroup round trip.
* :func:`upsert_results` — the Iceberg ``MERGE INTO`` fallback for the
  hash-bucketed parquet output of :mod:`ocr_platform_spark.lineage`:
  recompute the edited docs' buckets, rewrite exactly those partitions
  via dynamic partition overwrite (untouched buckets' files are never
  rewritten), mirroring the chunk-commit idempotence of the main job.

At 10^12 docs with Iceberg this becomes a real ``MERGE INTO ... WHEN
MATCHED`` on the output table; the edits table is tiny (human edits) so
the merge broadcasts it — same shape as here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..lineage import with_partition_id

OP_EDIT = "edit"
OP_DELETE = "delete"


def apply_span_edits(documents_out: DataFrame, edits: DataFrame) -> DataFrame:
    """Apply span-level edits to ``(doc_id, spans)`` rows.

    ``edits``: ``doc_id, offset:int, op:string('edit'|'delete'),
    new_text:string`` (new_text ignored for deletes). Unknown doc_ids /
    offsets are no-ops. Surviving spans are re-sequenced ``0..n-1`` like
    the FE's splice (``json-editor.component.ts:199-203``).

    Conflicting edits for the same ``(doc_id, offset)`` resolve
    deterministically — ``delete`` beats ``edit``, then lexicographically
    greatest ``new_text`` — instead of aborting the job on the duplicate
    map key.
    """
    w = Window.partitionBy("doc_id", "offset").orderBy(
        (F.col("op") == OP_DELETE).desc(), F.col("new_text").desc_nulls_last()
    )
    edits = (
        edits.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    per_doc = edits.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("offset"),
                    F.struct(F.col("op"), F.col("new_text")),
                )
            )
        ).alias("edit_map")
    )
    joined = documents_out.join(F.broadcast(per_doc), "doc_id", "left")
    e = lambda s: F.element_at("edit_map", s["offset"])  # noqa: E731
    edited = F.transform(
        "spans",
        lambda s: F.when(
            e(s).isNotNull() & (e(s)["op"] == OP_EDIT),
            F.struct(
                s["kind"].alias("kind"),
                e(s)["new_text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).otherwise(s),
    )
    kept = F.filter(
        edited,
        lambda s: F.when(
            e(s).isNotNull() & (e(s)["op"] == OP_DELETE), F.lit(False)
        ).otherwise(F.lit(True)),
    )
    resequenced = F.transform(
        kept,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return joined.select(
        "doc_id",
        F.when(F.col("edit_map").isNotNull(), resequenced)
        .otherwise(F.col("spans"))
        .alias("spans"),
    )


def _staging_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_upsert_staging")


def _publish_staging(spark: SparkSession, staging: str, data_dir: str) -> None:
    (
        spark.read.parquet(staging)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_id")
        .parquet(data_dir)
    )


def recover_pending_upsert(spark: SparkSession, out_dir: str) -> bool:
    """Make the stage-then-publish recovery story executable: if a previous
    upsert crashed *after* staging completed (``_SUCCESS`` marker present)
    but before/while publishing, re-publish the staged buckets (dynamic
    overwrite is idempotent); if the crash happened mid-staging (no
    marker), the staged copy is garbage and the data dir is still the
    pre-upsert state — drop it. Returns True if staged buckets were
    re-published."""
    import shutil

    staging = _staging_dir(out_dir)
    if not os.path.isdir(staging):
        return False
    complete = os.path.exists(os.path.join(staging, "_SUCCESS"))
    if complete:
        _publish_staging(spark, staging, os.path.join(out_dir, "data"))
    shutil.rmtree(staging)
    return complete


def upsert_results(
    spark: SparkSession,
    out_dir: str,
    edits: DataFrame,
    num_buckets: int,
    sink=None,
) -> int:
    """MERGE the edits into the bucketed extraction output at
    ``out_dir``/data; rewrites only the buckets containing edited docs.
    Returns the number of rewritten buckets.

    Entry first heals any leftover staging from a crashed upsert
    (:func:`recover_pending_upsert`); a successful publish removes its
    own staging copy.

    ``sink`` is the Iceberg seam (:class:`ocr_platform_spark.iceberg.
    IcebergSink`): when set, the edited docs are read from the Iceberg
    table and published as ONE atomic ``MERGE INTO ... WHEN MATCHED``
    statement — no staging, no dynamic-overwrite dance."""
    import shutil

    if sink is not None:
        # same return contract as the parquet path: the number of hash
        # buckets the edited docs fall into (Iceberg rewrites per-file,
        # but callers key monitoring/assertions on the bucket count)
        target = edits.select("doc_id").distinct()
        current = spark.table(sink.qualified).join(
            F.broadcast(target), "doc_id"
        )
        merged = apply_span_edits(current, edits)
        sink.merge(merged)
        return (
            with_partition_id(target, num_buckets)
            .select("partition_id").distinct().count()
        )

    recover_pending_upsert(spark, out_dir)
    data_dir = os.path.join(out_dir, "data")
    touched = [
        r["partition_id"]
        for r in with_partition_id(
            edits.select("doc_id").distinct(), num_buckets
        ).select("partition_id").distinct().collect()
    ]
    if not touched:
        return 0
    current = spark.read.parquet(data_dir).filter(
        F.col("partition_id").isin(touched)
    )
    merged = apply_span_edits(current.drop("partition_id"), edits)
    # stage-then-publish: materialize the merged buckets to a staging dir
    # first, so a crash during the (non-atomic on plain parquet) dynamic
    # overwrite leaves a durable copy to re-publish from. With Iceberg the
    # whole thing is one atomic MERGE INTO and the staging step disappears.
    staging = _staging_dir(out_dir)
    with_partition_id(merged, num_buckets).write.mode("overwrite").parquet(
        staging
    )
    _publish_staging(spark, staging, data_dir)
    shutil.rmtree(staging)  # publish succeeded — the durable copy is data/
    return len(touched)
