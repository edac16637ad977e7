"""Shared source-composition shape: parallel per-document span arrays
-> the engine's interleaved ``(documents, media)`` input tables.

Every part-walk ingestion source (mbox messages, office containers)
parses its documents into the same PARALLEL-ARRAY row shape — ``kinds``
/ ``texts`` / ``ctypes`` / ``fnames`` / ``payloads``, one slot per span
in part order — and the corpus composition over it is identical: a
``transform`` builds the spans array (text slots keep their text, media
slots get a ``doc_id#p<i>`` ref), a ``posexplode`` emits the media
table. Both are pure column expressions, so the composition is
shuffle-FREE: a document's spans never leave their task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parts_frame_to_corpus"]


def parts_frame_to_corpus(
    parts: DataFrame, single_parse: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Filtered parts rows (``doc_id`` + the parallel span arrays) ->
    ``(documents, media)`` in the interleaved input shape.

    ``single_parse=True`` persists the parts frame (``MEMORY_AND_DISK``)
    so the two consumer legs materialize the upstream parse ONCE instead
    of once per leg. The cache is plan-keyed in Spark's CacheManager and
    is NOT GC-cleaned; drivers looping many corpora should
    ``spark.catalog.clearCache()`` between runs or keep the default."""
    if single_parse:
        from pyspark import StorageLevel

        parts = parts.persist(StorageLevel.MEMORY_AND_DISK)
    spans = F.transform(
        "kinds",
        lambda kind, i: F.struct(
            kind.alias("kind"),
            F.element_at(F.col("texts"), i + 1).alias("text"),
            F.when(kind == "media",
                   F.concat(F.col("doc_id"), F.lit("#p"),
                            i.cast("string"))).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    documents = parts.select("doc_id", spans.alias("spans"))
    media = (
        parts
        .select("doc_id", F.posexplode(
            F.arrays_zip("kinds", "ctypes", "fnames", "payloads")
        ).alias("pos", "z"))
        .filter(F.col("z.kinds") == "media")
        .select(
            F.concat("doc_id", F.lit("#p"),
                     F.col("pos").cast("string")).alias("media_ref"),
            F.col("z.ctypes").alias("content_type"),
            F.col("z.fnames").alias("filename"),
            F.col("z.payloads").alias("data"),
            F.lit(None).cast("int").alias("page_count"),
        )
    )
    return documents, media
