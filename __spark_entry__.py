"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship OCR-extraction pipeline; ``queries`` /
``oracle_sql`` expose every implemented operator (SURVEY.md §2 + the
training-data-pipeline set) for the DuckDB side-by-side correctness gate.
All logic lives in :mod:`ocr_platform_spark`; this file is wiring only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark import corpus as corpus_mod
from ocr_platform_spark import schemas
from ocr_platform_spark.operators import extract
from ocr_platform_spark.queries import REGISTRY

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: end-to-end OCR extraction over an interleaved
    text+media documents table (BASELINE input_hint shape).

    Input = a deterministic synthetic interleaved corpus (the input_hint
    table must carry media spans, which the flat testdata ``documents``
    table does not) UNIONED with the sf0.001 ``documents`` parquet rows
    lifted into the same shape (one text span each) — so the driver's
    smoke check exercises both the real testdata scan and the media path.
    """
    docs, media = corpus_mod.generate(24, max_pages=8)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_rows = [{"media_ref": k, **v} for k, v in sorted(media.items())]
    media_df = spark.createDataFrame(media_rows, schema=schemas.MEDIA)

    flat = spark.read.parquet(f"{_SF0001}/documents.parquet")
    lifted = flat.select(
        F.concat(F.lit("tdoc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    documents = docs_df.unionByName(lifted)

    out = extract.extract_documents(documents, media_df)
    return out.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; extraction
    and multimodal pipelines are rows-only (pinned exactly by pytest
    against the single-node oracle instead). Callable slots are lazy
    oracle builders (expensive derivations, e.g. source_map_blocks runs
    the single-node OCR oracle once) — resolved here."""
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_fn, sql) in REGISTRY.items()
        if sql
    }
