"""JSONL corpus source: the dominant LLM text-corpus interchange.

Web-scale text corpora (C4/Pile-style dumps, curated sub-corpora,
model-output collections) ship as line-delimited JSON — one document
object per line, usually ``{"text": ..., "id"/"url"/"meta": ...}``,
sharded as ``.jsonl`` / ``.jsonl.gz`` files. Unlike the archive
sources (WARC/tar/zip) nothing here needs tier extraction: the text is
already text. This source lands the files straight in the curation
frame shape ``(doc_id, text, source)`` + a quarantine frame of
unparseable lines.

Scale shape — deliberately ALL-declarative, no Python in the path:

* ``spark.read.text`` scans the lines (gzip inflates transparently,
  one task per ``.gz`` shard — the format's own parallel unit; plain
  ``.jsonl`` splits by range);
* ``F.from_json`` with an EXPLICIT schema parses each line JVM-side —
  no sampling/inference pass over 100 TB, no Python worker, and a
  malformed line degrades to a NULL struct instead of failing the job;
* quarantine = the same frame filtered the other way (file + raw
  line), so triage is a plan branch, not a second read.

Determinism: ``doc_id`` prefers the corpus' own id field
(``id_field``); without one it falls back to
``sha2(file '#' raw-line)``, so byte-identical duplicate lines within
one file share an id. The docs frame therefore de-duplicates on
``(doc_id, text)`` — deterministic (equal key implies equal bytes on
the fallback path) and faithful (a corpus-supplied id reused for
DIFFERENT text keeps both rows surfacing for triage rather than an
arbitrary pick). That distinct is the one shuffle this source pays;
it fronts work curation's exact-dedup would otherwise do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_jsonl_corpus", "jsonl_corpus"]


def read_jsonl_corpus(spark: SparkSession, paths: str,
                      text_field: str = "text",
                      id_field: str | None = None) -> DataFrame:
    """Raw lines + parsed struct: ``(src_file, line, j)`` where ``j``
    is the parsed ``{text_field, id_field}`` struct (NULL on malformed
    JSON). Building block for :func:`jsonl_corpus`."""
    fields = [f"`{text_field}` STRING"]
    if id_field:
        fields.append(f"`{id_field}` STRING")
    schema = ", ".join(fields)
    return (
        spark.read.text(paths)
        .select(
            F.input_file_name().alias("src_file"),
            F.col("value").alias("line"),
        )
        .withColumn("j", F.from_json("line", schema))
    )


def jsonl_corpus(spark: SparkSession, paths: str,
                 text_field: str = "text",
                 id_field: str | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """JSONL shards -> ``(docs, quarantine)``.

    ``docs``: ``(doc_id, text, source)`` — source is the shard file,
    the curation frame shape (:func:`..pipelines.curate_documents`
    consumes it directly). ``quarantine``: ``(src_file, line)`` for
    every non-blank line that failed to parse or carried no
    ``text_field`` — triage, never a job failure."""
    parsed = read_jsonl_corpus(spark, paths, text_field, id_field)
    has_text = F.col("j").isNotNull() \
        & F.col(f"j.{text_field}").isNotNull()
    if id_field:
        raw_id = F.col(f"j.{id_field}")
        doc_id = F.concat(
            F.lit("jsonl:"),
            F.when(raw_id.isNotNull(), raw_id).otherwise(
                F.sha2(F.concat_ws("#", "src_file", "line"), 256)),
        )
    else:
        doc_id = F.concat(F.lit("jsonl:"), F.sha2(
            F.concat_ws("#", "src_file", "line"), 256))
    docs = parsed.filter(has_text).select(
        doc_id.alias("doc_id"),
        F.col(f"j.{text_field}").alias("text"),
        F.col("src_file").alias("source"),
    ).dropDuplicates(["doc_id", "text"])
    quarantine = (
        parsed.filter(~has_text)
        .filter(F.length(F.trim("line")) > 0)
        .select("src_file", "line")
    )
    return docs, quarantine
