"""JSONL corpus source: the dominant LLM text-corpus interchange.

Web-scale text corpora (C4/Pile-style dumps, curated sub-corpora,
model-output collections) ship as line-delimited JSON — one document
object per line, usually ``{"text": ..., "id"/"url"/"meta": ...}``,
sharded as ``.jsonl`` / ``.jsonl.gz`` files. Unlike the archive
sources (WARC/tar/zip) nothing here needs tier extraction: the text is
already text. This source lands the files straight in the curation
frame shape ``(doc_id, text, source)`` + a quarantine frame of
unusable lines.

Scale shape — deliberately ALL-declarative, no Python in the path:

* ``spark.read.text`` scans the lines (gzip inflates transparently,
  one task per ``.gz`` shard — the format's own parallel unit; plain
  ``.jsonl`` splits by range), with a ``pathGlobFilter`` so a mixed
  directory's archives/READMEs never flood the quarantine frame;
* ``F.from_json`` with an EXPLICIT VARIANT-field schema parses each
  line JVM-side — no sampling/inference pass over 100 TB, no Python
  worker, and a malformed line degrades to a NULL struct instead of
  failing the job. The VARIANT type is what makes the text contract
  STRICT: only a genuine JSON *string* value qualifies
  (``schema_of_variant == 'STRING'``), so ``{"text": 123}`` and
  nested-object texts quarantine instead of entering the corpus as
  coerced raw JSON. Field access is ``getField``, so field names
  containing dots work;
* quarantine = the same frame filtered the other way (file + raw
  line), a plan branch, not a second read.

Determinism: ``doc_id`` prefers the corpus' own id field
(``id_field``, any scalar — numeric ids coerce to their string form);
without one it falls back to ``sha2(file '#' raw-line)``, so
byte-identical duplicate lines within one file share an id. The docs
frame therefore aggregates on ``(doc_id, text)`` with ``min(source)``
— fully deterministic (equal key implies equal bytes on the fallback
path; the min picks a stable shard when a corpus id recurs across
files) and faithful (a corpus-supplied id reused for DIFFERENT text
keeps both rows surfacing for triage rather than an arbitrary pick).
That aggregation is the one shuffle this source pays; it fronts work
curation's exact-dedup would otherwise do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_jsonl_corpus", "jsonl_corpus"]


def read_jsonl_corpus(spark: SparkSession, paths: str,
                      text_field: str = "text",
                      id_field: str | None = None,
                      glob: str = "*.jsonl*") -> DataFrame:
    """Raw lines + parsed struct: ``(src_file, line, j)`` where ``j``
    holds ``text_field`` (and ``id_field``) as VARIANT columns (NULL
    struct on malformed JSON). Building block for
    :func:`jsonl_corpus`. ``glob`` filters the listing
    (``*.jsonl*`` covers ``.jsonl`` and ``.jsonl.gz``)."""
    fields = [f"`{text_field}` VARIANT"]
    if id_field and id_field != text_field:
        fields.append(f"`{id_field}` VARIANT")
    schema = ", ".join(fields)
    return (
        spark.read.option("pathGlobFilter", glob).text(paths)
        .select(
            F.input_file_name().alias("src_file"),
            F.col("value").alias("line"),
        )
        .withColumn("j", F.from_json("line", schema))
    )


def jsonl_corpus(spark: SparkSession, paths: str,
                 text_field: str = "text",
                 id_field: str | None = None,
                 glob: str = "*.jsonl*") -> tuple[DataFrame, DataFrame]:
    """JSONL shards -> ``(docs, quarantine)``.

    ``docs``: ``(doc_id, text, source)`` — source is the shard file,
    the curation frame shape (:func:`..pipelines.curate_documents`
    consumes it directly). ``quarantine``: ``(src_file, line)`` for
    every non-blank line that failed to parse or whose ``text_field``
    is not a JSON string — triage, never a job failure."""
    parsed = read_jsonl_corpus(spark, paths, text_field, id_field, glob)
    tv = F.col("j").getField(text_field)
    # STRICT string contract: schema_of_variant names the value's own
    # type, so numbers/objects/arrays under text_field quarantine
    # instead of entering the corpus as coerced raw JSON. eqNullSafe:
    # a malformed line or missing field yields a NULL schema, and the
    # plain ~(NULL == 'STRING') would drop the line from BOTH frames
    has_text = F.schema_of_variant(tv).eqNullSafe(F.lit("STRING"))
    text = F.try_variant_get(tv, "$", "string")
    if id_field:
        raw_id = F.try_variant_get(
            F.col("j").getField(id_field), "$", "string")
        doc_id = F.concat(
            F.lit("jsonl:"),
            F.when(raw_id.isNotNull(), raw_id).otherwise(
                F.sha2(F.concat_ws("#", "src_file", "line"), 256)),
        )
    else:
        doc_id = F.concat(F.lit("jsonl:"), F.sha2(
            F.concat_ws("#", "src_file", "line"), 256))
    docs = (
        parsed.filter(has_text)
        .select(
            doc_id.alias("doc_id"),
            text.alias("text"),
            F.col("src_file").alias("source"),
        )
        # deterministic duplicate collapse: min(source) is stable under
        # any partitioning, unlike dropDuplicates' arbitrary row pick
        .groupBy("doc_id", "text")
        .agg(F.min("source").alias("source"))
    )
    quarantine = (
        parsed.filter(~has_text)
        .filter(F.length(F.trim("line")) > 0)
        .select("src_file", "line")
    )
    return docs, quarantine
