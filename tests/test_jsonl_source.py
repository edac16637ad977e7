"""JSONL corpus source: parse/quarantine split, id determinism,
gzip shards, and the pipeline wiring.
"""

from __future__ import annotations

import gzip

from ocr_platform_spark import pipelines
from ocr_platform_spark.sources import jsonl


def _write(tmp_path, name, lines, compress=False):
    data = b"\n".join(lines) + b"\n"
    if compress:
        (tmp_path / name).write_bytes(gzip.compress(data, mtime=0))
    else:
        (tmp_path / name).write_bytes(data)


def test_parse_and_quarantine_split(spark, tmp_path):
    _write(tmp_path, "a.jsonl", [
        b'{"text": "alpha beta", "id": "d1"}',
        b'not json at all',
        b'{"no_text_field": 1}',
        b'',
        b'{"text": "gamma delta", "id": "d2"}',
    ])
    docs, quar = jsonl.jsonl_corpus(spark, str(tmp_path), id_field="id")
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == {"jsonl:d1": "alpha beta", "jsonl:d2": "gamma delta"}
    # blank line is dropped silently; the two bad lines quarantine
    bad = sorted(r["line"] for r in quar.collect())
    assert bad == ['not json at all', '{"no_text_field": 1}']


def test_doc_id_fallback_is_deterministic(spark, tmp_path):
    _write(tmp_path, "b.jsonl", [b'{"text": "one"}', b'{"text": "two"}'])
    ids1 = sorted(r["doc_id"] for r in
                  jsonl.jsonl_corpus(spark, str(tmp_path))[0].collect())
    ids2 = sorted(r["doc_id"] for r in
                  jsonl.jsonl_corpus(spark, str(tmp_path))[0].collect())
    assert ids1 == ids2 and len(set(ids1)) == 2
    assert all(i.startswith("jsonl:") for i in ids1)


def test_missing_id_falls_back_per_line(spark, tmp_path):
    _write(tmp_path, "c.jsonl", [
        b'{"text": "with id", "id": "x"}',
        b'{"text": "without id"}',
    ])
    docs, _ = jsonl.jsonl_corpus(spark, str(tmp_path), id_field="id")
    ids = {r["text"]: r["doc_id"] for r in docs.collect()}
    assert ids["with id"] == "jsonl:x"
    assert ids["without id"].startswith("jsonl:") \
        and len(ids["without id"]) > len("jsonl:x")


def test_gzip_shards_inflate_transparently(spark, tmp_path):
    _write(tmp_path, "d.jsonl.gz",
           [b'{"text": "compressed doc body"}'], compress=True)
    docs, quar = jsonl.jsonl_corpus(spark, str(tmp_path))
    assert [r["text"] for r in docs.collect()] == ["compressed doc body"]
    assert quar.count() == 0


def test_pipeline_source_jsonl(spark, tmp_path):
    _write(tmp_path, "e.jsonl", [
        b'{"text": "the quick fox is one of a kind and rather sly"}',
        b'{"text": "the quick fox is one of a kind and rather sly"}',
        b'broken line',
    ])
    raw = pipelines.crawl_to_training_corpus(
        spark, str(tmp_path), source="jsonl", curate=False).collect()
    # byte-identical duplicate lines share the fallback id and the
    # source's (doc_id, text) distinct collapses them deterministically
    assert [r["text"] for r in raw] == [
        "the quick fox is one of a kind and rather sly"]
    assert raw[0]["n_spans"] == 1
    curated = pipelines.crawl_to_training_corpus(
        spark, str(tmp_path), source="jsonl", min_tokens=1).collect()
    assert [r["text"] for r in curated] == [
        "the quick fox is one of a kind and rather sly"]


def test_reused_user_id_with_different_text_keeps_both(spark, tmp_path):
    # a corpus-supplied id reused for DIFFERENT text is corpus
    # corruption: both rows must surface (no arbitrary pick), while a
    # true byte-duplicate collapses
    _write(tmp_path, "f.jsonl", [
        b'{"text": "version one", "id": "dup"}',
        b'{"text": "version two", "id": "dup"}',
        b'{"text": "version one", "id": "dup"}',
    ])
    docs, _ = jsonl.jsonl_corpus(spark, str(tmp_path), id_field="id")
    rows = sorted(r["text"] for r in docs.collect())
    assert rows == ["version one", "version two"]


def test_non_string_text_values_quarantine(spark, tmp_path):
    # {"text": 123} / nested objects must NOT enter the corpus as
    # coerced raw JSON — only genuine JSON string values qualify
    _write(tmp_path, "g.jsonl", [
        b'{"text": "a real string"}',
        b'{"text": 123}',
        b'{"text": {"en": "nested translation"}}',
        b'{"text": ["a", "list"]}',
        b'{"text": null}',
    ])
    docs, quar = jsonl.jsonl_corpus(spark, str(tmp_path))
    assert [r["text"] for r in docs.collect()] == ["a real string"]
    assert quar.count() == 4


def test_dotted_field_names(spark, tmp_path):
    _write(tmp_path, "h.jsonl", [
        b'{"meta.text": "dotted field body", "meta.id": "d9"}',
    ])
    docs, quar = jsonl.jsonl_corpus(
        spark, str(tmp_path), text_field="meta.text",
        id_field="meta.id")
    [row] = docs.collect()
    assert (row["doc_id"], row["text"]) == ("jsonl:d9",
                                            "dotted field body")
    assert quar.count() == 0


def test_numeric_ids_coerce_to_strings(spark, tmp_path):
    _write(tmp_path, "i.jsonl", [b'{"text": "numbered doc", "id": 42}'])
    docs, _ = jsonl.jsonl_corpus(spark, str(tmp_path), id_field="id")
    assert [r["doc_id"] for r in docs.collect()] == ["jsonl:42"]


def test_glob_filter_skips_non_jsonl_files(spark, tmp_path):
    _write(tmp_path, "j.jsonl", [b'{"text": "kept document"}'])
    (tmp_path / "README.md").write_bytes(b"# not a corpus\njust docs\n")
    (tmp_path / "shard.zip").write_bytes(b"PK\x03\x04binary junk")
    docs, quar = jsonl.jsonl_corpus(spark, str(tmp_path))
    assert [r["text"] for r in docs.collect()] == ["kept document"]
    assert quar.count() == 0


def test_cross_file_duplicate_source_is_deterministic(spark, tmp_path):
    # same corpus id + identical text in two shards: one survivor with
    # the MIN source file — stable under any partitioning
    _write(tmp_path, "b_shard.jsonl", [b'{"text": "same", "id": "d"}'])
    _write(tmp_path, "a_shard.jsonl", [b'{"text": "same", "id": "d"}'])
    docs, _ = jsonl.jsonl_corpus(spark, str(tmp_path), id_field="id")
    [row] = docs.collect()
    assert row["source"].endswith("a_shard.jsonl")
