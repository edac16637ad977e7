"""JSON / JSON-Lines tier — string values are content, structure is not.

Tier pin (flagship span equality over encode_jsonl re-encodings — the
LLM-corpus shape, whose numeric ids pin the numbers-never-emit rule on
every document) plus semantic pins for each documented rule.
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import corpus, jsontext, multimodal, schemas
from ocr_platform_spark.jsontext import json_blocks, sniff_json
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks


def content_jsonl(payload: bytes) -> bytes:
    _kind, rasters = _render_pages(payload)
    blocks: list[str] = []
    for img in rasters:
        blocks.extend(t for _y1, _x1, t in page_ocr_blocks(img))
    return jsontext.encode_jsonl(blocks)


@pytest.fixture(scope="module")
def jsonl_corpus(spark):
    docs, media = corpus.generate(24, seed=7272, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    jl = spark.createDataFrame(
        [(ref, bytearray(content_jsonl(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    return docs_df, synth, jl


def test_jsonl_pipeline_equals_flagship(jsonl_corpus):
    docs_df, synth, jl = jsonl_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(extract_real.extract_real_documents(docs_df, jl))
    assert got == flagship


def test_probe_promotes_json_both_depths(jsonl_corpus):
    _docs, _synth, jl = jsonl_corpus
    for r in jl.collect():
        raw = bytes(r["data"])
        if not raw.strip():
            continue
        assert multimodal.probe_real_media(raw, deep=True)[0] == "json"
        assert multimodal.probe_real_media(raw, deep=False)[0] == "json"


# ---------------------------------------------------------------------------
# semantic pins
# ---------------------------------------------------------------------------

def texts(src: str) -> list[str]:
    return [b.text for b in json_blocks(src)]


def test_string_values_only_document_order():
    src = ('{"title": "First", "n": 42, "ok": true, "none": null, '
           '"tags": ["a", 7, "b"], "nested": {"body": "deep text"}}')
    assert texts(src) == ["First", "a", "b", "deep text"]


def test_keys_never_emit():
    assert texts('{"this key never emits": "value does"}') \
        == ["value does"]


def test_jsonl_lines_in_order_blank_lines_skip():
    src = '{"text": "one"}\n\n{"text": "two"}\n["three", 3]\n'
    assert sniff_json(src) == "jsonl"
    assert texts(src) == ["one", "two", "three"]


def test_strip_lines_join_inside_string_values():
    assert texts('{"t": "  line one  \\n\\n  line two  "}') \
        == ["line one\nline two"]
    # whitespace-only strings drop
    assert texts('{"t": "   ", "u": "kept"}') == ["kept"]


def test_rejections_fall_to_other_tiers():
    # truncated JSON -> not promoted (txt floor, never a quarantine)
    assert sniff_json('{"cut": "off') is None
    assert multimodal.probe_real_media(b'{"cut": "off', deep=True)[0] \
        == "txt"
    # NaN/Infinity extensions are not interchange JSON
    assert sniff_json('{"x": NaN}') is None
    # bare-scalar JSONL is data, not documents
    assert sniff_json('"a"\n"b"\n') is None
    assert sniff_json("1\n2\n3\n") is None
    # prose is prose
    assert sniff_json("just some text\n") is None


def test_pathological_nesting_takes_txt_floor_not_a_crash():
    deep = ("[" * 50000).encode()
    # RecursionError must not escape: the payload stays literal text
    assert multimodal.probe_real_media(deep, deep=True)[0] == "txt"
    # a nesting depth that parses also walks (explicit-stack DFS)
    ok = "[" * 400 + '"x"' + "]" * 400
    assert texts(ok) == ["x"]


def test_duplicate_keys_last_wins():
    assert texts('{"t": "first", "t": "second"}') == ["second"]


def test_shallow_window_jsonl_resolves_big_single_doc_stays_txt():
    line = '{"id": 1, "text": "%s"}\n' % ("word " * 40).strip()
    jl = (line * 100).encode()
    assert len(jl) > 4096
    assert multimodal.probe_real_media(jl, deep=False)[0] == "json"
    big = ('{"text": "%s"}' % ("word " * 2000).strip()).encode()
    assert len(big) > 4096
    assert multimodal.probe_real_media(big, deep=False)[0] == "txt"
    assert multimodal.probe_real_media(big, deep=True)[0] == "json"
