"""WARC ingestion source: parser round trips, recovery semantics, and
the end-to-end pipeline pin.

The pin mirrors the repo's tier policy (tests/test_extract_html.py):
re-encode every synthetic media as an HTML document whose main content
is the flagship's own OCR blocks, wrap each as an HTTP response record
in member-gzip WARC archives, and require ``extract_warc`` to produce
EXACTLY the spans the flagship produces for the equivalent directly
constructed one-media-per-document corpus — covering the binaryFile
path listing, the streaming record parse, the corpus mapping's
deterministic doc ids, and the shared probe/extract/assembly stages.
"""

from __future__ import annotations

import hashlib
import io
import zlib

import pytest

from ocr_platform_spark import corpus, schemas
from ocr_platform_spark.operators import extract, extract_real
from ocr_platform_spark.sources import warc
from tests.test_extract_html import content_html
from tests.test_extract_real import _spans_by_doc

RECS = [
    dict(target_uri="http://x/info", payload=b"software: t",
         warc_type="warcinfo"),
    dict(target_uri="http://x/a.html", payload=b"<html><p>hi</p></html>"),
    dict(target_uri="http://x/b.bin", payload=bytes(range(256)) * 3,
         content_type="application/pdf"),
    dict(target_uri="http://x/c.html", payload=b"<p>chunked</p>",
         chunked=True),
    dict(target_uri="http://x/gone", payload=b"not found", http_status=404),
    dict(target_uri="http://x/r.txt", payload=b"plain resource",
         warc_type="resource", content_type="text/plain"),
    dict(target_uri="http://x/req", payload=b"GET / HTTP/1.1\r\n\r\n",
         warc_type="request",
         content_type="application/http; msgtype=request"),
]


def _member(rec: dict) -> bytes:
    raw = warc.warc_record_bytes(**rec)
    comp = zlib.compressobj(9, zlib.DEFLATED, 31)
    return comp.compress(raw) + comp.flush()


@pytest.mark.parametrize("gz", [True, False])
def test_writer_parser_round_trip(tmp_path, gz):
    """Every record type survives write -> stream-parse in both the
    member-gzip and plain layouts; HTTP metadata and payloads are
    exact, chunked bodies de-chunk, non-payload types carry None."""
    path = tmp_path / ("t.warc.gz" if gz else "t.warc")
    warc.write_warc(str(path), RECS, gzip_members=gz)
    with open(path, "rb") as fobj:
        rows = list(warc.iter_warc_records(fobj))
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "response", "response", "response", "response",
        "resource", "request"]
    assert all(r["error"] is None for r in rows)
    assert rows[1]["payload"] == b"<html><p>hi</p></html>"
    assert (rows[1]["http_status"], rows[1]["content_type"]) == (
        200, "text/html")
    assert rows[2]["payload"] == bytes(range(256)) * 3
    assert rows[2]["content_type"] == "application/pdf"
    assert rows[3]["payload"] == b"<p>chunked</p>"  # de-chunked
    assert rows[4]["http_status"] == 404
    assert rows[5]["payload"] == b"plain resource"
    assert rows[6]["payload"] is None  # request: headers only
    assert rows[1]["record_id"].startswith("<urn:sha256:")
    assert [r["record_index"] for r in rows] == list(range(7))


def test_corrupt_member_quarantines_record_not_archive():
    """A corrupt gzip member yields one error row and parsing resumes
    at the next member's magic — the archive tail survives."""
    bad = bytearray(_member(RECS[2]))
    bad[20] ^= 0xFF
    blob = _member(RECS[1]) + bytes(bad) + _member(RECS[5])
    rows = list(warc.iter_warc_records(io.BytesIO(blob)))
    assert [r["warc_type"] for r in rows] == [
        "response", "invalid", "resource"]
    assert "gzip member" in rows[1]["error"]
    assert rows[0]["payload"] == RECS[1]["payload"]
    assert rows[2]["payload"] == RECS[5]["payload"]


def test_plain_framing_error_stops_with_one_error_row():
    """Without member boundaries framing cannot be re-found: a
    truncated record is one quarantine row, never an exception."""
    raw = warc.warc_record_bytes(**RECS[1])
    rows = list(warc.iter_warc_records(io.BytesIO(raw[: len(raw) // 2])))
    assert len(rows) == 1 and rows[0]["warc_type"] == "invalid"
    # body truncation (header intact) reports the body, not the header
    head_end = raw.find(b"\r\n\r\n") + 4
    rows = list(warc.iter_warc_records(io.BytesIO(raw[: head_end + 5])))
    assert len(rows) == 1 and "truncated record body" in rows[0]["error"]


def test_single_stream_gzip_parses_all_records():
    """A whole-file gzip (single member, many records) still parses —
    the buffer just holds the file instead of one record."""
    raw = b"".join(warc.warc_record_bytes(**r) for r in RECS)
    comp = zlib.compressobj(9, zlib.DEFLATED, 31)
    blob = comp.compress(raw) + comp.flush()
    rows = list(warc.iter_warc_records(io.BytesIO(blob)))
    assert len(rows) == len(RECS)
    assert all(r["error"] is None for r in rows)


def test_read_warc_records_frame(spark, tmp_path):
    """Spark surface: N archives -> one records frame; per-file error
    isolation (a corrupt archive contributes its rows, not a job
    failure); record ids join files and indexes correctly."""
    for i in range(3):
        warc.write_warc(str(tmp_path / f"part-{i}.warc.gz"), RECS)
    blob = _member(RECS[1]) + b"\x1f\x8b\x08garbage" + _member(RECS[5])
    (tmp_path / "bad.warc.gz").write_bytes(blob)
    df = warc.read_warc(spark, str(tmp_path))
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    for i in range(3):
        assert len(by_file[f"part-{i}.warc.gz"]) == len(RECS)
    bad = sorted(by_file["bad.warc.gz"], key=lambda r: r.record_index)
    kinds = [r.warc_type for r in bad]
    assert kinds[0] == "response" and kinds[-1] == "resource"
    assert "invalid" in kinds


def _expected_doc_id(uri: str, payload: bytes) -> str:
    digest = hashlib.sha256(uri.encode() + b"\x00" + payload).hexdigest()
    return f"urn:sha256:{digest[:32]}"


def test_warc_to_corpus_keep_rule(spark, tmp_path):
    """Corpus mapping: 2xx responses + resources become one-media-span
    documents; warcinfo/request/404/invalid rows drop; doc ids are the
    record urns (angle brackets stripped); filename is the URI leaf."""
    warc.write_warc(str(tmp_path / "a.warc.gz"), RECS)
    records = warc.read_warc(spark, str(tmp_path))
    documents, media = warc.warc_to_corpus(records)
    docs = {r.doc_id: r.spans for r in documents.collect()}
    med = {r.media_ref: r for r in media.collect()}
    kept = [RECS[1], RECS[2], RECS[3], RECS[5]]
    assert len(docs) == len(med) == len(kept)
    for rec in kept:
        did = _expected_doc_id(rec["target_uri"], rec["payload"])
        assert did in docs and did in med
        (span,) = docs[did]
        assert (span.kind, span.text, span.media_ref, span.offset) == (
            "media", None, did, 0)
        assert bytes(med[did].data) == rec["payload"]
        assert med[did].filename == rec["target_uri"].rsplit("/", 1)[-1]
    assert med[_expected_doc_id(
        RECS[2]["target_uri"], RECS[2]["payload"])].content_type == \
        "application/pdf"


@pytest.fixture(scope="module")
def warc_corpus(spark, tmp_path_factory):
    """Synthetic corpus -> HTML re-encodings -> 2 member-gzip archives,
    plus the directly constructed one-media-per-document equivalent."""
    root = tmp_path_factory.mktemp("warc")
    _docs, media = corpus.generate(16, seed=909, max_pages=6)
    recs, direct_docs, direct_media = [], [], []
    for i, (ref, m) in enumerate(sorted(media.items())):
        uri = f"http://site.test/{ref}.html"
        payload = content_html(m["data"])
        recs.append(dict(target_uri=uri, payload=payload))
        did = _expected_doc_id(uri, payload)
        direct_docs.append((did, [("media", None, did, 0)]))
        direct_media.append((did, bytearray(payload)))
    half = len(recs) // 2
    warc.write_warc(str(root / "part-0.warc.gz"), recs[:half])
    warc.write_warc(str(root / "part-1.warc.gz"), recs[half:])
    docs_df = spark.createDataFrame(direct_docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(direct_media,
                                     "media_ref string, data binary")
    return str(root), docs_df, media_df


def test_extract_warc_equals_direct_pipeline(spark, warc_corpus):
    """End-to-end: archives -> spans == the real-codec pipeline over
    the directly constructed corpus (itself span-equal to the flagship
    per tests/test_extract_html.py). Pins listing, streaming parse,
    doc-id derivation, payload integrity, and assembly order."""
    root, docs_df, media_df = warc_corpus
    direct = _spans_by_doc(
        extract_real.extract_real_documents(docs_df, media_df))
    got = _spans_by_doc(warc.extract_warc(spark, root))
    assert got == direct
    assert len(got) == docs_df.count()  # one document per media payload


def test_extract_warc_matches_flagship_blocks(spark, warc_corpus):
    """The extracted text per document equals the flagship's OCR block
    text for the underlying synthetic media — the WARC tier inherits
    the HTML tier's exact-equality contract."""
    root, docs_df, media_df = warc_corpus
    _docs, media = corpus.generate(16, seed=909, max_pages=6)
    synth_docs = spark.createDataFrame(
        [(f"d{i}", [("media", None, ref, 0)])
         for i, (ref, _m) in enumerate(sorted(media.items()))],
        schema=schemas.DOCUMENTS)
    synth_media = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary")
    flagship = _spans_by_doc(
        extract.extract_documents(synth_docs, synth_media))
    got = _spans_by_doc(warc.extract_warc(spark, root))
    flag_texts = sorted(
        tuple(s[1] for s in spans) for spans in flagship.values())
    got_texts = sorted(
        tuple(s[1] for s in spans) for spans in got.values())
    assert got_texts == flag_texts
