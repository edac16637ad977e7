"""Compressed transport wrappers (gzip / bzip2 / xz) around any media.

Unit edges on the strict bomb-capped inflate, then the pipeline pin:
the corpus re-encoded through OTHER tiers (plain text, HTML, markdown,
real multi-page scanned PDFs) and wrapped in rotating compressors must
extract EXACTLY the flagship's spans — proving the unwrap happens
before probe and slicing, so page bucketing of a gzip'd 6-page PDF
still ships per-bucket sub-PDF slices.
"""

from __future__ import annotations

import bz2
import gzip
import lzma

import pytest

from ocr_platform_spark import corpus, multimodal, schemas, transport
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_html import content_html
from tests.test_extract_md import content_md
from tests.test_extract_eml import content_eml, content_mbox
from tests.test_extract_real import _spans_by_doc, reencode_real
from tests.test_extract_text_plain import content_txt

_COMPRESSORS = [gzip.compress, bz2.compress, lzma.compress]


# ---------------------------------------------------------------------------
# unit edges
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,comp", [("gzip", gzip.compress),
                                       ("bzip2", bz2.compress),
                                       ("xz", lzma.compress)])
def test_round_trip_multimember_truncation_garbage(name, comp):
    data = b"hello world " * 1000
    raw = comp(data)
    assert transport.sniff_transport(raw) == name
    assert transport.decompress_transport(raw) == data
    assert transport.maybe_unwrap(raw) == data
    # concatenated members (pbzip2 / bgzf / xz multi-stream layout)
    assert transport.decompress_transport(comp(b"abc") + comp(b"def")) \
        == b"abcdef"
    for cut in (5, len(raw) // 2, len(raw) - 1):
        with pytest.raises(ValueError):
            transport.decompress_transport(raw[:cut])
    with pytest.raises(ValueError, match="trailing garbage"):
        transport.decompress_transport(raw + b"garbage!")
    mid = bytearray(raw)
    mid[len(mid) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        transport.decompress_transport(bytes(mid))


def test_bomb_guard_nesting_and_passthrough():
    bomb = gzip.compress(b"\x00" * (1 << 22))
    with pytest.raises(ValueError, match="bomb"):
        transport.decompress_transport(bomb, max_out=1 << 20)
    # mixed nesting unwraps up to MAX_NEST
    nested = gzip.compress(bz2.compress(lzma.compress(b"deep")))
    assert transport.maybe_unwrap(nested) == b"deep"
    quad = b"x"
    for _ in range(transport.MAX_NEST + 1):
        quad = gzip.compress(quad)
    with pytest.raises(ValueError, match="nested deeper"):
        transport.maybe_unwrap(quad)
    with pytest.raises(ValueError, match="empty payload"):
        transport.maybe_unwrap(gzip.compress(b""))
    # non-wrapped payloads pass through untouched
    assert transport.maybe_unwrap(b"plain text") == b"plain text"
    # bzip2's printable magic is hardened: prose starting "BZh" is text
    assert transport.sniff_transport(b"BZh9 is a compressor level") is None


def test_nul_padding_after_final_member_is_not_garbage():
    # xz Stream Padding (spec-legal 4-byte multiples) and gzip zero
    # padding from block-mode writers must extract, not quarantine
    assert transport.decompress_transport(
        lzma.compress(b"hello") + b"\x00" * 4) == b"hello"
    assert transport.decompress_transport(
        gzip.compress(b"hello") + b"\x00" * 16) == b"hello"
    # non-NUL trailing bytes are still garbage
    with pytest.raises(ValueError, match="trailing garbage"):
        transport.decompress_transport(
            gzip.compress(b"x") + b"\x00\x01")


def test_probe_split_shallow_names_transport_deep_resolves_inner():
    wrapped = gzip.compress(b"alpha beta\n\ngamma\n")
    assert multimodal.probe_real_media(wrapped, deep=False) \
        == ("gzip", 1, 0, 0)
    assert multimodal.probe_real_media(wrapped, deep=True) \
        == ("txt", 1, 0, 0)
    pdfish = lzma.compress(reencode_real(
        corpus.generate(2, seed=77, max_pages=3)[1]
        [sorted(corpus.generate(2, seed=77, max_pages=3)[1])[0]]["data"]))
    kind, n, _w, _h = multimodal.probe_real_media(pdfish, deep=True)
    assert kind in ("pdf", "image") and n >= 1


# ---------------------------------------------------------------------------
# pipeline pin
# ---------------------------------------------------------------------------

def test_wrapped_tiers_equal_flagship(spark):
    """Rotating compressor x rotating inner tier (txt, HTML, markdown,
    real scanned PDF, EML, mbox) at bucket_pages=2: exact span
    equality, so the unwrap demonstrably precedes slicing for
    multi-page inner PDFs and paged mbox archives (.mbox.gz ships
    per-bucket message slices)."""
    docs, media = corpus.generate(18, seed=3131, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    rows = []
    for i, (ref, m) in enumerate(sorted(media.items())):
        inner = [content_txt, content_html, content_md,
                 reencode_real, content_eml, content_mbox][i % 6](m["data"])
        rows.append((ref, bytearray(_COMPRESSORS[i % 3](inner))))
    wrapped = spark.createDataFrame(rows, "media_ref string, data binary")
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(extract_real.extract_real_documents(
        docs_df, wrapped, bucket_pages=2))
    assert got == flagship


def test_corrupt_wrappers_quarantine_with_triage(spark):
    ok = gzip.compress(b"keep this paragraph\n")
    trunc = gzip.compress(b"the truncated one " * 50)[:20]
    quad = b"y"
    for _ in range(transport.MAX_NEST + 1):
        quad = gzip.compress(quad)
    docs = spark.createDataFrame(
        [{"doc_id": "d1", "spans": [
            {"kind": "text", "text": "lead", "media_ref": None,
             "offset": 0},
            {"kind": "txt", "text": None, "media_ref": "m-ok",
             "offset": 1},
            {"kind": "txt", "text": None, "media_ref": "m-trunc",
             "offset": 2},
            {"kind": "txt", "text": None, "media_ref": "m-nest",
             "offset": 3},
        ]}],
        schema=schemas.DOCUMENTS,
    )
    media = spark.createDataFrame(
        [("m-ok", bytearray(ok)), ("m-trunc", bytearray(trunc)),
         ("m-nest", bytearray(quad))],
        "media_ref string, data binary",
    )
    buckets = extract_real.real_page_buckets(docs, media, bucket_pages=8)
    errs = {r["media_ref"]: r["error"]
            for r in extract_real.real_media_errors(buckets).collect()}
    assert set(errs) == {"m-trunc", "m-nest"}
    assert "truncated" in errs["m-trunc"] or "corrupt" in errs["m-trunc"]
    assert "nested deeper" in errs["m-nest"]
    spans = _spans_by_doc(extract_real.extract_real_documents(docs, media))
    assert spans == {"d1": [("text", "lead", None, 0),
                            ("text", "keep this paragraph", "m-ok", 1)]}
