"""PPTX/XLSX paged-office tiers, pinned against the synthetic flagship.

Unlike DOCX/HTML/plain text (one reflowable page), slides and sheets
are genuinely PAGED — so these pins re-encode every synthetic media as
a deck (one slide per source page) and as a workbook (one sheet per
source page), run the pipeline with ``bucket_pages=2`` so multi-page
payloads exercise the page-bucket shuffle AND probe-time sub-zip
slicing, and assert EXACT span-sequence equality with the flagship.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from ocr_platform_spark import (corpus, multimodal, pptxtext, schemas,
                                xlsxtext)
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks


def content_pptx(payload: bytes) -> bytes:
    """Synthetic container -> a PPTX with one slide per source page,
    one <a:p> per OCR block."""
    _kind, rasters = _render_pages(payload)
    return pptxtext.encode_pptx([
        [text for _y1, _x1, text in page_ocr_blocks(img)]
        for img in rasters
    ])


def content_xlsx(payload: bytes) -> bytes:
    """Synthetic container -> an XLSX with one sheet per source page,
    one single-cell row per OCR block (multi-line blocks ride a shared
    string with embedded newlines — the layout Excel itself writes)."""
    _kind, rasters = _render_pages(payload)
    return xlsxtext.encode_xlsx([
        [[text] for _y1, _x1, text in page_ocr_blocks(img)]
        for img in rasters
    ])


@pytest.fixture(scope="module")
def office_corpus(spark):
    docs, media = corpus.generate(24, seed=3737, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    pptx = spark.createDataFrame(
        [(ref, bytearray(content_pptx(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    xlsx = spark.createDataFrame(
        [(ref, bytearray(content_xlsx(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    return docs_df, synth, pptx, xlsx


def test_pptx_pipeline_equals_flagship(office_corpus):
    """bucket_pages=2 forces multi-slide decks through sub-zip slicing
    and the bucket shuffle; spans must still equal the flagship's."""
    docs_df, synth, pptx, _ = office_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(
        extract_real.extract_real_documents(docs_df, pptx, bucket_pages=2)
    )
    assert got == flagship


def test_xlsx_pipeline_equals_flagship(office_corpus):
    docs_df, synth, _, xlsx = office_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(
        extract_real.extract_real_documents(docs_df, xlsx, bucket_pages=2)
    )
    assert got == flagship


def test_unsliced_path_equality(office_corpus):
    """slice_payloads=False (full payload on every bucket row) is the
    same extraction, just a worse shuffle — pinned like the PDF path."""
    docs_df, synth, pptx, _ = office_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(
        extract_real.extract_real_documents(
            docs_df, pptx, bucket_pages=2, slice_payloads=False)
    )
    assert got == flagship


def test_slice_decode_parity():
    """slice_slides/slice_sheets: decoding a slice equals the sliced
    range of the full decode, for every contiguous bucket."""
    deck = pptxtext.encode_pptx(
        [[f"slide {i} block a", f"slide {i}\nblock b"] for i in range(5)])
    full = [[b.text for b in p] for p in pptxtext.slide_blocks(deck)]
    wb = xlsxtext.encode_xlsx(
        [[[f"sheet {i} r1"], [f"sheet {i} r2"]] for i in range(5)])
    full_x = [[b.text for b in p] for p in xlsxtext.sheet_blocks(wb)]
    for lo in range(0, 5, 2):
        hi = min(5, lo + 2)
        sl = pptxtext.slice_slides(deck, range(lo, hi))
        assert [[b.text for b in p]
                for p in pptxtext.slide_blocks(sl)] == full[lo:hi]
        sx = xlsxtext.slice_sheets(wb, range(lo, hi))
        assert [[b.text for b in p]
                for p in xlsxtext.sheet_blocks(sx)] == full_x[lo:hi]


def test_slide_numbering_is_numeric_not_lexicographic():
    """slide10.xml sorts after slide9.xml (numeric member order) — the
    lexicographic trap for decks past 9 slides."""
    deck = pptxtext.encode_pptx([[f"s{i}"] for i in range(1, 12)])
    texts = [p[0].text for p in pptxtext.slide_blocks(deck)]
    assert texts == [f"s{i}" for i in range(1, 12)]
    assert multimodal.probe_real_media(deck, deep=True) == ("pptx", 11, 0, 0)


def test_cell_type_semantics():
    """Numeric cells extract verbatim, booleans render TRUE/FALSE,
    cached formula strings and error literals pass through, empty cells
    drop, rich-text shared strings concatenate their runs."""
    s = xlsxtext.S_NS
    sheet = (
        '<?xml version="1.0"?>'
        f'<worksheet xmlns="{s}"><sheetData>'
        '<row r="1"><c r="A1"><v>42</v></c>'
        '<c r="B1" t="b"><v>1</v></c>'
        '<c r="C1" t="b"><v>0</v></c>'
        '<c r="D1" t="str"><v>=SUM cached</v></c>'
        '<c r="E1" t="e"><v>#DIV/0!</v></c>'
        '<c r="F1"/></row>'
        '<row r="2"><c r="A2" t="s"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0"?>'
        f'<sst xmlns="{s}"><si><r><t>rich </t></r><r><t>runs</t></r></si>'
        "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", f'<workbook xmlns="{s}"/>')
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", sst)
    pages = xlsxtext.sheet_blocks(buf.getvalue())
    assert [[b.text for b in p] for p in pages] == [
        ["42 TRUE FALSE =SUM cached #DIV/0!", "rich runs"]]


def test_office_paged_quarantine(spark):
    """No-slide decks, no-sheet workbooks, out-of-range shared-string
    references and malformed slide XML all quarantine at probe time;
    the document still assembles its text spans."""
    s = xlsxtext.S_NS
    # shared-string index past the table
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", f'<workbook xmlns="{s}"/>')
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{s}"><sheetData><row r="1">'
            '<c r="A1" t="s"><v>7</v></c></row></sheetData></worksheet>')
    bad_sref = buf.getvalue()
    # deck with a malformed slide
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("ppt/presentation.xml", "<p:presentation/>")
        zf.writestr("ppt/slides/slide1.xml", "<p:sld><unclosed")
    bad_slide = buf2.getvalue()
    # marker without any slides / sheets
    buf3 = io.BytesIO()
    with zipfile.ZipFile(buf3, "w") as zf:
        zf.writestr("ppt/presentation.xml", "<p:presentation/>")
    no_slides = buf3.getvalue()
    buf4 = io.BytesIO()
    with zipfile.ZipFile(buf4, "w") as zf:
        zf.writestr("xl/workbook.xml", f'<workbook xmlns="{s}"/>')
    no_sheets = buf4.getvalue()

    fixtures = {
        "m-sref": bad_sref, "m-slide": bad_slide,
        "m-noslides": no_slides, "m-nosheets": no_sheets,
    }
    docs = spark.createDataFrame(
        [{"doc_id": "d1", "spans": [
            {"kind": "text", "text": "keep me", "media_ref": None,
             "offset": 0},
        ] + [
            {"kind": "pptx", "text": None, "media_ref": ref,
             "offset": i + 1}
            for i, ref in enumerate(sorted(fixtures))
        ]}],
        schema=schemas.DOCUMENTS,
    )
    media = spark.createDataFrame(
        [(ref, bytearray(raw)) for ref, raw in fixtures.items()],
        "media_ref string, data binary",
    )
    buckets = extract_real.real_page_buckets(docs, media, bucket_pages=8)
    errs = {r["media_ref"]: r["error"]
            for r in extract_real.real_media_errors(buckets).collect()}
    assert set(errs) == set(fixtures)
    assert "out of range" in errs["m-sref"]
    assert "malformed XML" in errs["m-slide"]
    assert "no ppt/slides" in errs["m-noslides"]
    assert "no xl/worksheets" in errs["m-nosheets"]
    spans = _spans_by_doc(extract_real.extract_real_documents(docs, media))
    assert spans == {"d1": [("text", "keep me", None, 0)]}


def test_real_media_metadata_paged_office(spark):
    """Header-only metadata pass reports slide/sheet counts from the
    central directory without inflating members."""
    deck = pptxtext.encode_pptx([["a"], ["b"], ["c"]])
    wb = xlsxtext.encode_xlsx([[["x"]], [["y"]]])
    media = spark.createDataFrame(
        [("m-p", bytearray(deck)), ("m-x", bytearray(wb))],
        "media_ref string, data binary",
    )
    rows = {r["media_ref"]: r
            for r in multimodal.real_media_metadata(media).collect()}
    assert (rows["m-p"]["kind"], rows["m-p"]["n_pages"]) == ("pptx", 3)
    assert (rows["m-x"]["kind"], rows["m-x"]["n_pages"]) == ("xlsx", 2)
