"""The grand mixed-kind corpus: every extraction tier in ONE job.

A realistic 100 TB crawl interleaves scanned PDFs, fax TIFFs,
wild-compression long-tail formats, born-digital PDFs, web HTML,
office DOCX/PPTX/XLSX/ODT, RTF, EPUB books, bare plain text,
Markdown, DSV tables, XML, JSONL, e-mail messages and mbox archives in
the same table. This pin
rotates the seeded corpus's media across ALL nineteen re-encoders and asserts
span equality with the synthetic flagship through one
`extract_real_documents` call — per-media dispatch (probe kinds,
bucket slicing, raster OCR vs text-layer parse vs DOM walk vs
WordprocessingML walk vs paragraph split) all coexisting in the same
bucket shuffle and span assembly. Expectation is exact everywhere
except text-layer PDFs (their deterministic one-span-per-line delta,
shared with test_extract_text_layer).
"""

from __future__ import annotations

from ocr_platform_spark import corpus, schemas
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_docx import content_docx
from tests.test_extract_epub import content_epub
from tests.test_extract_html import content_html
from tests.test_extract_odt_rtf import content_odt, content_rtf
from tests.test_extract_office_paged import content_pptx, content_xlsx
from tests.test_extract_real import (_spans_by_doc, reencode_real,
                                     reencode_tiff, reencode_wild)
from tests.test_extract_text_layer import reencode_text_layer, split_pdf_spans
from tests.test_extract_csv import content_dsv
from tests.test_extract_json import content_jsonl
from tests.test_extract_xml import content_xml
from tests.test_extract_latex import content_tex
from tests.test_extract_md import content_md
from tests.test_extract_text_plain import content_txt
from tests.test_extract_eml import content_eml, content_mbox


def test_all_tiers_in_one_job(spark):
    docs, media = corpus.generate(30, seed=4242, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    rows, text_pdf_refs = [], set()
    for i, (ref, m) in enumerate(sorted(media.items())):
        tier = i % 19
        if tier == 0:
            data = reencode_real(m["data"])
        elif tier == 1:
            data = reencode_tiff(m["data"])
        elif tier == 2:
            data = reencode_wild(m["data"], i)
        elif tier == 3:
            data, is_pdf = reencode_text_layer(m["data"])
            if is_pdf:
                text_pdf_refs.add(ref)
        elif tier == 4:
            data = content_html(m["data"])
        elif tier == 5:
            data = content_docx(m["data"])
        elif tier == 6:
            data = content_txt(m["data"])
        elif tier == 7:
            data = content_pptx(m["data"])
        elif tier == 8:
            data = content_xlsx(m["data"])
        elif tier == 9:
            data = content_epub(m["data"])
        elif tier == 10:
            data = content_odt(m["data"])
        elif tier == 11:
            data = content_rtf(m["data"])
        elif tier == 12:
            data = content_md(m["data"])
        elif tier == 13:
            data = content_dsv(m["data"])
        elif tier == 14:
            data = content_xml(m["data"])
        elif tier == 15:
            data = content_jsonl(m["data"])
        elif tier == 16:
            data = content_tex(m["data"])
        elif tier == 17:
            data = content_eml(m["data"])
        else:
            data = content_mbox(m["data"])
        rows.append((ref, bytearray(data)))
    assert text_pdf_refs, "rotation must hit at least one text-layer PDF"
    mixed = spark.createDataFrame(rows, "media_ref string, data binary")

    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(
        extract_real.extract_real_documents(docs_df, mixed, bucket_pages=2)
    )
    assert set(got) == set(flagship)
    for doc_id in flagship:
        assert got[doc_id] == split_pdf_spans(
            flagship[doc_id], text_pdf_refs
        ), doc_id
