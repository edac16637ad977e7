"""CSV/TSV tabular tier — row blocks under the XLSX join rule.

Tier pin: flagship blocks re-encoded as one DSV rectangle per media
(word cells for plain single-line blocks, quoted single cells for the
rest, empty-cell padding to uniform width) must extract EXACTLY the
flagship's spans. Media with too few blocks to form a sniffable
rectangle fall back to the plain-text encoding — both tiers produce
identical spans, which is itself part of the consistency claim.
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import corpus, csvtext, multimodal, schemas
from ocr_platform_spark.csvtext import encode_dsv, sniff_tabular, \
    tabular_blocks
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks
from tests.test_extract_text_plain import content_txt


def content_dsv(payload: bytes, delimiter: str = "\t") -> bytes:
    _kind, rasters = _render_pages(payload)
    blocks: list[str] = []
    for img in rasters:
        blocks.extend(t for _y1, _x1, t in page_ocr_blocks(img))
    try:
        return encode_dsv(blocks, delimiter)
    except ValueError:
        # <2 blocks cannot form a rectangle: the txt floor is the same
        # extraction
        return content_txt(payload)


@pytest.fixture(scope="module")
def dsv_corpus(spark):
    docs, media = corpus.generate(24, seed=4747, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    dsv = spark.createDataFrame(
        [(ref, bytearray(content_dsv(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    return docs_df, synth, dsv


def test_dsv_pipeline_equals_flagship(dsv_corpus):
    docs_df, synth, dsv = dsv_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(extract_real.extract_real_documents(docs_df, dsv))
    assert got == flagship


def test_probe_promotes_rectangles_only(dsv_corpus):
    docs_df, synth, dsv = dsv_corpus
    kinds = set()
    for r in dsv.collect():
        raw = bytes(r["data"])
        if not raw.strip():
            continue
        kinds.add(multimodal.probe_real_media(raw, deep=True)[0])
    # every non-empty payload resolved to a text-family tier; at least
    # one real rectangle promoted
    assert "csv" in kinds and kinds <= {"csv", "txt", "md"}


# ---------------------------------------------------------------------------
# sniff + renderer unit pins
# ---------------------------------------------------------------------------

def test_sniff_tsv_two_rows_promote():
    assert sniff_tabular("a\tb\nc\td\n") == "\t"


def test_sniff_comma_needs_three_by_three():
    # two fields / two rows of prose-with-a-comma stays text
    assert sniff_tabular("Hello, world\nYes, indeed\n") is None
    assert sniff_tabular("a,b,c\nd,e,f\n") is None  # only 2 rows
    assert sniff_tabular("a,b,c\nd,e,f\ng,h,i\n") == ","
    assert sniff_tabular("a;b;c\nd;e;f\ng;h;i\n") == ";"


def test_sniff_ragged_and_gappy_stay_text():
    assert sniff_tabular("a,b,c\nd,e\nf,g,h\n") is None  # ragged
    # interior blank line = blank-separated prose, not a rectangle
    assert sniff_tabular("a,b,c\nd,e,f\n\ng,h,i\n") is None
    # leading blank line disqualifies too
    assert sniff_tabular("\na\tb\nc\td\n") is None
    # trailing newline's empty row is fine (tested via the promotions
    # above, which all end with \n)


def test_quoted_fields_embedded_delims_and_newlines():
    src = '"a,1",b,c\n"line\nbreak",e,f\n"he said ""hi""",h,i\n'
    assert sniff_tabular(src) == ","
    got = [b.text for b in tabular_blocks(src)]
    assert got == ["a,1 b c", "line\nbreak e f", 'he said "hi" h i']


def test_empty_cells_drop_in_the_join():
    src = "a\t\tb\n\tc\t\nd\te\tf\n"
    assert sniff_tabular(src) == "\t"
    assert [b.text for b in tabular_blocks(src)] == ["a b", "c", "d e f"]


def test_encoder_cross_delimiter_cells_cannot_flip_the_sniff():
    # tab-bearing cells in a comma rectangle: QUOTE_ALL makes the tab
    # parse fail strict, so the sniff resolves the intended delimiter
    raw = encode_dsv(["x\ty", "p\tq", "m\tn"], delimiter=",").decode()
    assert sniff_tabular(raw) == ","
    assert [b.text for b in tabular_blocks(raw)] \
        == ["x\ty", "p\tq", "m\tn"]


def test_markdown_docs_are_not_stolen_by_the_tabular_sniff():
    # blank-line-separated constructs, even with uniform comma counts,
    # never form a rectangle (interior blank rows)
    md = "# a,b,c\n\nd,e,f\n\ng,h,i\n"
    assert sniff_tabular(md) is None
    assert multimodal.probe_real_media(md.encode(), deep=True)[0] == "md"


def test_probe_split_shallow_window():
    # a rectangle continuing past the 4096-byte window still promotes
    # on the window prefix (partial final line dropped)
    long = ("field one\tfield two\tfield three\n" * 400).encode()
    assert len(long) > 4096
    assert multimodal.probe_real_media(long, deep=False)[0] == "csv"
    assert multimodal.probe_real_media(long, deep=True)[0] == "csv"
