"""XML tier — feeds, sitemaps, generic data XML.

Tier pin (flagship span equality over encode_xml re-encodings) plus
semantic pins for every rule in the xmltext module docstring: leaf
strip-lines-join, mixed-content tail emission, feed rich-content
elements through the DOM walk (escaped AND CDATA HTML), DTD refusal,
truncated-markup quarantine (the protection the plain-text tier's
leading-'<' refusal used to provide, now enforced by the strict parse).
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import corpus, multimodal, schemas, xmltext
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks


def content_xml(payload: bytes) -> bytes:
    _kind, rasters = _render_pages(payload)
    blocks: list[str] = []
    for img in rasters:
        blocks.extend(t for _y1, _x1, t in page_ocr_blocks(img))
    return xmltext.encode_xml(blocks)


@pytest.fixture(scope="module")
def xml_corpus(spark):
    docs, media = corpus.generate(24, seed=6161, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    xml = spark.createDataFrame(
        [(ref, bytearray(content_xml(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    return docs_df, synth, xml


def test_xml_pipeline_equals_flagship(xml_corpus):
    docs_df, synth, xml = xml_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(extract_real.extract_real_documents(docs_df, xml))
    assert got == flagship


def test_probe_names_xml_both_depths(xml_corpus):
    _docs, _synth, xml = xml_corpus
    for r in xml.collect():
        raw = bytes(r["data"])
        assert multimodal.probe_real_media(raw, deep=True)[0] == "xml"
        assert multimodal.probe_real_media(raw, deep=False)[0] == "xml"


# ---------------------------------------------------------------------------
# semantic pins
# ---------------------------------------------------------------------------

def texts(raw: bytes) -> list[str]:
    return [b.text for b in xmltext.xml_blocks(raw)]


def test_sitemap_leafs_strip_lines_join():
    sm = (b'<?xml version="1.0"?><urlset><url><loc>\n'
          b'  https://a.invalid/page\n</loc>'
          b'<lastmod>2024-01-01</lastmod></url></urlset>')
    assert texts(sm) == ["https://a.invalid/page", "2024-01-01"]


def test_mixed_content_emits_text_and_tails_in_order():
    assert texts(b"<doc><p>Hello <b>world</b> again</p></doc>") \
        == ["Hello", "world", "again"]


def test_rss_rich_elements_through_dom_walk():
    rss = (b'<rss version="2.0"><channel><title>My Feed</title>'
           b"<item><title>Post one</title><description>"
           b"&lt;p&gt;Hello &lt;b&gt;world&lt;/b&gt;&lt;/p&gt;"
           b"&lt;p&gt;Second para&lt;/p&gt;</description></item>"
           b"<item><title>Post two</title><description>"
           b"<![CDATA[Plain text with a <br/> break]]>"
           b"</description></item></channel></rss>")
    assert texts(rss) == ["My Feed", "Post one", "Hello world",
                          "Second para", "Post two",
                          "Plain text with a\nbreak"]


def test_atom_summary_and_nonfeed_description_literal():
    atom = (b'<feed xmlns="http://www.w3.org/2005/Atom">'
            b"<title>T</title><entry><summary>"
            b"&lt;p&gt;escaped&lt;/p&gt;</summary></entry></feed>")
    assert texts(atom) == ["T", "escaped"]
    # outside a feed root, 'description' is an ordinary leaf: literal
    generic = (b"<product><description>&lt;not&gt; a feed"
               b"</description></product>")
    assert texts(generic) == ["<not> a feed"]


def test_dtd_refusal_and_entity_strictness():
    bomb = (b'<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "b">]>'
            b"<x>&a;</x>")
    with pytest.raises(ValueError, match="DTD"):
        xmltext.xml_blocks(bomb)
    with pytest.raises(ValueError, match="not well-formed"):
        xmltext.xml_blocks(b"<x>&undefined;</x>")


def test_truncated_markup_still_quarantines():
    for payload in (b"  <svg><rect", b"<div>cut before close",
                    b"< notatag"):
        with pytest.raises(ValueError):
            multimodal.probe_real_media(payload, deep=True)


def test_wellformed_but_textless_xml_extracts_zero_blocks():
    assert texts(b"<svg><rect/></svg>") == []


def test_dtd_past_any_window_still_refused():
    far = (b'<?xml version="1.0"?><!--' + b"x" * 5000
           + b'--><!DOCTYPE r [<!ENTITY a "b">]><r>&a;</r>')
    with pytest.raises(ValueError, match="DTD"):
        xmltext.xml_blocks(far)


def test_script_style_subtrees_drop_tails_survive():
    xh = (b'<?xml version="1.0"?><html><head>'
          b"<style>.a{color:red}</style>"
          b'<script>var t="x";</script>after scripts</head>'
          b"<body><p>real</p></body></html>")
    assert texts(xh) == ["after scripts", "real"]


def test_feed_loose_text_around_blocks_survives():
    rss = (b"<rss><channel><item><description>Breaking intro "
           b"&lt;p&gt;details&lt;/p&gt; trailing outro"
           b"</description></item></channel></rss>")
    assert texts(rss) == ["Breaking intro", "details", "trailing outro"]


def test_deep_nesting_extracts_without_recursion_failure():
    deep = b"<a>" * 3000 + b"needle" + b"</a>" * 3000
    assert texts(deep) == ["needle"]


def test_comments_pis_attributes_never_emit():
    raw = (b'<?xml version="1.0"?><!-- top comment -->'
           b'<doc a="attr text"><?pi data?>'
           b"<!-- inner --><p>real</p></doc>")
    assert texts(raw) == ["real"]
