"""Markdown tier — rendered-text semantics, pinned against the flagship.

Two layers:

* the tier pin (same construction as test_extract_text_plain): every
  flagship block re-encoded through a ROTATING markdown construct (ATX,
  fence, setext, list item, blockquote, strong, link, hard-break
  paragraph) that renders back to the exact block text, then the whole
  pipeline asserted span-for-span equal to the flagship. That one
  assertion covers probe promotion (txt -> md), the renderer, block
  ordering and the shared span assembly.
* renderer/sniff unit pins for the documented CommonMark subset —
  every rule in the mdtext module docstring has a case here, so a
  future edit that silently changes rendered text fails loudly.
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import corpus, mdtext, multimodal, schemas
from ocr_platform_spark.mdtext import markdown_blocks, render_inline, \
    sniff_markdown
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks


def content_md(payload: bytes) -> bytes:
    """Synthetic container -> a markdown document whose RENDERED blocks
    are the flagship's OCR blocks in reading order."""
    _kind, rasters = _render_pages(payload)
    blocks: list[str] = []
    for img in rasters:
        blocks.extend(t for _y1, _x1, t in page_ocr_blocks(img))
    return mdtext.encode_markdown(blocks)


@pytest.fixture(scope="module")
def md_corpus(spark):
    docs, media = corpus.generate(24, seed=2121, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    md = spark.createDataFrame(
        [(ref, bytearray(content_md(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    return docs_df, synth, md


def test_md_pipeline_equals_flagship(md_corpus):
    """EXACT span-sequence equality — every synthetic media re-encoded
    as rotating-construct markdown extracts the identical interleaved
    span arrays through the probe-promoted md tier."""
    docs_df, synth, md = md_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(extract_real.extract_real_documents(docs_df, md))
    assert got == flagship


def test_md_probe_promotes_and_txt_stays(md_corpus):
    """The deep probe names rotating-construct docs 'md'; the same
    blocks as bare paragraphs stay 'txt' (no false promotion)."""
    docs_df, synth, md = md_corpus
    raws = [bytes(r["data"]) for r in md.collect()]
    promoted = empty = 0
    for raw in raws:
        if not raw.strip():
            # a zero-block media encodes to whitespace only, which the
            # strict text contract quarantines (same as the txt tier)
            with pytest.raises(ValueError):
                multimodal.probe_real_media(raw, deep=True)
            empty += 1
            continue
        kind, n, w, h = multimodal.probe_real_media(raw, deep=True)
        assert (kind, n, w, h) == ("md", 1, 0, 0)
        promoted += 1
    assert promoted + empty == len(raws) and promoted > 0
    plain = b"alpha beta\ngamma\n\nsecond paragraph\n"
    assert multimodal.probe_real_media(plain, deep=True)[0] == "txt"


# ---------------------------------------------------------------------------
# renderer unit pins (one per documented subset rule)
# ---------------------------------------------------------------------------

def texts(src: str) -> list[str]:
    return [b.text for b in markdown_blocks(src)]


def test_atx_headings():
    assert texts("# One\n\n###### Six deep") == ["One", "Six deep"]
    # trailing closing hashes drop only when whitespace-preceded
    assert texts("## Title ##") == ["Title"]
    assert texts("# 0#") == ["0#"]
    # an all-hash body is a closing sequence: empty heading, no block
    assert texts("# ###") == []
    # 7+ hashes is not a heading -> paragraph with literal hashes
    assert texts("####### nope") == ["####### nope"]


def test_setext_headings_and_thematic_precedence():
    assert texts("Title\n=====\n\nSub\n---") == ["Title", "Sub"]
    # a lone --- with no paragraph above is a thematic break: nothing
    assert texts("---\n\ntext") == ["text"]
    # thematic breaks emit nothing and split paragraphs
    assert texts("a\n\n***\n\nb") == ["a", "b"]


def test_soft_wraps_join_and_hard_breaks_newline():
    assert texts("one\ntwo\nthree") == ["one two three"]
    assert texts("one  \ntwo") == ["one\ntwo"]
    assert texts("one\\\ntwo") == ["one\ntwo"]


def test_fenced_code_verbatim_and_unclosed_closes_at_eof():
    src = "```python\n# not a heading\n\n  indented **raw**\n```"
    assert texts(src) == ["# not a heading\n\n  indented **raw**"]
    assert texts("~~~\nlit\n~~~") == ["lit"]
    # unclosed fence runs to EOF per spec
    assert texts("```\na\nb") == ["a\nb"]
    # a shorter/other-char run does not close
    assert texts("````\n```\ncode\n````") == ["```\ncode"]


def test_indented_code_verbatim():
    assert texts("    x = 1\n    y = 2") == ["x = 1\ny = 2"]
    # 4-space content never misparses as a list
    assert texts("    - not a list") == ["- not a list"]


def test_lists_one_block_per_item():
    got = texts("- first\n- second line\n  continues\n\n1. ordered\n"
                "2) paren")
    assert got == ["first", "second line continues", "ordered", "paren"]


def test_block_starts_end_a_list_item():
    got = texts("- item one\n# Section Title\n\n- item two\n"
                "```\ncode\n```")
    assert got == ["item one", "Section Title", "item two", "code"]


def test_deep_quote_nesting_never_recursion_errors():
    src = "# t\n" + "> " * 5000 + "boom"
    assert texts(src) == ["t", "boom"]


def test_thematic_break_is_not_a_list_item():
    assert texts("- - -\n\n- real item") == ["real item"]


def test_blockquotes_flatten_with_lazy_continuation():
    assert texts("> quoted\n> more") == ["quoted more"]
    # lazy continuation stays in the quote
    assert texts("> quoted\nlazy") == ["quoted lazy"]
    # nested markers flatten through recursive re-parse
    assert texts("> > deep") == ["deep"]


def test_inline_rules():
    assert render_inline("**bold** and *em* and __u__ and _v_") \
        == "bold and em and u and v"
    assert render_inline("***nested* strong**") == "nested strong"
    # intraword underscores survive (identifiers)
    assert render_inline("foo_bar_baz") == "foo_bar_baz"
    assert render_inline("[anchor](https://x.invalid)") == "anchor"
    assert render_inline("![alt text](img.png)") == "alt text"
    assert render_inline("<https://a.invalid/p>") == "https://a.invalid/p"
    # code spans are literal: emphasis inside must not strip
    assert render_inline("`*lit*` after") == "*lit* after"
    assert render_inline("``a `tick` b``") == "a `tick` b"
    # raw inline HTML drops; entities resolve
    assert render_inline("a <br/> b &amp; c &#65;") == "a  b & c A"
    # backslash escapes are literal characters
    assert render_inline(r"\*not em\*") == "*not em*"


def test_out_of_subset_degrades_to_paragraph_text():
    # tables / reference links parse as plain paragraph lines
    assert texts("| a | b |\n| - | - |") == ["| a | b | | - | - |"]


# ---------------------------------------------------------------------------
# sniff pins (promotion policy)
# ---------------------------------------------------------------------------

def test_sniff_strong_signals_promote_alone():
    assert sniff_markdown("# Title\nbody")
    assert sniff_markdown("```\ncode\n```")


def test_sniff_one_medium_signal_stays_text():
    # shopping list, quoted email, incidental link: literal text wins
    assert not sniff_markdown("- milk\n- eggs\n- bread")
    assert not sniff_markdown("> quoted email body\n> second line")
    assert not sniff_markdown("see [this](https://x.invalid) for more")
    assert not sniff_markdown("plain prose with an * asterisk")


def test_sniff_two_distinct_medium_signals_promote():
    assert sniff_markdown("- [a](https://x.invalid)\n- b item")
    assert sniff_markdown("Title\n=====\n\n> quoted intro")
