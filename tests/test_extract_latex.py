"""LaTeX tier — rendered-text semantics, pinned against the flagship.

Same two layers as the Markdown tier's suite: the end-to-end pin
(every flagship block re-encoded through rotating LaTeX constructs
that render back to the exact block text, whole pipeline span-equal to
the flagship) and renderer/sniff unit pins for every rule in the
latextext module docstring.
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import corpus, latextext, multimodal, schemas
from ocr_platform_spark.latextext import latex_blocks, sniff_latex
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks


def content_tex(payload: bytes) -> bytes:
    """Synthetic container -> a LaTeX document whose RENDERED blocks
    are the flagship's OCR blocks in reading order."""
    _kind, rasters = _render_pages(payload)
    blocks: list[str] = []
    for img in rasters:
        blocks.extend(t for _y1, _x1, t in page_ocr_blocks(img))
    return latextext.encode_latex(blocks)


@pytest.fixture(scope="module")
def tex_corpus(spark):
    docs, media = corpus.generate(24, seed=4242, max_pages=6)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    tex = spark.createDataFrame(
        [(ref, bytearray(content_tex(m["data"])))
         for ref, m in media.items()],
        "media_ref string, data binary",
    )
    return docs_df, synth, tex


def test_tex_pipeline_equals_flagship(tex_corpus):
    """EXACT span-sequence equality through the probe-promoted tex
    tier."""
    docs_df, synth, tex = tex_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(extract_real.extract_real_documents(docs_df, tex))
    assert got == flagship


def test_tex_probe_promotes(tex_corpus):
    docs_df, _synth, tex = tex_corpus
    for r in tex.collect():
        kind, n, _w, _h = multimodal.probe_real_media(
            bytes(r["data"]), deep=True)
        assert (kind, n) == ("tex", 1)
    # shallow window probe agrees
    [first] = tex.limit(1).collect()
    assert multimodal.probe_real_media(
        bytes(first["data"]), deep=False)[0] == "tex"


# ---------------------------------------------------------------------------
# renderer unit pins (one per documented rule)
# ---------------------------------------------------------------------------


def texts(src: str) -> list[str]:
    return [b.text for b in latex_blocks(src)]


def wrap(body: str) -> str:
    return ("\\documentclass{article}\n\\begin{document}\n"
            + body + "\n\\end{document}\n")


def test_comments_strip_and_escaped_percent_stays():
    got = texts(wrap("fifty\\% done % a comment\nnext line"))
    assert got == ["fifty% done next line"]


def test_title_recovered_from_preamble():
    src = ("\\documentclass{article}\n\\title{The \\emph{Title}}\n"
           "\\begin{document}\nbody text\n\\end{document}\n")
    assert texts(src) == ["The Title", "body text"]


def test_sections_and_starred():
    got = texts(wrap("\\section{Intro}\nafter\n\n"
                     "\\subsection*{Sub}\nmore"))
    assert got == ["Intro", "after", "Sub", "more"]


def test_soft_wraps_join_hard_breaks_stay():
    got = texts(wrap("line one\nline two\\\\line three"))
    assert got == ["line one line two\nline three"]


def test_math_drops_inline_and_display():
    got = texts(wrap("before $x^2$ mid \\(y\\) and \\[z\\] after\n\n"
                     "\\begin{equation}\ne=mc^2\n\\end{equation}\n\n"
                     "tail"))
    assert got == ["before mid and after", "tail"]


def test_lists_one_block_per_item():
    got = texts(wrap("\\begin{itemize}\n\\item alpha one\n"
                     "\\item beta \\emph{two}\n\\end{itemize}"))
    assert got == ["alpha one", "beta two"]


def test_figure_keeps_caption_only():
    got = texts(wrap("\\begin{figure}\n"
                     "\\includegraphics{p.pdf}\n"
                     "\\caption{kept caption}\n\\label{f}\n"
                     "\\end{figure}\n\ntail"))
    assert got == ["kept caption", "tail"]


def test_tabular_and_bibliography_drop_whole():
    got = texts(wrap("\\begin{tabular}{ll}\na & b \\\\\n"
                     "\\end{tabular}\n\n"
                     "\\begin{thebibliography}{9}\n"
                     "\\bibitem{k} Some Ref\n"
                     "\\end{thebibliography}\n\nkept"))
    assert got == ["kept"]


def test_verbatim_is_literal():
    got = texts(wrap("\\begin{verbatim}\nraw {x} \\cmd  spaced\n"
                     "\\end{verbatim}"))
    assert got == ["raw {x} \\cmd  spaced"]


def test_unknown_commands_unwrap_known_drop():
    got = texts(wrap("\\emph{kept} \\cite{gone} \\somestyle{also kept}"
                     " \\ref{fig:x} end"))
    assert got == ["kept also kept end"]


def test_url_href_footnote():
    got = texts(wrap("see \\url{http://x.org} or "
                     "\\href{http://y.org}{y text}"
                     " done\\footnote{a note}"))
    assert got == ["see http://x.org or y text done a note"]


def test_accents_compose():
    got = texts(wrap("Caf\\'e M\\\"uller Gau{\\ss} \\c{c}a "
                     "\\~nand\\'u"))
    assert got == ["Café Müller Gauß ça ñandú"]


def test_ties_and_escapes():
    got = texts(wrap("J.~Doe has 50\\% \\& a\\_b"))
    assert got == ["J. Doe has 50% & a_b"]


def test_sniff_requires_document_structure():
    assert sniff_latex("\\documentclass[11pt]{article}\nx")
    assert sniff_latex("text\n\\begin{document}\nx\n\\end{document}")
    assert not sniff_latex("prose with \\textbf{bold} only")
    assert not sniff_latex("\\begin{document} but never closed")
    # a commented-out documentclass does not promote
    assert not sniff_latex("% \\documentclass{article}\nplain")


def test_inline_begin_end_never_leak_env_name():
    got = texts(wrap("text with inline \\begin{small}tiny\\end{small}"
                     " words"))
    assert got == ["text with inline tiny words"]


def test_text_before_inline_item_is_kept():
    got = texts(wrap("\\begin{itemize}\nlead in \\item alpha\n"
                     "\\item beta\n\\end{itemize}"))
    assert got == ["lead in", "alpha", "beta"]


def test_adversarial_nesting_never_recursion_errors():
    deep = "\\href{u}{" * 2000 + "x" + "}" * 2000
    blocks = latex_blocks(wrap(deep))
    assert isinstance(blocks, list)  # degrades, never raises
