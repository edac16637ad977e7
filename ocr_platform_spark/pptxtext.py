"""PPTX (PresentationML) slide-text extraction — the office tier's
multi-PAGE member.

A ``.pptx`` is a ZIP whose slides live one-per-member at
``ppt/slides/slideN.xml``; :func:`..multimodal.probe_real_media`
refines a ``PK``-magic payload into ``pptx`` when
``ppt/presentation.xml`` is present (after ``word/document.xml`` has
declined — see the zip refinement ladder there). Unlike DOCX/HTML/plain
text, a deck is genuinely PAGED: each slide is one page, so the
pipeline's page-bucket shuffle (skew fix for 300-slide decks) and the
probe-time payload slicing both apply — a sliced bucket carries a
sub-zip holding only its own slides' members, the office analog of
:class:`..pdfcodec._Slicer`'s byte-range story.

Slide order: numeric ``N`` in the member name. (Strictly, order is
defined by ``ppt/_rels/presentation.xml.rels`` indirection; PowerPoint
and every mainstream writer number members in presentation order, and
the pragmatic rule keeps the probe a directory walk. Documented
trade-off.)

Block model per slide: one block per DrawingML paragraph (``<a:p>``),
in document order across the slide's shapes; ``<a:t>`` run text
concatenates, ``<a:br/>`` becomes a line break, lines strip and join
with ``\\n`` — the shared multi-line-block rule. Speaker notes
(``ppt/notesSlides/``) and slide masters/layouts are presentation
chrome, deliberately unread — the deck analog of the DOM tier's
boilerplate drop.

Quarantine: truncated/corrupt zip, CRC mismatch on a slide member,
encrypted members, malformed XML, a deck with no slides.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

from .docxtext import _open_docx as _open_zip
from .plaintext import TextParagraph

#: DrawingML main namespace (text runs live here, not in the
#: PresentationML ``p:`` namespace)
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_MARKER = "ppt/presentation.xml"
_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")

_A_P = f"{{{A_NS}}}p"
_A_T = f"{{{A_NS}}}t"
_A_BR = f"{{{A_NS}}}br"


def _slide_members(zf: zipfile.ZipFile) -> list[str]:
    """Slide member names in presentation (numeric) order."""
    slides: list[tuple[int, str]] = []
    for name in zf.namelist():
        m = _SLIDE_RE.match(name)
        if m:
            slides.append((int(m.group(1)), name))
    slides.sort()
    return [name for _n, name in slides]


def is_pptx(zf: zipfile.ZipFile) -> bool:
    return _MARKER in zf.namelist()


def probe_pptx(raw: bytes, deep: bool = False) -> tuple[int, int, int]:
    """Pre-flight: ``(n_slides, width=0, height=0)`` — slides are
    reflowable pages with no raster geometry. Shallow is a
    central-directory walk (slide count only, no member inflated); deep
    additionally inflates + XML-parses every slide (CRC verified), so
    member corruption quarantines before the payload is duplicated."""
    with _open_zip(raw) as zf:
        slides = _slide_members(zf)
        if not slides:
            raise ValueError("PPTX with no ppt/slides/slideN.xml members")
        if deep:
            for name in slides:
                _parse_member(zf, name)
    return len(slides), 0, 0


def _parse_member(zf: zipfile.ZipFile, name: str) -> ElementTree.Element:
    try:
        data = zf.read(name)  # CRC-32 verified by zipfile here
    except Exception as e:
        raise ValueError(f"unreadable {name}: {e}") from e
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed XML in {name}: {e}") from e


def _slide_blocks(root: ElementTree.Element) -> list[TextParagraph]:
    out: list[TextParagraph] = []
    i = 0
    for p in root.iter(_A_P):
        parts: list[str] = []
        for el in p.iter():
            if el.tag == _A_T:
                parts.append(el.text or "")
            elif el.tag == _A_BR:
                parts.append("\n")
        text = "\n".join(
            line.strip() for line in "".join(parts).split("\n")
            if line.strip()
        )
        if text:
            out.append(TextParagraph(i, text))
        i += 1
    return out


def slide_blocks(
    raw: bytes, page_indices: "list[int] | range | None" = None
) -> list[list[TextParagraph]]:
    """PPTX bytes -> per-slide block lists, in presentation order.
    ``page_indices`` selects slides by GLOBAL position (the bucket
    contract — a sliced payload passes ``None`` and gets its own slides
    back in order)."""
    with _open_zip(raw) as zf:
        names = _slide_members(zf)
        if page_indices is not None:
            names = [names[i] for i in page_indices]
        return [_slide_blocks(_parse_member(zf, n)) for n in names]


def slice_slides(raw: bytes, page_indices) -> bytes:
    """Probe-time bucket slicing: a minimal sub-PPTX holding ONLY the
    selected slides' members (plus the marker + content-types so the
    slice still probes as a PPTX) — the office analog of
    ``pdfcodec._Slicer``: the deck's bytes cross the bucket shuffle
    ~once in total instead of ⌈slides/K⌉ full copies. Selected slides
    keep their ORIGINAL member numbering, so slide order (numeric sort)
    is preserved and ``slide_blocks(sliced)`` yields exactly the
    bucket's pages, locally indexed."""
    with _open_zip(raw) as zf:
        names = _slide_members(zf)
        try:
            keep = {names[i] for i in page_indices}
        except IndexError as e:
            raise ValueError(f"slide index out of range: {e}") from e
        keep.add(_MARKER)
        keep.add("[Content_Types].xml")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as out:
            for name in zf.namelist():
                if name in keep:
                    try:
                        data = zf.read(name)
                    except Exception as e:
                        # CRC/deflate corruption in a member the deep
                        # probe does not parse (e.g. content-types) —
                        # quarantine, never a raw BadZipFile off an
                        # executor (fuzz-pinned)
                        raise ValueError(
                            f"unreadable {name}: {e}"
                        ) from e
                    out.writestr(name, data)
    return buf.getvalue()


# --- minimal writer (tests / fixtures) ---------------------------------------

_PPTX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/'
    'xml"/><Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/></Types>'
)
_PRESENTATION = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
    'presentationml/2006/main"/>'
)

from .docxtext import _xml_escape  # noqa: E402  (shared escaping rule)


def encode_pptx(slides: list[list[str]]) -> bytes:
    """Minimal structurally-valid PPTX: one ``slideN.xml`` per entry,
    one ``<a:p>`` per block, internal ``\\n``s as ``<a:br/>`` runs."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _PPTX_CONTENT_TYPES)
        zf.writestr(_MARKER, _PRESENTATION)
        for n, blocks in enumerate(slides, start=1):
            body = []
            for text in blocks:
                runs = "<a:br/>".join(
                    f"<a:r><a:t>{_xml_escape(line)}</a:t></a:r>"
                    for line in text.split("\n")
                )
                body.append(f"<a:p>{runs}</a:p>")
            slide = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
                'presentationml/2006/main" '
                f'xmlns:a="{A_NS}"><p:cSld><p:spTree><p:sp><p:txBody>'
                + "".join(body)
                + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
            )
            zf.writestr(f"ppt/slides/slide{n}.xml", slide)
    return buf.getvalue()
