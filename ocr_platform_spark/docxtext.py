"""DOCX (WordprocessingML) main-text extraction — the office-document
OCR-bypass tier.

A web-scale crawl's office long tail is dominated by ``.docx``: a ZIP
container (``PK\\x03\\x04``) holding ``word/document.xml``, whose body
is a flat run of ``<w:p>`` paragraphs (table cells nest their own
``<w:p>``s). Everything needed to extract it is stdlib: ``zipfile`` +
``xml.etree``. The reference has no office path at all (it OCRs
uploaded PDFs/images only, ``apps/worker/app/tasks/ocr_tasks.py:36-39``).

Dispatch: :func:`..formats.sniff_kind` names any ``PK\\x03\\x04``
payload ``"zip"``; :func:`probe_docx` then refines it — a zip whose
namelist carries ``word/document.xml`` is a DOCX, every other zip
quarantines (extracting an arbitrary archive's members as document text
would be silent garbage; XLSX/PPTX/EPUB each need their own tier).

Block model: one ``TextParagraph`` per non-empty ``<w:p>``, in document
order (``iter()`` is document-order for nested table paragraphs too;
``w:p`` never nests inside ``w:p``). Within a paragraph, ``<w:t>`` run
text concatenates, ``<w:br/>`` and ``<w:cr/>`` become line breaks and
``<w:tab/>`` a space; lines then strip and join with ``\\n`` — the same
multi-line-block normalization as the DOM and plain-text tiers, so a
paragraph maps 1:1 onto a multi-line OCR block. Tracked-change deletions
(``w:delText``) and field instruction text (``w:instrText``) are NOT
visible document text and never emit. Headers/footers/footnotes live in
other zip members (``word/header*.xml``) which this tier deliberately
does not read — the office analog of the DOM tier's boilerplate drop.

Geometry: none (reflowable), so blocks carry their paragraph ordinal as
detection-shaped boxes (``y1`` = ordinal, ``x1`` = 0) — monotone in
document order for the global ``(page, y1, x1)`` span sort.

Quarantine contract (every path raises ``ValueError``, the pipeline's
probe-time triage): truncated/corrupt zip structure, a zip that is not
a DOCX, encrypted members, CRC mismatch on the document part (zipfile
verifies CRC-32 during read — DOCX is the one media kind here whose
container checksums its payload), and malformed XML.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

from .plaintext import TextParagraph

#: WordprocessingML main namespace (ECMA-376 / ISO 29500 transitional —
#: what Word itself writes)
W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_DOC_PART = "word/document.xml"

_W_P = f"{{{W_NS}}}p"
_W_T = f"{{{W_NS}}}t"
_W_BR = f"{{{W_NS}}}br"
_W_CR = f"{{{W_NS}}}cr"
_W_TAB = f"{{{W_NS}}}tab"


def _open_docx(raw: bytes) -> zipfile.ZipFile:
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception as e:  # BadZipFile, struct.error on truncation
        raise ValueError(f"not a readable zip container: {e}") from e
    return zf


def probe_docx(raw: bytes, deep: bool = False) -> tuple[int, int, int]:
    """Pre-flight: ``(n_pages=1, width=0, height=0)`` — DOCX is
    reflowable (page breaks are a render-time artifact of fonts/margins;
    there is no raster geometry to report).

    Shallow (the header-walk metadata probe): central-directory read +
    ``word/document.xml`` presence — O(directory), no member inflated.
    Deep (the extraction probe): additionally inflates and XML-parses
    the document part, so CRC mismatches, encrypted members, zlib-level
    corruption and malformed XML all quarantine HERE, before the payload
    is duplicated into page buckets."""
    with _open_docx(raw) as zf:
        if _DOC_PART not in zf.namelist():
            raise ValueError(
                "zip container is not a DOCX (no word/document.xml)"
            )
        if deep:
            _parse_document(zf)
    return 1, 0, 0


def _parse_document(zf: zipfile.ZipFile) -> ElementTree.Element:
    try:
        data = zf.read(_DOC_PART)  # CRC-32 verified by zipfile here
    except Exception as e:  # BadZipFile (CRC), RuntimeError (encrypted),
        raise ValueError(  # zlib.error (corrupt deflate stream)
            f"unreadable word/document.xml: {e}"
        ) from e
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed WordprocessingML: {e}") from e


def _paragraph_text(p: ElementTree.Element) -> str:
    """Visible text of one ``<w:p>``: w:t runs + explicit breaks, then
    the shared strip-lines-join-\\n normalization."""
    parts: list[str] = []
    for el in p.iter():
        if el.tag == _W_T:
            parts.append(el.text or "")
        elif el.tag in (_W_BR, _W_CR):
            parts.append("\n")
        elif el.tag == _W_TAB:
            parts.append(" ")
    body = "".join(parts)
    return "\n".join(
        line.strip() for line in body.split("\n") if line.strip()
    )


def paragraph_blocks(raw: bytes) -> list[TextParagraph]:
    """DOCX bytes -> non-empty paragraphs in document order (the same
    detection-shaped duck type the DOM/plain-text tiers emit)."""
    with _open_docx(raw) as zf:
        root = _parse_document(zf)
    out: list[TextParagraph] = []
    for i, p in enumerate(root.iter(_W_P)):
        text = _paragraph_text(p)
        if text:
            out.append(TextParagraph(i, text))
    return out


# --- minimal writer (tests / fixtures; also a usable result sink) -----------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="word/document.xml"/></Relationships>'
)

_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _xml_escape(s: str) -> str:
    for pat, rep in _XML_ESCAPES:
        s = s.replace(pat, rep)
    return s


def encode_docx(paragraphs: list[str]) -> bytes:
    """Minimal structurally-valid DOCX: one ``<w:p>`` per entry, a
    paragraph's internal ``\\n``s as explicit ``<w:br/>``s (the inverse
    of :func:`_paragraph_text`'s line rule). ``xml:space="preserve"``
    keeps run text verbatim through conforming XML parsers."""
    body: list[str] = []
    for text in paragraphs:
        runs = '<w:r><w:br/></w:r>'.join(
            f'<w:r><w:t xml:space="preserve">{_xml_escape(line)}</w:t>'
            "</w:r>"
            for line in text.split("\n")
        )
        body.append(f"<w:p>{runs}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr(_DOC_PART, doc)
    return buf.getvalue()
