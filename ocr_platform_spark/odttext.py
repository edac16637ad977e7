"""ODT (OpenDocument Text) extraction — the LibreOffice/OpenOffice
member of the office tier.

An ``.odt`` is a ZIP whose first member is conventionally ``mimetype``
(``application/vnd.oasis.opendocument.text``) and whose document body
lives in ``content.xml`` under the ODF text namespace. The zip
refinement ladder (:func:`..multimodal.probe_real_media`) recognizes it
by the ``mimetype`` member's value, falling back to ``content.xml``
presence with an ODF namespace — after the OOXML/EPUB markers have
declined.

Block model: one reflowable page (like DOCX); one block per non-empty
``<text:p>`` or ``<text:h>`` in document order (list items and table
cells nest their own paragraphs, which ``iter()`` visits in document
order; ``text:p`` never nests inside ``text:p``). Within a paragraph,
``<text:line-break/>`` becomes a line break, ``<text:tab/>`` and
``<text:s/>`` become spaces (``text:s text:c="N"`` expands to N),
``<text:span>`` formatting is transparent, and note bodies
(``<text:note>`` — footnotes/endnotes render outside the text flow)
are dropped, the ODF analog of the DOCX tier's invisible-text rule.
Lines then strip and join with ``\\n`` — the shared multi-line-block
rule.

Quarantine: corrupt/truncated zip, CRC mismatch, encrypted members,
missing ``content.xml``, malformed XML.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree

from .docxtext import _open_docx as _open_zip
from .plaintext import TextParagraph
from .pptxtext import _parse_member

TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_MIMETYPE = b"application/vnd.oasis.opendocument.text"
_CONTENT = "content.xml"

_T_P = f"{{{TEXT_NS}}}p"
_T_H = f"{{{TEXT_NS}}}h"
_T_TAB = f"{{{TEXT_NS}}}tab"
_T_BREAK = f"{{{TEXT_NS}}}line-break"
_T_S = f"{{{TEXT_NS}}}s"
_T_NOTE = f"{{{TEXT_NS}}}note"


def is_odt(zf: zipfile.ZipFile) -> bool:
    names = set(zf.namelist())
    if "mimetype" in names:
        try:
            return zf.read("mimetype").strip() == _MIMETYPE
        except Exception:
            return False
    # mimetype-less writers: content.xml whose head carries an ODF
    # namespace (a streaming 512-byte partial inflate — generic zips
    # that happen to hold a content.xml stay quarantined)
    if _CONTENT not in names:
        return False
    try:
        with zf.open(_CONTENT) as fh:
            return b"opendocument" in fh.read(512)
    except Exception:
        return False


def probe_odt(raw: bytes, deep: bool = False) -> tuple[int, int, int]:
    """Pre-flight: ``(n_pages=1, width=0, height=0)`` — ODT is
    reflowable like DOCX. Shallow checks ``content.xml`` presence; deep
    inflates + XML-parses it (CRC verified)."""
    with _open_zip(raw) as zf:
        if _CONTENT not in zf.namelist():
            raise ValueError("ODT container has no content.xml")
        if deep:
            _parse_member(zf, _CONTENT)
    return 1, 0, 0


def _paragraph_text(p: ElementTree.Element) -> str:
    """Visible text of one text:p / text:h, via a manual child walk
    (``itertext()`` cannot express tab/space/line-break elements or the
    note drop)."""
    parts: list[str] = []

    def _walk(el: ElementTree.Element) -> None:
        if el.text:
            parts.append(el.text)
        for child in el:
            if child.tag == _T_NOTE:
                pass  # footnote/endnote bodies are not flow text
            elif child.tag == _T_BREAK:
                parts.append("\n")
            elif child.tag == _T_TAB:
                parts.append(" ")
            elif child.tag == _T_S:
                parts.append(" " * int(child.get(f"{{{TEXT_NS}}}c", "1")))
            else:
                _walk(child)
            if child.tail:
                parts.append(child.tail)

    _walk(p)
    return "\n".join(
        line.strip() for line in "".join(parts).split("\n")
        if line.strip()
    )


def paragraph_blocks(raw: bytes) -> list[TextParagraph]:
    """ODT bytes -> non-empty paragraph/heading blocks in document
    order. The walk SKIPS ``text:note`` subtrees entirely — a
    paragraph inside a footnote body must not surface as a flow block
    (``root.iter()`` would leak it)."""
    with _open_zip(raw) as zf:
        root = _parse_member(zf, _CONTENT)
    out: list[TextParagraph] = []
    counter = [0]

    def _walk(el: ElementTree.Element) -> None:
        for child in el:
            if child.tag == _T_NOTE:
                continue
            if child.tag in (_T_P, _T_H):
                text = _paragraph_text(child)
                if text:
                    out.append(TextParagraph(counter[0], text))
                counter[0] += 1
            else:
                _walk(child)

    _walk(root)
    return out


# --- minimal writer (tests / fixtures) ---------------------------------------

import io  # noqa: E402

from .docxtext import _xml_escape  # noqa: E402


def encode_odt(paragraphs: list[str]) -> bytes:
    """Minimal structurally-valid ODT: stored (uncompressed) first
    ``mimetype`` member per the ODF packaging convention, one
    ``<text:p>`` per entry, internal ``\\n``s as
    ``<text:line-break/>``."""
    body = []
    for text in paragraphs:
        runs = "<text:line-break/>".join(
            _xml_escape(line) for line in text.split("\n")
        )
        body.append(f"<text:p>{runs}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" '
        f'xmlns:text="{TEXT_NS}"><office:body><office:text>'
        + "".join(body)
        + "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"), _MIMETYPE,
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr("content.xml", content)
    return buf.getvalue()
