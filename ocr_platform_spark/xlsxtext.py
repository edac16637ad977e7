"""XLSX (SpreadsheetML) cell-text extraction — the office tier's
tabular member.

A ``.xlsx`` is a ZIP whose marker part is ``xl/workbook.xml``;
worksheets live one-per-member at ``xl/worksheets/sheetN.xml`` and
string-typed cells indirect through the ``xl/sharedStrings.xml`` table.
Like PPTX, a workbook is genuinely PAGED — each sheet is one page — so
the page-bucket shuffle and probe-time payload slicing apply (a sliced
bucket carries only its own sheets' members plus the shared-strings
table every sheet may reference).

Sheet order: numeric ``N`` in the member name (the same pragmatic rule
as :mod:`..pptxtext`'s slides; strict order is workbook.xml rels
indirection, which mainstream writers keep aligned with numbering).

Block model per sheet: one block per non-empty row, cells in document
order joined with a single space — the tabular analog of the DOM tier's
table-cell walk (``td``/``th`` blocks). Cell values: shared strings
(``t="s"``, rich runs concatenated), inline strings
(``t="inlineStr"``), cached formula strings (``t="str"``), booleans
rendered ``TRUE``/``FALSE``, and raw numeric text verbatim (rendering a
float through a number FORMAT is presentation, not content — the raw
value is the honest extraction). Multi-line cell text folds under the
shared strip-lines-join rule.

Quarantine: truncated/corrupt zip, CRC mismatch, encrypted members,
malformed XML, a shared-string index out of table range, a workbook
with no sheets.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

from .docxtext import _open_docx as _open_zip
from .docxtext import _xml_escape
from .plaintext import TextParagraph
from .pptxtext import _parse_member

#: SpreadsheetML main namespace
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_MARKER = "xl/workbook.xml"
_SHARED = "xl/sharedStrings.xml"
_SHEET_RE = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")

_S_ROW = f"{{{S_NS}}}row"
_S_C = f"{{{S_NS}}}c"
_S_V = f"{{{S_NS}}}v"
_S_IS = f"{{{S_NS}}}is"
_S_T = f"{{{S_NS}}}t"
_S_SI = f"{{{S_NS}}}si"


def _sheet_members(zf: zipfile.ZipFile) -> list[str]:
    sheets: list[tuple[int, str]] = []
    for name in zf.namelist():
        m = _SHEET_RE.match(name)
        if m:
            sheets.append((int(m.group(1)), name))
    sheets.sort()
    return [name for _n, name in sheets]


def is_xlsx(zf: zipfile.ZipFile) -> bool:
    return _MARKER in zf.namelist()


def probe_xlsx(raw: bytes, deep: bool = False) -> tuple[int, int, int]:
    """Pre-flight: ``(n_sheets, width=0, height=0)``. Shallow is a
    central-directory walk; deep inflates + XML-parses every sheet and
    the shared-strings table (CRC verified) and bounds-checks every
    shared-string reference, so corruption quarantines before the
    payload is duplicated."""
    with _open_zip(raw) as zf:
        sheets = _sheet_members(zf)
        if not sheets:
            raise ValueError("XLSX with no xl/worksheets/sheetN.xml members")
        if deep:
            shared = _shared_strings(zf)
            for name in sheets:
                _rows(_parse_member(zf, name), shared, name)
    return len(sheets), 0, 0


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if _SHARED not in zf.namelist():
        return []
    root = _parse_member(zf, _SHARED)
    out: list[str] = []
    for si in root.iter(_S_SI):
        # rich-text runs: concatenate every <t> descendant
        out.append("".join(t.text or "" for t in si.iter(_S_T)))
    return out


def _cell_text(c: ElementTree.Element, shared: list[str],
               member: str) -> str:
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(_S_IS)
        if is_el is None:
            return ""
        return "".join(t.text or "" for t in is_el.iter(_S_T))
    v = c.find(_S_V)
    if v is None or v.text is None:
        return ""
    if ctype == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError) as e:
            raise ValueError(
                f"shared-string reference {v.text!r} out of range in "
                f"{member}"
            ) from e
    if ctype == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    # "str" (cached formula string), "e" (error literal), "n"/default
    # (raw numeric text, verbatim — number formats are presentation)
    return v.text


def _rows(root: ElementTree.Element, shared: list[str],
          member: str) -> list[TextParagraph]:
    out: list[TextParagraph] = []
    for i, row in enumerate(root.iter(_S_ROW)):
        cells = [
            _cell_text(c, shared, member) for c in row.iter(_S_C)
        ]
        body = " ".join(c for c in cells if c.strip())
        text = "\n".join(
            line.strip() for line in body.split("\n") if line.strip()
        )
        if text:
            out.append(TextParagraph(i, text))
    return out


def sheet_blocks(
    raw: bytes, page_indices: "list[int] | range | None" = None
) -> list[list[TextParagraph]]:
    """XLSX bytes -> per-sheet row-block lists, in workbook order.
    ``page_indices`` selects sheets by GLOBAL position (the bucket
    contract — a sliced payload passes ``None``)."""
    with _open_zip(raw) as zf:
        names = _sheet_members(zf)
        if page_indices is not None:
            names = [names[i] for i in page_indices]
        shared = _shared_strings(zf)
        return [_rows(_parse_member(zf, n), shared, n) for n in names]


def slice_sheets(raw: bytes, page_indices) -> bytes:
    """Probe-time bucket slicing: a minimal sub-XLSX holding ONLY the
    selected sheets' members plus the shared-strings table (every sheet
    may reference it), the marker and content-types. Original member
    numbering is kept, so sheet order survives."""
    with _open_zip(raw) as zf:
        names = _sheet_members(zf)
        try:
            keep = {names[i] for i in page_indices}
        except IndexError as e:
            raise ValueError(f"sheet index out of range: {e}") from e
        keep.update((_MARKER, _SHARED, "[Content_Types].xml"))
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as out:
            for name in zf.namelist():
                if name in keep:
                    try:
                        data = zf.read(name)
                    except Exception as e:
                        # CRC/deflate corruption in a member the deep
                        # probe does not parse — quarantine, never a
                        # raw BadZipFile off an executor (fuzz-pinned)
                        raise ValueError(
                            f"unreadable {name}: {e}"
                        ) from e
                    out.writestr(name, data)
    return buf.getvalue()


# --- minimal writer (tests / fixtures) ---------------------------------------

_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/'
    'xml"/></Types>'
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{S_NS}"/>'
)


def encode_xlsx(sheets: list[list[list[str]]],
                use_shared: bool = True) -> bytes:
    """Minimal structurally-valid XLSX: ``sheets`` is per-sheet lists of
    rows, each row a list of cell strings. ``use_shared=True`` routes
    strings through a real ``sharedStrings.xml`` table (the layout
    Excel itself writes); ``False`` writes inline strings."""
    table: list[str] = []
    index: dict[str, int] = {}

    def _sref(s: str) -> int:
        if s not in index:
            index[s] = len(table)
            table.append(s)
        return index[s]

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        zf.writestr(_MARKER, _WORKBOOK)
        sheet_xml: list[str] = []
        for rows in sheets:
            body = []
            for r, cells in enumerate(rows, start=1):
                cs = []
                for k, cell in enumerate(cells):
                    ref = f"{chr(ord('A') + k)}{r}"
                    if use_shared:
                        cs.append(
                            f'<c r="{ref}" t="s"><v>{_sref(cell)}</v></c>'
                        )
                    else:
                        cs.append(
                            f'<c r="{ref}" t="inlineStr"><is>'
                            f'<t xml:space="preserve">{_xml_escape(cell)}'
                            "</t></is></c>"
                        )
                body.append(f'<row r="{r}">{"".join(cs)}</row>')
            sheet_xml.append(
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{S_NS}"><sheetData>'
                + "".join(body) + "</sheetData></worksheet>"
            )
        for n, xml in enumerate(sheet_xml, start=1):
            zf.writestr(f"xl/worksheets/sheet{n}.xml", xml)
        if use_shared and table:
            sst = "".join(
                f'<si><t xml:space="preserve">{_xml_escape(s)}</t></si>'
                for s in table
            )
            zf.writestr(
                _SHARED,
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<sst xmlns="{S_NS}">{sst}</sst>',
            )
    return buf.getvalue()
