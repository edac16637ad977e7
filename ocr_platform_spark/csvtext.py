"""CSV/TSV tabular text extraction — the delimiter-separated tier.

Crawled corpora carry delimiter-separated values at data-portal scale
(open-data dumps, exported spreadsheets, log tables, TSV interchange
files). Through the plain-text fallback a CSV would extract as ONE
giant paragraph (no blank lines between rows), burying the tabular
structure; this tier extracts it under the same block model as the
XLSX office tier (:mod:`.xlsxtext`): **one block per non-empty row,
cells in order joined with a single space, empty cells dropped,
multi-line quoted cell text folded under the shared
strip-lines-join rule**. A reader of the extracted spans sees the same
text whether the table arrived as ``.xlsx`` or ``.csv`` — the
tier-consistency property the whole OCR-bypass family maintains.

Dispatch: like Markdown (:mod:`.mdtext`), DSV has no magic bytes, so
this is a REFINEMENT of the probe's plain-text tier, promoted only on
a conservative structural sniff (:func:`sniff_tabular`), checked
BEFORE the markdown sniff (a table is more structured than prose with
incidental markup, and the stricter rule should win):

* candidate delimiters ``\\t`` ``,`` ``;`` tried in that order (tab is
  the strongest signal — prose essentially never carries consistent
  mid-line tabs);
* the WHOLE payload must parse as one rectangle: every content row has
  the SAME field count, ``>=2`` fields; ``>=2`` content rows for tab,
  ``>=3`` rows AND ``>=3`` fields for comma/semicolon (so two-line
  prose with one comma per sentence stays literal text);
* quoting is RFC-4180 (``"`` fields, doubled quotes, embedded
  delimiters/newlines) via the stdlib ``csv`` reader with a fixed
  explicit dialect — never the heuristic ``csv.Sniffer``.

A ragged file (varying field counts — common in dirty dumps) stays in
the txt tier: the literal-text floor is correct for a table we cannot
confidently parse, exactly the false-negative-preferring posture of
the markdown sniff.

The reference has no tabular path (it OCRs uploaded PDFs/images only,
``apps/worker/app/tasks/ocr_tasks.py:36-39``); this tier exists for
the same 100 TB reason the office tiers do — string work instead of
impossible rasterization, through the identical probe/bucket/assembly
plan.
"""

from __future__ import annotations

import csv
import io

from .plaintext import TextParagraph

#: candidate delimiters, strongest structural signal first
_DELIMS = ("\t", ",", ";")
#: minimum content rows / fields per delimiter class
_MIN_ROWS = {"\t": 2, ",": 3, ";": 3}
_MIN_FIELDS = {"\t": 2, ",": 3, ";": 3}


def _parse(text: str, delim: str) -> list[list[str]] | None:
    """Strict fixed-dialect parse -> rows, or ``None`` on a csv error.
    The reader runs over the whole normalized text so quoted fields may
    embed newlines and delimiters (RFC 4180)."""
    try:
        return list(csv.reader(
            io.StringIO(text, newline=""),
            delimiter=delim, quotechar='"', doublequote=True,
            escapechar=None, strict=True,
        ))
    except csv.Error:
        return None


def _sniff_rows(norm: str):
    """``(delimiter, parsed rows)`` for a confident rectangle, else
    ``None`` — shared by the sniff and the extractor so the payload
    parses ONCE on each path instead of sniff-then-reparse."""
    for delim in _DELIMS:
        # O(n) pre-guard before the quote-aware parse: a rectangle of
        # R rows x W fields carries >= R*(W-1) structural delimiters,
        # and the raw character count only over-counts (quoted
        # occurrences add to it) — so a payload below the floor can
        # never promote and most prose skips the csv parse entirely
        if norm.count(delim) < _MIN_ROWS[delim] * (_MIN_FIELDS[delim] - 1):
            continue
        rows = _parse(norm, delim)
        if rows is None:
            continue
        idx = [i for i, r in enumerate(rows) if any(c.strip() for c in r)]
        if len(idx) < _MIN_ROWS[delim]:
            continue
        # a rectangle has no interior or leading blank rows (a trailing
        # newline's empty row is fine) — blank-line-separated prose or
        # markdown whose lines happen to share a delimiter count must
        # NOT promote
        if idx[0] != 0 or idx[-1] != len(idx) - 1:
            continue
        widths = {len(rows[i]) for i in idx}
        if len(widths) == 1 and widths.pop() >= _MIN_FIELDS[delim]:
            return delim, rows
    return None


def sniff_tabular(text: str) -> str | None:
    """The promoting delimiter if the payload is confidently one
    rectangle, else ``None`` (stay in the txt tier)."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    got = _sniff_rows(norm)
    return got[0] if got else None


def _cell_text(cell: str) -> str:
    """Shared strip-lines-join fold for multi-line quoted cells."""
    return "\n".join(
        ln.strip() for ln in cell.split("\n") if ln.strip()
    )


def tabular_blocks(text: str) -> list[TextParagraph]:
    """Sniffed-tabular source -> one block per content row (cells
    joined with a single space, the XLSX rule). Positions are row
    ordinals — monotone, which is all the downstream
    ``(page, y1, x1)`` span sort needs. Raises ``ValueError`` if the
    payload does not sniff (the probe guarantees it does)."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    got = _sniff_rows(norm)
    if got is None:
        raise ValueError("payload is not confidently tabular")
    _delim, rows = got
    out: list[TextParagraph] = []
    for i, row in enumerate(rows):
        cells = [_cell_text(c) for c in row]
        body = " ".join(c for c in cells if c)
        if body:
            out.append(TextParagraph(i, body))
    return out


# ---------------------------------------------------------------------------
# test/fixture encoder (the tier round-trip contract)
# ---------------------------------------------------------------------------

def encode_dsv(blocks: list[str], delimiter: str = "\t") -> bytes:
    """Blocks in the tiers' shared normal form -> one delimiter-
    separated document whose extracted blocks are EXACTLY the input:
    single-line blocks without double spaces split into word cells
    (they re-join with the single-space rule); anything else rides as
    one quoted cell. Rows pad with empty cells to a uniform width (the
    rectangle the sniff requires; empty cells drop in the join).
    Raises ``ValueError`` when the input cannot form a promotable
    rectangle (fewer blocks than the delimiter's row minimum) — the
    caller falls back to the plain-text tier."""
    if len(blocks) < _MIN_ROWS[delimiter]:
        raise ValueError(
            f"{len(blocks)} blocks cannot form a sniffable "
            f"{delimiter!r}-separated rectangle"
        )
    rows: list[list[str]] = []
    for block in blocks:
        words = block.split(" ")
        # word cells must survive the cell fold unchanged: each word
        # has to be strip-STABLE (a word with leading/trailing unicode
        # whitespace, e.g. NBSP, would lose it) — such blocks ride as
        # one quoted cell instead
        if "\n" not in block and "  " not in block \
                and delimiter not in block \
                and all(w and w == w.strip() for w in words):
            rows.append(words)
        else:
            rows.append([block])
    width = max(_MIN_FIELDS[delimiter], max(len(r) for r in rows))
    buf = io.StringIO(newline="")
    # QUOTE_ALL: a cell carrying a DIFFERENT candidate delimiter (a tab
    # inside a comma-encoded cell) must not let the output sniff as the
    # wrong rectangle — quoting makes every other-delimiter parse fail
    # strict (quote processing is delimiter-independent)
    w = csv.writer(buf, delimiter=delimiter, quotechar='"',
                   doublequote=True, lineterminator="\n",
                   quoting=csv.QUOTE_ALL)
    for r in rows:
        w.writerow(r + [""] * (width - len(r)))
    return buf.getvalue().encode()
