"""Markdown extraction tier — rendered-text blocks, no raster, no DOM.

Web corpora carry Markdown at GitHub scale (READMEs, docs sites, wiki
dumps, forum mirrors). Through the plain-text fallback those payloads
would extract with their markup VERBATIM — ``# Title``, ``**bold**``,
``[text](url)`` — which is exactly the boilerplate-in-content failure
the HTML DOM tier exists to prevent. This tier extracts what a renderer
would DISPLAY, under the same text model as the DOM tier
(:mod:`.htmltext`): source soft-wraps are whitespace (the
``test_source_newlines_are_whitespace`` rule), only an explicit hard
break (trailing double-space or backslash — Markdown's ``<br>``)
produces ``\\n`` inside a block, and every structural block (heading,
paragraph, list item, code block) becomes one detection-shaped block in
document order.

Dispatch: Markdown has no magic bytes, so this is a REFINEMENT of the
probe's final plain-text tier (:mod:`.plaintext` validates first —
strict UTF-8, no binary controls, no leading markup), promoted only on
a conservative structural sniff (:func:`sniff_markdown`): an ATX
heading or a code fence, or two independent medium signals (setext
underline, ≥2 list items, link/image syntax, blockquote line). Plain
prose with an incidental ``*`` or a lone ``- item`` stays in the txt
tier — a wrong promotion would silently change how soft-wrapped lines
join, so the sniff prefers false negatives (the txt tier's literal text
is a superset of the rendered text, never garbage).

CommonMark SUBSET, deterministic, documented here: ATX (``#``–``######``)
and setext (``===``/``---`` underline) headings; fenced (``` ``` ```/
``~~~``, info string dropped, content VERBATIM incl. blank lines,
unclosed fence closes at EOF per spec) and 4-space-indented code
blocks; blockquotes (ALL leading ``>`` markers strip in one pass — nested
quotes flatten — then the inner text re-parses); unordered (``-*+``) and
ordered (``1.``/``1)``) list items, one block per ITEM, continuation
lines joined as soft wraps until the next blank line or block start
(a heading/fence/quote/thematic directly under an item is its own
block); thematic breaks emit nothing. Inline: code spans
(content literal), images → alt text, links → anchor text, autolinks →
the URI, emphasis/strong markers stripped (``*``/``_`` families), raw
inline HTML tags dropped, backslash escapes honored, HTML entities
resolved through the DOM tier's full table
(:func:`.htmltext.unescape_entities`). Tables, footnotes, reference
links and setext-lazy continuation are OUT of the subset: their lines
parse as plain paragraph text, which is the same graceful floor the txt
tier provides.

The reference has no markdown path (it OCRs uploaded PDFs/images only,
``apps/worker/app/tasks/ocr_tasks.py:36-39``); this tier exists for the
same 100 TB reason the HTML/office tiers do — string work instead of
impossible rasterization, through the identical probe/bucket/assembly
plan, so it inherits the skew, shuffle and quarantine story unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .htmltext import unescape_entities

_ATX_RE = re.compile(r"^ {0,3}(#{1,6})(?:[ \t]+(.*?))?[ \t]*$")
_FENCE_RE = re.compile(r"^ {0,3}(`{3,}|~{3,})[ \t]*([^`]*)$")
_THEMATIC_RE = re.compile(r"^ {0,3}([-*_])[ \t]*(?:\1[ \t]*){2,}$")
_LIST_RE = re.compile(r"^ {0,3}(?:[-*+]|\d{1,9}[.)])[ \t]+\S")
_LIST_MARK_RE = re.compile(r"^ {0,3}(?:[-*+]|\d{1,9}[.)])[ \t]+")
_QUOTE_RE = re.compile(r"^ {0,3}> ?")
_QUOTE_ALL_RE = re.compile(r"^( {0,3}> ?)+")
_SETEXT_RE = re.compile(r"^ {0,3}(=+|-+)[ \t]*$")
_INDENT_CODE_RE = re.compile(r"^(?: {4}|\t)(.*)$")

# inline, applied in this order (code spans first: their content is
# literal and must not be touched by the later passes)
_CODESPAN_RE = re.compile(r"(?<!`)(`+)(?!`)(.+?)(?<!`)\1(?!`)")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)(?:[ \t]+\"[^\"]*\")?\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)\s]*)(?:[ \t]+\"[^\"]*\")?\)")
_AUTOLINK_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9+.-]*:[^<> ]+)>")
_HTML_TAG_RE = re.compile(r"</?[a-zA-Z][a-zA-Z0-9-]*(?:\s[^<>]*)?/?>")
_STRONG_STAR_RE = re.compile(r"\*\*(?=\S)(.+?)(?<=\S)\*\*")
_EM_STAR_RE = re.compile(r"\*(?=\S)(.+?)(?<=\S)\*")
# underscore emphasis is word-bounded (CommonMark: no intraword ``_`` —
# identifiers like ``foo_bar_baz`` must survive verbatim)
_STRONG_UND_RE = re.compile(r"(?<!\w)__(?=\S)(.+?)(?<=\S)__(?!\w)")
_EM_UND_RE = re.compile(r"(?<!\w)_(?=\S)(.+?)(?<=\S)_(?!\w)")
_ESCAPE_RE = re.compile(r"\\([!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~])")
_HARD_BREAK_RE = re.compile(r"(?:  +|\\)$")

#: placeholder sentinels keep escaped/literal chars out of later passes
_SENTINEL = "\x00%d\x00"


@dataclass(frozen=True)
class MarkdownBlock:
    """One rendered block; same detection-shaped duck type as
    :class:`.plaintext.TextParagraph` (positions are character offsets
    into the normalized source — monotone document order)."""

    pos: int
    text: str

    @property
    def x1(self) -> int:
        return 0

    @property
    def y1(self) -> int:
        return self.pos

    @property
    def x2(self) -> int:
        return max(1, len(self.text))

    @property
    def y2(self) -> int:
        return self.pos + 1


def render_inline(text: str) -> str:
    """Inline markdown -> rendered text (see module docstring for the
    subset). Code-span content and backslash-escaped punctuation are
    protected with sentinels so emphasis/link passes can't see them."""
    literals: list[str] = []

    def protect(s: str) -> str:
        literals.append(s)
        return _SENTINEL % (len(literals) - 1)

    text = _CODESPAN_RE.sub(lambda m: protect(m.group(2).strip()), text)
    text = _ESCAPE_RE.sub(lambda m: protect(m.group(1)), text)
    text = _IMAGE_RE.sub(lambda m: m.group(1), text)
    text = _LINK_RE.sub(lambda m: m.group(1), text)
    text = _AUTOLINK_RE.sub(lambda m: m.group(1), text)
    text = _HTML_TAG_RE.sub("", text)
    for pat in (_STRONG_STAR_RE, _STRONG_UND_RE, _EM_STAR_RE, _EM_UND_RE):
        prev = None
        while prev != text:  # nested emphasis unwraps inside-out
            prev = text
            text = pat.sub(lambda m: m.group(1), text)
    text = unescape_entities(text)
    return re.sub(r"\x00(\d+)\x00",
                  lambda m: literals[int(m.group(1))], text)


def _join_soft(lines: list[str], starts_hard: "list[bool]") -> str:
    """Soft wraps join with a space; a line whose SOURCE ended in a hard
    break contributes ``\\n`` instead (the DOM tier's ``<br>`` rule)."""
    out: list[str] = []
    for i, line in enumerate(lines):
        out.append(line)
        if i + 1 < len(lines):
            out.append("\n" if starts_hard[i] else " ")
    return "".join(out)


def _paragraph_text(raw_lines: list[str]) -> str:
    hard = [bool(_HARD_BREAK_RE.search(ln)) for ln in raw_lines]
    stripped = [_HARD_BREAK_RE.sub("", ln).strip() for ln in raw_lines]
    return render_inline(_join_soft(stripped, hard)).strip()


def markdown_blocks(text: str, base: int = 0) -> list[MarkdownBlock]:
    """Markdown source -> rendered blocks in document order."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    lines = norm.split("\n")
    # absolute character offset of each line start (monotone positions)
    offs = [0] * (len(lines) + 1)
    for i, ln in enumerate(lines):
        offs[i + 1] = offs[i] + len(ln) + 1
    out: list[MarkdownBlock] = []

    def emit(pos: int, body: str) -> None:
        if body:
            out.append(MarkdownBlock(base + pos, body))

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        m = _FENCE_RE.match(line)
        if m:
            fence = m.group(1)
            j = i + 1
            while j < n:
                close = _FENCE_RE.match(lines[j])
                if close and close.group(1)[0] == fence[0] \
                        and len(close.group(1)) >= len(fence) \
                        and not close.group(2).strip():
                    break
                j += 1
            emit(offs[i], "\n".join(lines[i + 1:j]).strip("\n"))
            i = j + 1
            continue
        m = _ATX_RE.match(line)
        if m:
            # a closing ``#`` run only closes when whitespace-preceded
            # (or it IS the whole body): ``# 0#`` keeps its hash,
            # ``## Title ##`` drops it — the CommonMark rule
            body = re.sub(r"(?:^|[ \t]+)#+[ \t]*$", "", m.group(2) or "")
            emit(offs[i], render_inline(body.strip()).strip())
            i += 1
            continue
        if _THEMATIC_RE.match(line):
            i += 1
            continue
        if _QUOTE_RE.match(line):
            j = i
            inner: list[str] = []
            while j < n and (_QUOTE_RE.match(lines[j])
                             or (lines[j].strip()
                                 and inner and inner[-1].strip())):
                inner.append(_QUOTE_ALL_RE.sub("", lines[j], count=1))
            # ^ lazy continuation: a non-blank line directly after a
            #   quoted non-blank line stays inside the quote. ALL
            #   leading '>' markers strip in one pass (nested quotes
            #   flatten anyway), so the inner re-parse recursion is
            #   depth-1 regardless of '>' count — a '>'*10000 line
            #   must not RecursionError into a silent zero-block doc
                j += 1
            out.extend(markdown_blocks("\n".join(inner), base=offs[i]))
            i = j
            continue
        if _LIST_RE.match(line):
            while i < n and _LIST_RE.match(lines[i]) \
                    and not _THEMATIC_RE.match(lines[i]):
                item = [_LIST_MARK_RE.sub("", lines[i], count=1)]
                pos = offs[i]
                j = i + 1
                # continuation stops at ANY block start, not only a
                # new list item — a heading/fence/quote/thematic
                # directly under an item is its own block (CommonMark)
                while j < n and lines[j].strip() \
                        and not _LIST_RE.match(lines[j]) \
                        and not _ATX_RE.match(lines[j]) \
                        and not _FENCE_RE.match(lines[j]) \
                        and not _QUOTE_RE.match(lines[j]) \
                        and not _THEMATIC_RE.match(lines[j]):
                    item.append(lines[j])
                    j += 1
                emit(pos, _paragraph_text(item))
                i = j
                if i < n and (not lines[i].strip()
                              or not _LIST_RE.match(lines[i])):
                    break  # blank line or another block ends the run
            continue
        m = _INDENT_CODE_RE.match(line)
        if m and line.strip():
            j = i
            body: list[str] = []
            while j < n and (not lines[j].strip()
                             or _INDENT_CODE_RE.match(lines[j])):
                mm = _INDENT_CODE_RE.match(lines[j])
                body.append(mm.group(1) if mm else "")
                j += 1
            emit(offs[i], "\n".join(body).strip("\n"))
            i = j
            continue
        # paragraph: runs until a blank line or another block start;
        # a setext underline directly below promotes it to a heading
        # (and outranks a same-line thematic break, per CommonMark)
        j = i
        para: list[str] = []
        while j < n and lines[j].strip() \
                and not _ATX_RE.match(lines[j]) \
                and not _FENCE_RE.match(lines[j]) \
                and not _QUOTE_RE.match(lines[j]) \
                and not _LIST_RE.match(lines[j]):
            if para and _SETEXT_RE.match(lines[j]):
                break
            if _THEMATIC_RE.match(lines[j]):
                break
            para.append(lines[j])
            j += 1
        if j < n and para and _SETEXT_RE.match(lines[j]):
            emit(offs[i], _paragraph_text(para))
            i = j + 1
            continue
        emit(offs[i], _paragraph_text(para))
        i = j if j > i else i + 1
    return out


# ---------------------------------------------------------------------------
# test/fixture encoder (the tier round-trip contract)
# ---------------------------------------------------------------------------

#: a line is PLAIN iff it parses as paragraph content wherever it lands:
#: no block-start syntax, no hard-break tail, and no inline-active
#: characters (emphasis/link/code/entity/escape/tag) whose rendering
#: would change the text
_BLOCKISH_RES = (_ATX_RE, _FENCE_RE, _THEMATIC_RE, _LIST_RE, _QUOTE_RE,
                 _SETEXT_RE, _INDENT_CODE_RE)
_INLINE_ACTIVE_RE = re.compile(r"[\\`*_\[\]<>&!~]|  ")


def _plain_line(ln: str) -> bool:
    return bool(ln) and ln == ln.strip() \
        and not any(r.match(ln) for r in _BLOCKISH_RES) \
        and not _INLINE_ACTIVE_RE.search(ln)


def _fence_for(text: str) -> str:
    """A backtick fence strictly longer than any backtick run in the
    content, so no content line can close (or open) it."""
    longest = max((len(m.group(0))
                   for m in re.finditer(r"`+", text)), default=0)
    return "`" * max(3, longest + 1)


def encode_markdown(blocks: list[str]) -> bytes:
    """Blocks in the tiers' shared normal form (stripped non-empty
    lines joined with ``\\n``) -> a Markdown document whose rendered
    blocks are EXACTLY the input, in order — the same round-trip
    contract every other text tier's ``encode_*`` satisfies
    (:func:`..docxtext.encode_docx` etc.).

    Each block rotates through the renderer's constructs (ATX heading,
    code fence, setext heading, list item, blockquote, strong, link,
    hard-break paragraph) so a corpus built from real OCR blocks
    exercises the whole subset; any block a construct can't carry
    losslessly (multi-line where the construct is single-line, a line
    that itself looks like block syntax, inline-active characters)
    falls back to a code fence, which is verbatim for everything. The
    first block always lands on a STRONG sniff signal (ATX or fence),
    so the probe's :func:`sniff_markdown` promotion is guaranteed by
    construction."""
    chunks: list[str] = []
    for i, block in enumerate(blocks):
        lines = block.split("\n")
        single = len(lines) == 1
        plain = all(_plain_line(ln) for ln in lines)
        c = i % 8
        if c == 0 and single and plain:
            chunks.append("#" * (i % 6 + 1) + " " + block)
        elif c == 2 and single and plain:
            chunks.append(block + "\n" + ("===" if i % 2 else "---"))
        elif c == 3 and plain:
            chunks.append("- " + "\\\n".join(lines))
        elif c == 4 and plain:
            chunks.append("\n".join("> " + ln + ("  " if j + 1 < len(lines)
                                                 else "")
                                    for j, ln in enumerate(lines)))
        elif c == 5 and single and plain:
            chunks.append("**" + block + "**")
        elif c == 6 and single and plain:
            chunks.append("[" + block + "](https://example.invalid/r)")
        elif c == 7 and plain:
            chunks.append("\\\n".join(lines))
        else:
            fence = _fence_for(block)
            chunks.append(fence + "\n" + block + "\n" + fence)
    return ("\n\n".join(chunks) + "\n").encode()


# ---------------------------------------------------------------------------
# dispatch sniff
# ---------------------------------------------------------------------------

def sniff_markdown(text: str) -> bool:
    """Conservative structural sniff over VALIDATED plain text (the
    probe runs :func:`.plaintext.validate_text` first). Strong signal —
    an ATX heading or a code fence — promotes alone; otherwise two
    DISTINCT medium signals are required (setext underline under a
    paragraph line, ≥2 list-item lines, link/image syntax, a blockquote
    line). One medium signal stays plain text: ``- item`` shopping
    lists and ``>`` quoted email bodies must keep their literal-text
    extraction."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    lines = norm.split("\n")
    medium = set()
    list_lines = 0
    prev_nonblank = False
    for line in lines:
        if _ATX_RE.match(line) or _FENCE_RE.match(line):
            return True
        if _LIST_RE.match(line) and not _THEMATIC_RE.match(line):
            list_lines += 1
            if list_lines >= 2:
                medium.add("list")
        elif _QUOTE_RE.match(line):
            medium.add("quote")
        elif prev_nonblank and _SETEXT_RE.match(line) \
                and not _THEMATIC_RE.match(line):
            medium.add("setext")
        if _LINK_RE.search(line) or _IMAGE_RE.search(line):
            medium.add("link")
        prev_nonblank = bool(line.strip()) and not _LIST_RE.match(line)
        if len(medium) >= 2:
            return True
    return False
