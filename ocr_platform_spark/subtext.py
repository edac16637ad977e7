"""Subtitle extraction tier — SRT and WebVTT cue text.

Spoken-word corpora at YouTube scale ship as subtitle files: SubRip
(``.srt`` — numbered cues with ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
timestamp lines) and WebVTT (``.vtt`` — a ``WEBVTT`` header, dotted
milliseconds, optional cue settings and inline markup). Through the
plain-text fallback those payloads would extract with cue numbers,
timestamps and ``<c>`` tags VERBATIM — pure boilerplate. This tier
extracts the DISPLAYED caption text: one block per cue, cue-internal
line breaks kept (they are display lines — hard breaks by
construction), numbering/timestamps/settings/markup dropped.

Dispatch: a REFINEMENT of the probe's plain-text tier like Markdown
and LaTeX. WebVTT promotes on its mandatory leading ``WEBVTT`` header
(after an optional BOM); SRT has no magic, so the sniff requires the
structural cue shape — a timestamp line (``-->`` with SRT/VTT time
syntax on both sides) within the first cues. Plain prose containing a
stray ``-->`` arrow does not match the time syntax and stays txt.

Deterministic SUBSET, documented here: cue ids (SRT numbers / VTT cue
identifiers) drop; timestamp lines drop (cue SETTINGS after the arrow
too); ``NOTE``/``STYLE``/``REGION`` comment blocks (VTT) drop whole;
inline VTT/SRT markup — ``<c.class>``, ``<i>``, ``<b>``, ``<u>``,
``<v Speaker>``, ``<00:00:01.000>`` karaoke times, ``{\\an8}`` ASS
position overrides — strips to its text; HTML entities resolve via
the DOM tier's table; duplicate-consecutive cue texts (the rolling
caption pattern of auto-generated subtitles) collapse to one block.

The reference has no subtitle path; this tier exists for the same
100 TB reason the Markdown tier does, and it is the transcript half
of the audio/video modality this engine already serves
(``pipelines.speech_corpus``).
"""

from __future__ import annotations

import re

from .htmltext import unescape_entities
from .plaintext import TextParagraph

__all__ = ["sniff_subtitles", "subtitle_blocks", "encode_srt",
           "encode_vtt"]

#: SRT uses comma milliseconds, VTT dotted; VTT allows MM:SS.mmm short
#: form and SRT hour fields can exceed two digits
_TIME = r"(?:\d{1,4}:)?\d{1,2}:\d{2}[.,]\d{3}"
_ARROW_RE = re.compile(
    rf"^[ \t]*{_TIME}[ \t]+-->[ \t]+{_TIME}(?:[ \t].*)?$")
_TAG_RE = re.compile(r"<[^>\n]*>|\{\\an\d\}")


def sniff_subtitles(text: str) -> bool:
    """WEBVTT header, or a structural SRT/VTT timestamp line within
    the first 40 lines (cue shape, not just an arrow)."""
    norm = text.lstrip("﻿")
    head = norm.replace("\r\n", "\n").replace("\r", "\n")
    if head.startswith("WEBVTT") and head[6:7] in ("", "\n", " ", "\t"):
        return True
    for line in head.split("\n", 40)[:40]:
        if _ARROW_RE.match(line):
            return True
    return False


def _cue_text(lines: list[str]) -> str:
    out = []
    for ln in lines:
        t = unescape_entities(_TAG_RE.sub("", ln)).strip()
        if t:
            out.append(t)
    return "\n".join(out)


def subtitle_blocks(text: str, base: int = 0) -> list[TextParagraph]:
    """Subtitle source -> one displayed-text block per cue, in cue
    order; rolling duplicate cue texts collapse."""
    norm = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    lines = norm.split("\n")
    out: list[TextParagraph] = []
    pos = base
    i = 0
    n = len(lines)
    last_text: str | None = None
    # leading WEBVTT header block (up to the first blank line) drops
    if lines and lines[0].startswith("WEBVTT"):
        while i < n and lines[i].strip():
            i += 1
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        # VTT comment/metadata blocks drop whole
        first = lines[i].strip()
        if first.startswith(("NOTE", "STYLE", "REGION")) and \
                not _ARROW_RE.match(first):
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional cue identifier line, then the timestamp line
        if not _ARROW_RE.match(lines[i]):
            if i + 1 < n and _ARROW_RE.match(lines[i + 1]):
                i += 1  # id line drops
            else:
                # not a cue: stray text outside cue structure drops
                # (subtitle files carry no prose outside cues)
                i += 1
                continue
        i += 1  # past the timestamp line
        cue: list[str] = []
        while i < n and lines[i].strip():
            cue.append(lines[i])
            i += 1
        body = _cue_text(cue)
        if body and body != last_text:
            out.append(TextParagraph(pos, body))
            pos += 1
            last_text = body
        elif body:
            last_text = body
    return out


# ---------------------------------------------------------------------------
# test/fixture encoders (the tier round-trip contract)
# ---------------------------------------------------------------------------

def _stamp(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def encode_srt(blocks: list[str]) -> bytes:
    """Blocks -> deterministic SRT (2 s per cue, markup noise added
    that must strip back to the input)."""
    cues = []
    for i, b in enumerate(blocks):
        body = b.split("\n")
        if body:
            body[0] = f"<i>{body[0]}</i>"
        cues.append(f"{i + 1}\n{_stamp(i * 2000, ',')} --> "
                    f"{_stamp(i * 2000 + 1900, ',')}\n"
                    + "\n".join(body))
    return ("\n\n".join(cues) + "\n").encode("utf-8")


def encode_vtt(blocks: list[str]) -> bytes:
    """Blocks -> deterministic WebVTT (header + NOTE block + cue
    settings + voice/class markup that must strip back)."""
    cues = ["WEBVTT - generated fixture\n\nNOTE\nthis comment drops"]
    for i, b in enumerate(blocks):
        body = b.split("\n")
        if body:
            body[0] = f"<v Speaker><c.yellow>{body[0]}</c>"
        cues.append(f"cue-{i + 1}\n{_stamp(i * 2000, '.')} --> "
                    f"{_stamp(i * 2000 + 1900, '.')} align:start\n"
                    + "\n".join(body))
    return ("\n\n".join(cues) + "\n").encode("utf-8")
