"""JSON / JSON-Lines extraction tier — API exports and JSONL corpora.

The last big no-magic text family a crawl carries: JSON API responses,
data-portal exports, and JSON-Lines corpora (the interchange format of
LLM training sets — one object per line, a ``text`` field carrying the
document). Through the plain-text fallback a JSONL corpus would
extract as brace-and-quote soup; this tier extracts the CONTENT.

Block model (documented, deterministic): a depth-first walk of the
parsed value in document order emits one block per **string value**
under the shared strip-lines-join rule. Object KEYS, numbers, booleans
and nulls never emit — they are structure/data, not prose (the same
judgment the XLSX tier makes the other way for spreadsheet cells,
where a numeric cell IS the content; a JSON number is almost always an
id, a count, or a coordinate). Empty-after-strip strings drop.

Shapes accepted:

* **JSON document**: first non-whitespace byte ``{`` or ``[`` and the
  WHOLE payload parses as one strict JSON value.
* **JSON-Lines**: every non-blank line parses as a strict JSON value,
  at least one line, first line starts ``{`` or ``[`` (a JSONL of bare
  strings/numbers is data, not documents — it stays in the txt tier).
  Lines concatenate into one reflowable page, blocks in line order.

The gate is the STRICT parse (``json.loads``): a truncated or invalid
payload that merely STARTS with ``{`` falls through to the plain-text
tier — ``{`` is a legal first character for prose (shell snippets,
TeX), so unlike XML's leading ``<`` there is no refusal to preserve;
the parse either succeeds completely or the payload takes the literal
floor. NaN/Infinity extensions are refused (``parse_constant`` raises:
strict interchange JSON only). Duplicate keys follow ``json.loads``
last-wins semantics — earlier duplicates' values never emit, matching
what any downstream JSON consumer of the same payload would see.

The reference has no JSON path (it OCRs uploaded PDFs/images only,
``apps/worker/app/tasks/ocr_tasks.py:36-39``); this tier exists for
the same 100 TB reason the DSV tier does.
"""

from __future__ import annotations

import json

from .plaintext import TextParagraph


def _strict_loads(s: str):
    """Interchange JSON only: NaN/Infinity literals are refused, and a
    pathologically deep nesting ('['*100000) maps to ``ValueError``
    like any other rejection instead of letting ``RecursionError``
    escape the sniff's return-None contract."""
    def _no_const(name: str):
        raise ValueError(f"non-interchange JSON constant {name!r}")

    try:
        return json.loads(s, parse_constant=_no_const)
    except RecursionError as exc:
        raise ValueError("JSON nested too deeply") from exc


def sniff_json(text: str) -> str | None:
    """``"json"`` / ``"jsonl"`` when the WHOLE payload parses under the
    shape rules above, else ``None`` (stay in the txt tier). The sniff
    IS the validation — there are no invalid promoted payloads."""
    head = text.lstrip()
    if not head or head[0] not in "{[":
        return None
    try:
        _strict_loads(text)
        return "json"
    except ValueError:
        pass
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if not lines:
        return None
    try:
        for ln in lines:
            v = _strict_loads(ln)
            if not isinstance(v, (dict, list)):
                return None
    except ValueError:
        return None
    return "jsonl"


def _strip_join(s: str) -> str:
    return "\n".join(
        ln.strip() for ln in s.split("\n") if ln.strip()
    )


def _walk(value, emit) -> None:
    """Document-order DFS emitting string VALUES only (explicit stack:
    a structure deep enough to parse must also walk without
    ``RecursionError``). Numbers / booleans / null are structure,
    never content."""
    stack = [value]
    while stack:
        v = stack.pop()
        if isinstance(v, str):
            emit(_strip_join(v))
        elif isinstance(v, dict):
            stack.extend(reversed(list(v.values())))
        elif isinstance(v, list):
            stack.extend(reversed(v))


def json_blocks(text: str) -> list[TextParagraph]:
    """Sniffed-JSON source -> string-value blocks in document order.
    Positions are an emission counter — monotone, which is all the
    downstream ``(page, y1, x1)`` span sort needs. Raises
    ``ValueError`` if the payload does not sniff (the probe
    guarantees it does)."""
    head = text.lstrip()
    if not head or head[0] not in "{[":
        raise ValueError("payload is not strict JSON / JSON-Lines")
    out: list[TextParagraph] = []
    n = 0

    def emit(body: str) -> None:
        nonlocal n
        if body:
            out.append(TextParagraph(n, body))
        n += 1

    # parse ONCE (the probe already validated; re-running the sniff
    # here would re-parse the whole payload a second time)
    try:
        _walk(_strict_loads(text), emit)
        return out
    except ValueError:
        out.clear()
        n = 0
    for ln in text.split("\n"):
        if not ln.strip():
            continue
        v = _strict_loads(ln)
        if not isinstance(v, (dict, list)):
            raise ValueError(
                "payload is not strict JSON / JSON-Lines")
        _walk(v, emit)
    return out


# ---------------------------------------------------------------------------
# test/fixture encoder (the tier round-trip contract)
# ---------------------------------------------------------------------------

def encode_jsonl(blocks: list[str]) -> bytes:
    """Blocks in the shared normal form -> a JSONL corpus (one
    ``{"id": i, "text": block}`` object per line — the LLM-corpus
    shape; the numeric id pins the numbers-never-emit rule in every
    round trip)."""
    return ("\n".join(
        json.dumps({"id": i, "text": b}, ensure_ascii=False)
        for i, b in enumerate(blocks)
    ) + "\n").encode()
