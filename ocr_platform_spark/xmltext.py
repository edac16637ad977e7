"""XML extraction tier — feeds, sitemaps and generic data XML.

A web-scale crawl is full of non-HTML markup: RSS/Atom feeds (every
blog and news site), XML sitemaps, OPML, SVG, RDF dumps, API exports.
The plain-text tier deliberately REFUSES leading markup (a truncated
HTML payload must not extract raw tags as content), so until this tier
every well-formed XML payload quarantined. The strict parse is what
makes lifting that refusal safe: ``xml.etree`` either builds the whole
tree or raises — a TRUNCATED document still quarantines, preserving
exactly the protection the refusal existed for.

Block model (documented, deterministic):

* **Generic XML**: document-order walk; every ELEMENT's direct text
  (its ``.text`` and each child's ``.tail``) becomes one block under
  the shared strip-lines-join rule (pretty-printing indentation
  vanishes; intra-text newlines survive like every office tier).
  Attributes, comments and processing instructions never emit.
* **Feed rich-content elements** (``description`` / ``summary`` /
  ``content`` / ``encoded`` under an ``rss`` / ``feed`` / ``rdf``
  root): feeds carry ESCAPED or CDATA HTML in these elements per spec,
  so their text extracts through the DOM tier's block walk
  (:func:`.htmltext.content_blocks` — HTML whitespace model, tags
  stripped, ``<br>`` line breaks) instead of leaking literal markup
  into content — the same boilerplate-in-content failure the HTML
  tier exists to prevent. The link-density drop is NOT applied inside
  feed items (a link-heavy description is content, not chrome).
* **XHTML served as XML** (``<?xml`` prolog, no doctype — with a
  doctype/`<html` head the byte sniff routes it to the DOM tier long
  before this module): extracts under the generic rule with
  ``script``/``style`` subtrees dropped (the DOM tier's DROP rule —
  CSS and JS source must never extract as content); mixed-content
  prose splits at inline-tag boundaries, the documented granularity
  floor for a shape that virtually always ships with a doctype.

Safety: a payload whose prolog declares a DTD (``<!DOCTYPE``) is
quarantined outright — internal entity expansion is the
billion-laughs vector, and the corpus classes this tier targets
(feeds, sitemaps, data exports) never legitimately carry one. XML
entity references beyond the five predefined ones then fail the strict
parse (another quarantine), and ``xml.etree`` never fetches external
resources.

The reference has no XML path (it OCRs uploaded PDFs/images only,
``apps/worker/app/tasks/ocr_tasks.py:36-39``); this tier exists for
the same 100 TB reason the DOM tier does.
"""

from __future__ import annotations

import re
from xml.etree import ElementTree

from .htmltext import BLOCK_RE, _visible_text, content_blocks
from .plaintext import TextParagraph

_DOCTYPE_RE = re.compile(rb"<!DOCTYPE", re.IGNORECASE)
#: prolog/root sniff: optional BOM + whitespace, then an XML
#: declaration or a name-started open tag (comments allowed between)
_XML_HEAD_RE = re.compile(
    rb"^(?:\xef\xbb\xbf)?\s*(?:<\?xml[\s?]|(?:<!--.*?-->\s*)*<[A-Za-z_])",
    re.DOTALL,
)

_FEED_ROOTS = {"rss", "feed", "rdf"}
_RICH_ELEMENTS = {"description", "summary", "content", "encoded"}
#: subtrees whose text is never content (XHTML-as-XML payloads carry
#: them; the DOM tier's DROP_RE analog for the tree walk)
_DROP_ELEMENTS = {"script", "style"}


def _local(tag) -> str:
    """Namespace-free local name (ElementTree keeps ``{uri}local``)."""
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def sniff_xml(raw: bytes) -> bool:
    """O(window) prefix signal: an XML declaration or a bare open tag.
    The deep probe's strict parse is the real gate; this only decides
    whether to attempt it (a payload starting ``<`` that is NOT XML
    then quarantines with the parse error, same as before this tier)."""
    return _XML_HEAD_RE.match(raw[:4096]) is not None


def _strip_join(text: str | None) -> str:
    """The tiers' shared normal form: stripped non-empty lines joined
    with ``\\n``."""
    if not text:
        return ""
    return "\n".join(
        ln.strip() for ln in text.split("\n") if ln.strip()
    )


def parse_xml(raw: bytes) -> ElementTree.Element:
    """Strict parse with the DTD refusal. Raises ``ValueError`` on
    anything short of a complete well-formed document."""
    # whole-payload scan: a DOCTYPE pushed past any fixed window by a
    # long comment must still refuse. Deliberately conservative — the
    # byte pattern inside a comment or CDATA section also quarantines,
    # which the targeted corpus classes (feeds/sitemaps/data exports)
    # never legitimately contain.
    if _DOCTYPE_RE.search(raw):
        raise ValueError(
            "XML payload declares a DTD: entity expansion is refused "
            "(decompression-bomb class guard); feeds/sitemaps/data "
            "XML never legitimately carry one"
        )
    try:
        return ElementTree.fromstring(raw)
    except ElementTree.ParseError as exc:
        raise ValueError(f"not well-formed XML: {exc}") from exc


def xml_blocks(raw: bytes) -> list[TextParagraph]:
    """Whole-document extraction per the module-docstring block model.
    Positions are a document-order counter — monotone, which is all
    the downstream ``(page, y1, x1)`` span sort needs."""
    root = parse_xml(raw)
    feed = _local(root.tag).lower() in _FEED_ROOTS
    out: list[TextParagraph] = []
    n = 0

    def emit(text: str) -> None:
        nonlocal n
        if text:
            out.append(TextParagraph(n, text))
        n += 1

    def rich(frag: str) -> None:
        # escaped/CDATA HTML content: DOM-tier walk, no link-density
        # drop (a feed item IS content). Loose text BETWEEN block
        # elements (intro/outro around a <p>) is routine in feeds and
        # must not drop: walk the fragment segment-wise in order.
        pos = 0
        for m in BLOCK_RE.finditer(frag):
            loose = _visible_text(frag[pos:m.start()])
            if loose:
                emit(loose)
            for b in content_blocks(m.group(0)):
                emit(b.text)
            pos = m.end()
        tail = _visible_text(frag[pos:])
        if tail:
            emit(tail)

    def enter(el):
        # on-enter emission; returns the child iterator, or None for
        # dropped subtrees (script/style — the DOM tier's DROP rule)
        name = _local(el.tag).lower()
        if name in _DROP_ELEMENTS:
            return None
        if feed and name in _RICH_ELEMENTS and el.text \
                and "<" in el.text:
            rich(el.text)
        else:
            emit(_strip_join(el.text))
        return iter(el)

    # explicit-stack DFS: a pathologically deep document (thousands of
    # nesting levels parses fine — expat is iterative) must not
    # RecursionError the Python walk into a silent zero-block result
    it = enter(root)
    stack = [(it, None)] if it is not None else []
    while stack:
        it, tail = stack[-1]
        child = next(it, None)
        if child is None:
            stack.pop()
            emit(_strip_join(tail))
            continue
        cit = enter(child)
        if cit is None:
            emit(_strip_join(child.tail))
        else:
            stack.append((cit, child.tail))
    return out


def validate_xml(raw: bytes) -> tuple[int, int, int]:
    """Deep-probe contract: the strict parse IS the validation (a
    parsed tree always renders). One reflowable page, no raster
    geometry."""
    parse_xml(raw)
    return 1, 0, 0


# ---------------------------------------------------------------------------
# test/fixture encoder (the tier round-trip contract)
# ---------------------------------------------------------------------------

def encode_xml(blocks: list[str]) -> bytes:
    """Blocks in the shared normal form -> a generic XML document whose
    extracted blocks are exactly the input (one leaf element per
    block, text XML-escaped)."""
    from .htmltext import escape_text

    body = "".join(f"<p>{escape_text(b)}</p>" for b in blocks)
    return f'<?xml version="1.0" encoding="utf-8"?><doc>{body}</doc>' \
        .encode()
