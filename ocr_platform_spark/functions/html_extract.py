"""HTML main-content extraction (north_rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

The corpus side synthesizes a deterministic HTML page per document (nav /
header / sidebar-links / footer boilerplate around the real text as
``<p>`` paragraphs), then two extraction tiers:

* :func:`strip_tags_expr` — pure-relational tag stripping: drop
  ``<script>``/``<style>`` subtrees, strip tags, decode the basic
  entities, collapse whitespace. Native ``regexp_replace`` chain (same
  regex cascade in DuckDB with the ``'g'`` flag → full oracle parity).
* :func:`main_content` — the DOM-heuristic tier as a vectorized
  ``mapInPandas`` UDF: split into block elements, score each block by
  text length x (1 - link density) — the readability/boilerpipe-style
  density heuristic — and keep blocks above a fraction of the best
  score. Deterministic; pinned against a pure-Python oracle in pytest.

Scale shape: both are narrow per-row maps (no shuffle); the regex tier
is whole-stage-codegen JVM work, the heuristic tier Arrow-batched.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- deterministic synthetic page --------------------------------------------

_NAV = '<nav class="menu"><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>'
_FOOTER = '<footer><a href="/terms">terms</a> <a href="/privacy">privacy</a> copyright site</footer>'
_SCRIPT = "<script>var t = 1 + 2; track(t);</script>"
_STYLE = "<style>.menu { color: red }</style>"


def synthesize_html(doc_id_col: Column, text_col: Column) -> Column:
    """Deterministic HTML page: boilerplate + the text as paragraphs.

    Paragraph split: the text is wrapped as two ``<p>`` halves split at a
    doc_id-seeded word position, plus a link-heavy sidebar derived from
    the doc_id — so main-content extraction has real work to do.
    """
    sidebar = F.concat(
        F.lit('<div class="sidebar"><a href="/x'),
        doc_id_col.cast("string"),
        F.lit('">related</a> <a href="/y'),
        doc_id_col.cast("string"),
        F.lit('">more</a> links</div>'),
    )
    body = F.concat(F.lit("<p>"), text_col, F.lit("</p>"))
    return F.concat(
        F.lit("<html><head>" + _STYLE + _SCRIPT + "</head><body>"),
        F.lit(_NAV),
        sidebar,
        F.lit('<div class="content">'),
        body,
        F.lit("</div>"),
        F.lit(_FOOTER),
        F.lit("</body></html>"),
    )


_SQL_SYNTH = (
    "'<html><head>" + _STYLE + _SCRIPT + "</head><body>" + _NAV + "'"
    " || '<div class=\"sidebar\"><a href=\"/x' || CAST(doc_id AS VARCHAR)"
    " || '\">related</a> <a href=\"/y' || CAST(doc_id AS VARCHAR)"
    " || '\">more</a> links</div>'"
    " || '<div class=\"content\"><p>' || text || '</p></div>'"
    " || '" + _FOOTER + "</body></html>'"
)

# --- tier 1: relational tag strip --------------------------------------------

# cascade order matters: subtree drops first, then tags, entities, spaces.
# (?s) inline DOTALL works identically in Java regex and RE2. Entity order:
# &amp; must decode LAST or doubly-escaped entities ("&amp;lt;") would
# double-decode to "<" instead of "&lt;".
_STRIP_STEPS = [
    ("(?s)<script[^>]*>.*?</script>", " "),
    ("(?s)<style[^>]*>.*?</style>", " "),
    ("<[^>]+>", " "),
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
    ("[ \\t\\n\\r]+", " "),
]


def strip_tags_expr(html: Column) -> Column:
    out = html
    for pat, rep in _STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def sql_strip_tags(expr: str) -> str:
    out = expr
    for pat, rep in _STRIP_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"


def html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-strip tier over synthesized pages: visible text only."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = synthesize_html(F.col("doc_id"), F.col("text"))
    return docs.select(
        "doc_id", strip_tags_expr(html).alias("visible_text")
    )


HTML_TEXT_SQL = f"""
SELECT doc_id, {sql_strip_tags(_SQL_SYNTH)} AS visible_text
FROM documents
"""

# --- tier 2: DOM-heuristic main content --------------------------------------

_BLOCK_RE = re.compile(
    r"<(p|div|nav|footer|header|article|section)\b[^>]*>(.*?)</\1>",
    re.S | re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_LINK_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S | re.I)
_WS_RE = re.compile(r"\s+")
KEEP_FRACTION = 0.5  # keep blocks scoring >= this fraction of the best


def _innermost_blocks(html: str, base: int = 0):
    """Yield ``(document_position, inner_html)`` for every INNERMOST block
    element, recursing into containers. Recursion matters: ``finditer``
    consumes a container match whole, so without descending into it the
    blocks nested inside (e.g. the ``<p>`` inside ``<div class="content">``)
    would never be visited at all — the exact bug the analytic DuckDB
    oracle (MAIN_CONTENT_SQL below) caught: the heuristic returned only the
    footer and dropped the article text it exists to extract."""
    for m in _BLOCK_RE.finditer(html):
        inner = m.group(2)
        if _BLOCK_RE.search(inner):
            yield from _innermost_blocks(inner, base + m.start(2))
        else:
            yield base + m.start(), inner


def extract_main_content(html: str) -> str:
    """Pure-Python density heuristic (shared by the UDF and the pytest
    oracle): innermost block elements scored by
    ``text_len * (1 - link_density)``; keep high-scoring blocks in
    document order."""
    blocks = []
    for pos, inner in _innermost_blocks(html):
        link_text = "".join(l for l in _LINK_RE.findall(inner))
        text = _WS_RE.sub(" ", _TAG_RE.sub(" ", inner)).strip()
        if not text:
            continue
        link_len = len(_WS_RE.sub(" ", _TAG_RE.sub(" ", link_text)).strip())
        density = link_len / len(text) if text else 1.0
        blocks.append((pos, text, len(text) * (1.0 - density)))
    if not blocks:
        return ""
    blocks.sort(key=lambda b: b[0])
    best = max(s for _, _, s in blocks)
    kept = [t for pos, t, s in blocks if s >= KEEP_FRACTION * best and s > 0]
    return " ".join(kept)


def main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM-heuristic tier: boilerplate blocks (nav/sidebar/footer — high
    link density, short text) drop out; the content paragraphs survive."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        synthesize_html(F.col("doc_id"), F.col("text")).alias("html"),
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "main_text": pdf["html"].map(extract_main_content),
                }
            )

    return docs.mapInPandas(_extract, schema="doc_id bigint, main_text string")


# Analytic DuckDB oracle for the heuristic tier. The synthesized page has
# exactly four innermost block elements with closed-form scores
# (score = text_len x (1 - link_density) on ws-collapsed text):
#
#   nav      "home about contact"             18 chars, 16 linked -> 2.0
#   sidebar  "related more links"             18 chars, 11 linked -> 7.0
#   <p>      the document text, L chars, 0 linked              -> L
#   footer   "terms privacy copyright site"   28 chars, 12 linked -> 16.0
#
# With KEEP_FRACTION = 0.5 and best >= 16 always (footer), nav (2) and
# sidebar (7) can never reach 0.5*best = 8; the <p> survives iff L >= 8
# (when L < 16 the best is the footer's 16), and the footer survives iff
# 16 >= 0.5*max(16, L), i.e. L <= 32. Kept blocks join in document order.
# This derivation is *independent* of the UDF's block-parsing code path —
# the oracle checks the heuristic's outcome, not its implementation.
# (Assumes the corpus text contains no '<'/'>' and only ASCII whitespace,
# both true of the synthetic documents tables. length() = character count,
# matching Python len() code points even for non-ASCII corpora — byte-count
# strlen() would silently diverge near the L=8/L=32 boundaries.)
_T = "trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))"
_FOOTER_TEXT = "terms privacy copyright site"
MAIN_CONTENT_SQL = f"""
SELECT doc_id,
  CASE
    WHEN length({_T}) > 32 THEN {_T}
    WHEN length({_T}) >= 8 THEN {_T} || ' {_FOOTER_TEXT}'
    ELSE '{_FOOTER_TEXT}'
  END AS main_text
FROM documents
"""
