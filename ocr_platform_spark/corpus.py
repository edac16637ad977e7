"""Deterministic synthetic corpus generator (FIXTURES.md §1–§2).

Generates the two input tables of the engine, seeded and wall-clock free:

* ``documents(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`` —
  interleaved text + media spans (BASELINE.json ``input_hint`` shape);
* ``media(media_ref, content_type, filename, data, page_count)`` — SPDF1/SIMG1
  payloads (FIXTURES.md §2), the analog of the reference's MinIO objects
  (``apps/worker/app/services/storage_service.py``).

The generation profile exercises every reference behavior (citations per
FIXTURES.md): multi-page PDFs and single images (``ocr_tasks.py:34-55``),
heavy-tailed page counts (P50=1, P90≈4, max 200 — the skew fixture), bands
taller than 56 px (strip split, ``vietocr_engine.py:63-100``), bands at page
edges (clamp, ``recognize.py:9-13``), pages above 1200 px max side (preprocess
resize, ``preprocess.py:11-20``), pages with zero bands (empty-page
passthrough, ``orchestrator.py:133-137``), and same-``y1`` side-by-side bands
(reading-order x tie-break, ``json-editor.component.ts:157-161``).

Layout contract with the detector kernel (:mod:`ocr_platform_spark.kernels`):
intra-band line gaps render to <= 12 px (merged into one tall region by
``VGAP_BRIDGE=14``); distinct bands are separated vertically by >= 28 px and
horizontally by >= 48 px, so they never merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import formats
from .formats import Band, PageDesc
from .kernels import ALPHABET, text_px_width

SEED = 42

# short vocab over the glyph alphabet (glyphs are wide: ~180 px/char)
_VOCAB = [
    "ab", "be", "cd", "do", "ex", "fa", "go", "hi", "id", "jo",
    "key", "log", "map", "net", "ocr", "pdf", "row", "sum", "tab", "via",
    "scan", "data", "line", "page", "text", "word", "box-1", "mo0d",
]

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCUMENTS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))]
)
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("content_type", pa.string()),
        ("filename", pa.string()),
        ("data", pa.binary()),
        ("page_count", pa.int32()),
    ]
)


def _word(rng: np.random.Generator) -> str:
    return _VOCAB[int(rng.integers(0, len(_VOCAB)))]


def _page_count(rng: np.random.Generator, max_pages: int) -> int:
    """Heavy-tailed page count: P50=1, ~P90=4, tail to ``max_pages``.

    Branch bounds clamp to ``max_pages`` so small test corpora are valid;
    for ``max_pages >= 21`` the draws are identical to the unclamped
    form (seeded corpora stay byte-stable)."""
    u = rng.random()
    if u < 0.60 or max_pages < 2:
        return 1
    if u < 0.90:
        return int(rng.integers(2, min(5, max_pages + 1)))
    if u < 0.98 or max_pages < 21:
        return int(rng.integers(min(5, max_pages), min(21, max_pages + 1)))
    return int(rng.integers(21, max_pages + 1))


def _make_band(
    rng: np.random.Generator,
    y: int,
    page_w_units: int,
    px_per_unit: float,
    tall: bool,
    at_edge: bool,
) -> Band:
    if tall:
        n_lines = int(rng.integers(2, 5))
        line_h, gap = (16, 4) if px_per_unit > 1 else (34, 8)
    else:
        n_lines = 1
        line_h, gap = (20, 4) if px_per_unit > 1 else (42, 8)
    lines = [_word(rng) for _ in range(n_lines)]
    widest_px = max(text_px_width(t) for t in lines)
    max_x_units = max(8, int(page_w_units - widest_px / px_per_unit) - 4)
    x = 0 if at_edge else int(rng.integers(8, max(9, max_x_units)))
    return Band(x=x, y=y, lines=lines, line_h=line_h, gap=gap)


def _make_page(
    rng: np.random.Generator, width: int, height: int, px_per_unit: float
) -> PageDesc:
    """Lay bands top-down with >= 28 px rendered vertical separation."""
    if rng.random() < 0.08:  # empty page (passthrough fixture)
        return PageDesc(width=width, height=height, bands=[])
    bands: list[Band] = []
    sep_units = int(np.ceil(28 / px_per_unit)) + 2
    y = int(rng.integers(4, 20))
    n_bands = int(rng.integers(1, 5))
    for _ in range(n_bands):
        tall = rng.random() < 0.30
        at_edge = rng.random() < 0.10
        band = _make_band(rng, y, width, px_per_unit, tall, at_edge)
        band_h_units = len(band.lines) * band.line_h + (len(band.lines) - 1) * band.gap
        if y + band_h_units >= height - 4:
            break
        bands.append(band)
        # occasionally a same-y sibling band to the right (x tie-break fixture)
        if len(band.lines) == 1 and rng.random() < 0.25:
            w1_px = text_px_width(band.lines[0])
            sib_x_units = band.x + int((w1_px + 60) / px_per_unit) + 1
            sib_text = _word(rng)
            if (sib_x_units + text_px_width(sib_text) / px_per_unit) < width - 4:
                bands.append(
                    Band(x=sib_x_units, y=y, lines=[sib_text],
                         line_h=band.line_h, gap=band.gap)
                )
        y += band_h_units + sep_units + int(rng.integers(0, 10))
    return PageDesc(width=width, height=height, bands=bands)


def _make_pdf(rng: np.random.Generator, max_pages: int) -> tuple[bytes, int]:
    n = _page_count(rng, max_pages)
    # A4-ish (595x842 pt -> 1240x1754 px: exercises preprocess resize) or a
    # small page (400x500 pt -> 833x1042 px: no resize)
    pages = []
    for _ in range(n):
        w, h = (595, 842) if rng.random() < 0.6 else (400, 500)
        pages.append(_make_page(rng, w, h, formats.RENDER_DPI / formats.PDF_POINT_DPI))
    return formats.encode_pdf(pages), n


def _make_image(rng: np.random.Generator) -> bytes:
    # mostly <=1200 px (no resize); some 1600 px wide (resize path on images)
    w, h = (1000, 750) if rng.random() < 0.7 else (1600, 900)
    return formats.encode_image(_make_page(rng, w, h, 1.0))


def generate(
    n_docs: int, seed: int = SEED, max_pages: int = 200
) -> tuple[list[dict], dict[str, dict]]:
    """Generate ``n_docs`` documents.

    Returns ``(documents, media)`` where documents is a list of
    ``{doc_id, spans:[{kind,text,media_ref,offset}]}`` and media maps
    ``media_ref -> {content_type, filename, data, page_count}``.
    """
    rng = np.random.default_rng(seed)
    docs: list[dict] = []
    media: dict[str, dict] = {}
    for d in range(n_docs):
        doc_id = f"doc-{d:08d}"
        u = rng.random()
        if u < 0.10:  # text-only
            n_text, n_media = int(rng.integers(1, 9)), 0
        elif u < 0.15:  # media-only
            n_text, n_media = 0, int(rng.integers(1, 4))
        else:
            n_text, n_media = int(rng.integers(1, 9)), int(rng.integers(1, 4))
        kinds = ["text"] * n_text + ["media"] * n_media
        rng.shuffle(kinds)
        spans = []
        for off, k in enumerate(kinds):
            if k == "text":
                words = " ".join(_word(rng) for _ in range(int(rng.integers(1, 4))))
                pad = " " if rng.random() < 0.3 else ""  # exercises strip()
                spans.append(
                    {"kind": "text", "text": pad + words + pad,
                     "media_ref": None, "offset": off}
                )
                continue
            ref = f"m-{d:08d}-{off:02d}"
            if rng.random() < 0.55:
                data, pc = _make_pdf(rng, max_pages)
                media[ref] = {
                    "content_type": "application/pdf",
                    "filename": f"{ref}.pdf",
                    "data": data,
                    "page_count": pc,
                }
                spans.append(
                    {"kind": "pdf", "text": None, "media_ref": ref, "offset": off}
                )
            else:
                media[ref] = {
                    "content_type": "image/png",
                    "filename": f"{ref}.png",
                    "data": _make_image(rng),
                    "page_count": 1,
                }
                spans.append(
                    {"kind": "image", "text": None, "media_ref": ref, "offset": off}
                )
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs, media


def write_parquet(
    out_dir: str,
    n_docs: int,
    seed: int = SEED,
    max_pages: int = 200,
    n_files: int = 1,
) -> tuple[str, str]:
    """Materialize documents.parquet + media.parquet under ``out_dir``.

    With ``n_files > 1`` each table is a *directory* of part files (what a
    real Iceberg/parquet table looks like) so Spark's scan parallelizes —
    a single monolithic file serializes the head of every job that reads
    it. Spark and pyarrow both read the directory transparently.
    """
    import os

    docs, media = generate(n_docs, seed=seed, max_pages=max_pages)
    os.makedirs(out_dir, exist_ok=True)
    doc_path = os.path.join(out_dir, "documents.parquet")
    media_path = os.path.join(out_dir, "media.parquet")
    media_rows = [
        {"media_ref": k, **{kk: vv for kk, vv in v.items()}}
        for k, v in sorted(media.items())
    ]

    def _write(rows: list[dict], schema: pa.Schema, path: str) -> None:
        if n_files <= 1:
            pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
            return
        os.makedirs(path, exist_ok=True)
        chunk = (len(rows) + n_files - 1) // n_files or 1
        for i in range(0, max(1, n_files)):
            part = rows[i * chunk : (i + 1) * chunk]
            if not part and i > 0:
                break
            pq.write_table(
                pa.Table.from_pylist(part, schema=schema),
                os.path.join(path, f"part-{i:05d}.parquet"),
            )

    _write(docs, DOCUMENTS_SCHEMA, doc_path)
    _write(media_rows, MEDIA_SCHEMA, media_path)
    return doc_path, media_path
