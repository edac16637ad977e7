"""Single-node oracle: the reference extraction semantics in pure Python/numpy.

This is the authoritative definition of "what the reference computes" for the
pytest equality gate (SURVEY.md §5): the Spark job's per-document span output
must equal this oracle's output on ``(kind, text, media_ref, order)``.

It mirrors the reference's *production* two-phase flow:

1. Detect phase — ``run_job`` (``apps/worker/app/tasks/ocr_tasks.py:66-128``):
   render media bytes to pages (``_raw_to_pages``, ``ocr_tasks.py:34-55``), run
   the detector on each **raw rendered page** (no preprocess before detect in
   ``run_job``; ``ocr_tasks.py:110-118``), collect per-page
   ``(page_index, width, height, boxes)`` — the ``detect_result`` boundary.
2. Recognize phase — ``run_ocr_with_boxes``
   (``libs/ocr_core/ocr_core/pipeline/orchestrator.py:116-174``): per page,
   empty-box passthrough (``:133-137``), preprocess resize (``:141``), box
   scale-to-crop with ``int()`` floor keeping **original** boxes for output
   (``:143-155``), recognize with original heights (``:156``), unicode
   ``str.strip`` postprocess (``:157``; ``pipeline/postprocess.py:4-6``),
   ``n = min(...)`` truncation alignment (``:158``), block assembly with
   deterministic ids (uuid fragment of ``:166`` excluded from the invariant).

Span emission (the Iceberg-table semantics this engine adds on top — the
reference emits per-job JSON, we emit a ``spans`` array per document):

* spans are visited in input ``offset`` order;
* a ``text`` span passes through as ``(kind='text', strip(text), media_ref=None)``;
* a media span is replaced by one ``(kind='text', block.text, media_ref=<source>)``
  span per recognized block, pages in index order (``orchestrator.py:131``),
  blocks within a page in **reading order**: ``y1`` asc then ``x1`` asc — the
  layout sort the frontend applies for display
  (``frontend-angular/src/app/components/json-editor/json-editor.component.ts:157-161``),
  tie-broken by detector emission index for a total order;
* ``order`` is the 0-based emission index within the document.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import formats, kernels, raster


@dataclass(frozen=True)
class Block:
    block_id: str  # deterministic "{page_index}-{i}" (cf. orchestrator.py:88)
    box: tuple[int, int, int, int]
    score: float
    text: str
    conf: float


@dataclass(frozen=True)
class Page:
    page_index: int
    width: int
    height: int
    blocks: tuple[Block, ...]


@dataclass(frozen=True)
class OutSpan:
    kind: str
    text: str | None
    media_ref: str | None
    order: int


def raw_to_pages(raw: bytes) -> list[np.ndarray]:
    """``_raw_to_pages`` analog (``ocr_tasks.py:34-55``): PDF -> one raster per
    page at dpi=150; image -> single raster at native pixel size."""
    kind, pages = formats.decode_media(raw)
    scale = raster.PDF_UNIT_SCALE if kind == "pdf" else 1.0
    return [raster.render_page(p, scale) for p in pages]


def detect_document(
    raw: bytes, pages: "list[np.ndarray] | None" = None
) -> list[dict]:
    """Detect phase (``ocr_tasks.py:108-118``): per page, boxes from the
    detector on the raw rendered page; returns the ``detect_result`` pages
    payload shape ``{page_index, width, height, boxes:[{x1,y1,x2,y2}]}``.

    ``pages``: pass already-rendered rasters to skip the second
    decode+render (the render is the expensive step on multi-page PDFs)."""
    if pages is None:
        pages = raw_to_pages(raw)
    detect_pages = []
    for i, img in enumerate(pages):
        boxes = kernels.detect_text_boxes(img)
        h, w = img.shape[:2]
        detect_pages.append(
            {
                "page_index": i,
                "width": w,
                "height": h,
                "boxes": [
                    {"x1": x1, "y1": y1, "x2": x2, "y2": y2}
                    for (x1, y1, x2, y2) in boxes
                ],
            }
        )
    return detect_pages


def recognize(
    img: "np.ndarray | raster.PrepView",
    boxes: list[tuple[int, int, int, int]],
    original_heights: list[int] | None = None,
) -> list[tuple[str, float]]:
    """``pipeline/recognize.py:15-24``: clamp-crop each box then batch predict."""
    if isinstance(img, raster.PrepView):
        crops = [img.crop(b) for b in boxes]
    else:
        crops = [raster.crop(img, b) for b in boxes]
    return kernels.predict_batch(crops, original_heights=original_heights)


def postprocess_texts(texts: list[str]) -> list[str]:
    """``pipeline/postprocess.py:4-6`` — unicode ``str.strip`` per text."""
    return [t.strip() for t in texts]


def run_ocr_with_boxes(
    doc_id: str, pages: list[np.ndarray], detect_pages: list[dict]
) -> list[Page]:
    """Exact port of ``run_ocr_with_boxes`` (``orchestrator.py:116-174``)."""
    by_index = {p["page_index"]: p for p in detect_pages}
    ocr_pages: list[Page] = []
    for page_index, img in enumerate(pages):
        page_data = by_index.get(page_index, {})
        raw_boxes = page_data.get("boxes") or []
        if not raw_boxes:
            w_orig = page_data.get("width") or img.shape[1]
            h_orig = page_data.get("height") or img.shape[0]
            ocr_pages.append(Page(page_index, w_orig, h_orig, ()))
            continue
        boxes_orig = [
            (int(b["x1"]), int(b["y1"]), int(b["x2"]), int(b["y2"])) for b in raw_boxes
        ]
        img_prep = raster.PrepView(img)  # lazy: same pixels as preprocess_image
        w_prep, h_prep = img_prep.size
        w_orig = page_data.get("width") or img.shape[1]
        h_orig = page_data.get("height") or img.shape[0]
        scale_x = w_prep / w_orig if w_orig else 1.0
        scale_y = h_prep / h_orig if h_orig else 1.0
        boxes_for_crop = []
        original_heights = []
        for (x1, y1, x2, y2) in boxes_orig:
            boxes_for_crop.append(
                (int(x1 * scale_x), int(y1 * scale_y), int(x2 * scale_x), int(y2 * scale_y))
            )
            original_heights.append(y2 - y1)
        rec = recognize(img_prep, boxes_for_crop, original_heights=original_heights)
        texts = postprocess_texts([t for t, _ in rec])
        n = min(len(boxes_orig), len(rec), len(texts))
        blocks = tuple(
            Block(
                block_id=f"{page_index}-{i}",
                box=boxes_orig[i],
                score=1.0,
                text=texts[i],
                conf=rec[i][1],
            )
            for i in range(n)
        )
        ocr_pages.append(Page(page_index, w_orig, h_orig, blocks))
    return ocr_pages


def extract_media(raw: bytes) -> list[Page]:
    """Full two-phase pipeline for one media payload: detect then recognize
    (decode+render happens once; both phases share the rasters)."""
    pages = raw_to_pages(raw)
    detect_pages = detect_document(raw, pages=pages)
    return run_ocr_with_boxes("oracle", pages, detect_pages)


def run_ocr_fused(doc_id: str, pages: list[np.ndarray]) -> list[Page]:
    """Exact port of the one-shot fused ``run_ocr``
    (``libs/ocr_core/ocr_core/pipeline/orchestrator.py:34-113``).

    Distinct semantics vs the production two-phase flow
    (:func:`run_ocr_with_boxes`):

    * preprocess runs **before** detect (``orchestrator.py:42-48``), so
      detection sees the resized page;
    * output boxes are in **preprocessed-image** coordinates — there is no
      scale-back to original page space (``orchestrator.py:82``: ``box =
      boxes[i]`` verbatim), and the emitted page ``width``/``height`` are the
      preprocessed dims (``orchestrator.py:44``, ``:101``);
    * ``recognize(img, boxes)`` passes no ``original_heights``
      (``orchestrator.py:59-64``), so the tall-box strip split keys off the
      **crop height only** (``vietocr_engine.py:89-100`` else-branch).

    Dead code in the reference API (only ``run_ocr_with_boxes`` is reachable
    from ``ocr_tasks.py``) but the cleanest statement of the fused semantics
    (SURVEY.md §3.3); exposed here so both coordinate conventions are
    available (VERDICT round 1, "What's missing" #4).
    """
    ocr_pages: list[Page] = []
    for page_index, img in enumerate(pages):
        img = raster.preprocess_image(img)  # orchestrator.py:43
        h, w = img.shape[:2]  # PIL .size convention -> (w, h) emitted below
        boxes = kernels.detect_text_boxes(img)  # on the PREPROCESSED page
        rec = recognize(img, boxes)  # original_heights=None
        texts = postprocess_texts([t for t, _ in rec])
        n = min(len(boxes), len(rec), len(texts))  # orchestrator.py:75
        blocks = tuple(
            Block(
                block_id=f"{page_index}-{i}",
                box=boxes[i],  # preprocessed coords, verbatim
                score=1.0,
                text=texts[i],
                conf=rec[i][1],
            )
            for i in range(n)
        )
        ocr_pages.append(Page(page_index, w, h, blocks))
    return ocr_pages


def extract_media_fused(raw: bytes) -> list[Page]:
    """One media payload through the fused one-shot pipeline."""
    return run_ocr_fused("oracle", raw_to_pages(raw))


def reading_order(blocks: tuple[Block, ...]) -> list[Block]:
    """Reading-order sort: ``y1`` asc, ``x1`` asc
    (``json-editor.component.ts:157-161``), then emission index (stable)."""
    ranked = sorted(enumerate(blocks), key=lambda t: (t[1].box[1], t[1].box[0], t[0]))
    return [b for _, b in ranked]


def extract_document(
    spans: list[dict], media_bytes: dict[str, bytes], fused: bool = False
) -> list[OutSpan]:
    """Emit the output span sequence for one document (module docstring rules).

    ``fused=True`` runs each media payload through the one-shot
    :func:`run_ocr_fused` coordinate semantics instead of the production
    two-phase flow; the span-emission rules are identical (the reading-order
    sort applies to whichever coordinate space the blocks carry)."""
    extract = extract_media_fused if fused else extract_media
    out: list[OutSpan] = []
    order = 0
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span["kind"] == "text":
            out.append(OutSpan("text", (span["text"] or "").strip(), None, order))
            order += 1
            continue
        ref = span["media_ref"]
        for page in extract(media_bytes[ref]):
            for block in reading_order(page.blocks):
                out.append(OutSpan("text", block.text, ref, order))
                order += 1
    return out
