"""Distributed OCR over REAL-codec media (scanned PDF, multi-page G4
TIFF, PNG, baseline JPEG) — the end-to-end path a user of the reference
actually runs
(``apps/worker/app/tasks/ocr_tasks.py:34-55`` decodes uploaded
PDF/image bytes with fitz/PIL before detect+recognize).

The synthetic flagship (:func:`..operators.extract.extract_documents`)
exploits that SPDF1/SIMG1 pages are *parametric descriptors*: the page
explode ships ~200-byte JSON rows, so pixels never cross a shuffle.
Real media has no descriptor — the OCR task needs the payload bytes —
so this pipeline uses a different, explicitly skew-bounded shape:

1. **probe** (``mapInPandas`` over spans⋈payloads): header-only page
   count (:func:`pdfcodec.validate_scanned` — xref walk + content-stream
   interpretation, image samples never inflated; images are 1 page) and
   explode into page *buckets* of ``bucket_pages`` pages. Each bucket
   row carries the payload once. Unsupported/corrupt payloads (vector
   PDFs, truncated files, synthetic containers) quarantine HERE as
   ``media_kind=error`` rows — before any payload is duplicated.
2. **repartition** on ``(doc_id, offset, bucket_index)`` — the skew fix:
   a 2,000-page scanned PDF becomes ⌈2000/K⌉ independent tasks instead
   of one straggler. Multi-bucket PDFs are *sliced* at probe time
   (``slice_payloads=True`` default): each bucket row carries a minimal
   sub-PDF holding only its own pages' content/image streams
   (:class:`..pdfcodec._Slicer`), so the whole document's bytes cross
   the bucket shuffle ~once in total — the in-DataFrame analog of the
   byte-range reads a cloud-storage pipeline would issue. With
   ``slice_payloads=False`` the full payload rides on every bucket row
   (amplification ⌈pages/K⌉). ``bucket_pages=None`` disables bucketing
   (one task per media, zero duplication) for corpora known to have
   bounded page counts.
3. **OCR** (``mapInPandas``): decode ONLY the bucket's pages
   (``pdfcodec.decode_pdf(page_indices=...)`` inflates just those
   pages' streams), grayscale with PIL's exact ``convert("L")`` integer
   luma, then the *shared* OCR core
   (:func:`..operators.extract.ocr_rendered_page`) — detect, PrepView
   crops, strip recognition, unicode strip — so the real and synthetic
   paths cannot drift.
4. **assemble**: the same sentinel-based
   :func:`..operators.extract.assemble_spans` re-emits each document's
   interleaved span array.

**The OCR-bypass tier** (``text_layer=True``, the default): born-digital
PDF pages that carry their text in content-stream show operators are
parsed directly (:mod:`..pdftext`) instead of rasterized and OCR'd —
dispatch is PER PAGE inside stage 3, so a mixed document (a text cover
page stapled to scanned pages, or an upstream-OCR'd file with its
invisible text layer) extracts each page the cheap way and still
assembles into one reading-ordered span array. At 100 TB this is the
dominant efficiency lever of the whole pipeline: a text-layer page
costs microseconds of string parsing instead of ~10 ms of raster +
detect + recognize, and the page-bucket shuffle shape above is
unchanged (text pages make buckets *cheaper*, never bigger). The strict
scanned-only contract of rounds 1-3 remains available as
``text_layer=False``.

**The HTML DOM tier**: payloads sniffing as HTML (the dominant document
kind of a real web-scale corpus; no analog in the reference, which only
OCRs uploads) are one reflowable "page" extracted by DOM heuristics —
innermost block elements, link-density boilerplate drop
(:mod:`..htmltext`) — through the same probe/quarantine, bucket and
span-assembly stages. Like the text layer, an HTML page costs string
parsing only; unlike PDFs it is independent of the ``text_layer`` flag
(there is no raster alternative to fall back to).

**The office and plain-text tiers**: ``PK``-magic payloads refine at
probe time into DOCX (``word/document.xml`` paragraphs,
:mod:`..docxtext`; other archives quarantine) and payloads matching NO
magic take the strict plain-text contract (:mod:`..plaintext` — UTF-8,
no binary controls, no leading markup; anything else quarantines as
before). Both are reflowable single "pages" through the same
probe/bucket/assembly stages, like HTML.

Equality contract (pinned in tests/test_extract_real.py): a corpus whose
synthetic media are re-encoded as real PNG files / scanned PDFs at
identity scale extracts EXACTLY the same spans through this pipeline as
the synthetic corpus does through ``extract_documents``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import (csvtext, docxtext, emltext, epubtext, formats, gifcodec,
                htmltext, jpegcodec, jsontext, mdtext, multimodal,
                odttext, pdfcodec, pdftext, plaintext, pngcodec,
                pptxtext, rtftext, tiffcodec, transport, xlsxtext,
                xmltext)
from ..schemas import BLOCK
from .extract import (
    _INT_BLOCK_COLS,
    MEDIA_KIND_ERROR,
    _span_refs_fit_broadcast,
    assemble_spans,
    exploded_spans,
    ocr_rendered_page,
    shared_exploded_spans,
)

#: pages per OCR task. ⌈pages/K⌉ payload copies cross the bucket shuffle;
#: K pages of raster work bound each task's CPU time.
DEFAULT_BUCKET_PAGES = 8

#: multi-page container codecs sharing the (slice_pages, decode) shape —
#: a new paged format registers here once and both the bucket slicer and
#: the OCR-stage decoder pick it up (PDF stays special: its slicer is a
#: parse-once object and its decode is the text-layer/raster hybrid)
_PAGED_CODECS = {
    "tiff": (tiffcodec.slice_pages, tiffcodec.decode_tiff),
    "gif": (gifcodec.slice_pages, gifcodec.decode_gif),
}

#: multi-page TEXT containers (pages extract as blocks, never rasters)
#: sharing the same (slice_pages, page_blocks) bucket shape — sheets /
#: chapters / messages are pages, so the skew bucketing and probe-time
#: slicing apply
_PAGED_TEXT_CODECS: dict = {}

#: multi-page MIXED containers: pages carry text blocks AND embedded
#: pictures that OCR in place (round 5 — PPTX ``p:pic``, EPUB
#: ``<img>``); same bucket / slice shape, but the page renderer
#: returns ordered part lists
_PAGED_MIXED_CODECS = {
    "pptx": (pptxtext.slice_slides, pptxtext.slide_parts),
    "epub": (epubtext.slice_chapters, epubtext.chapter_parts),
    "mbox": (emltext.slice_messages, emltext.mbox_page_parts),
    "xlsx": (xlsxtext.slice_sheets, xlsxtext.sheet_parts),
}

REAL_BUCKET = (
    "doc_id string, offset int, media_ref string, media_kind string, "
    "bucket_index int, page_lo int, page_hi int, error string, "
    "sliced boolean, data binary"
)


def _probe(raw: bytes, text_layer: bool = False) -> tuple[str, int]:
    """Structural pre-flight + ``(kind, n_pages)`` without inflating
    samples — :func:`..multimodal.probe_real_media` with ``deep=True``
    (full scanned-subset walk for PDFs; chunk-CRC / marker-bounds checks
    for PNG/JPEG), so truncated/corrupt payloads quarantine HERE, with a
    triage row, instead of silently dropping at the OCR stage. Residual
    (undetectable-at-probe) corruption is entropy-level only: JPEG
    entropy bits carry no checksum, and a PDF image stream can hold a
    structurally-valid but broken body; those degrade to zero blocks at
    decode (see ``_ocr_real_batches``).

    ``text_layer=True`` validates PDFs under the HYBRID per-page
    contract (:func:`..pdftext.validate_hybrid`): born-digital pages are
    text-layer-validated instead of quarantined as vector content."""
    kind, n_pages, _w, _h = multimodal.probe_real_media(
        raw, deep=True, text_layer=text_layer
    )
    return kind, n_pages


def _bucket_batches_fn(bucket_pages: int | None,
                       slice_payloads: bool = True,
                       text_layer: bool = False):
    def _bucket_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "offset", "media_ref", "media_kind",
                "bucket_index", "page_lo", "page_hi", "error",
                "sliced", "data"]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, offset, ref, data in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_ref"], pdf["data"]
            ):
                raw = bytes(data)
                try:
                    # compressed transport wrappers (.html.gz /
                    # .txt.bz2 / .xml.xz) inflate ONCE here, before
                    # probe and slicing, so every downstream feature
                    # (per-page slices, hybrid dispatch, tier
                    # extraction) sees the inner document; corruption /
                    # bombs / over-nesting quarantine like any other
                    # probe failure (..transport module docstring)
                    raw = transport.maybe_unwrap(raw)
                    kind, n_pages = _probe(raw, text_layer)
                except Exception as exc:
                    # quarantine BEFORE the payload is duplicated: one
                    # narrow error row, no data rides along
                    out["doc_id"].append(doc_id)
                    out["offset"].append(offset)
                    out["media_ref"].append(ref)
                    out["media_kind"].append(MEDIA_KIND_ERROR)
                    out["bucket_index"].append(-1)
                    out["page_lo"].append(-1)
                    out["page_hi"].append(-1)
                    out["error"].append(str(exc)[:200])
                    out["sliced"].append(False)
                    out["data"].append(None)
                    continue
                k = bucket_pages or max(1, n_pages)
                n_buckets = max(1, (n_pages + k - 1) // k)
                slice_fn = None
                if slice_payloads and n_buckets > 1:
                    # parse once per document; each bucket row then
                    # carries a minimal sub-document (only its own
                    # pages' streams) instead of a full-payload copy —
                    # the whole document crosses the bucket shuffle
                    # ~once in total instead of ⌈pages/K⌉ times
                    try:
                        if kind == "pdf":
                            slice_fn = pdfcodec._Slicer(raw).slice
                        elif kind in _PAGED_CODECS:
                            slice_fn = (
                                lambda idx, _r=raw, _k=kind:
                                _PAGED_CODECS[_k][0](_r, idx)
                            )
                        elif kind in _PAGED_TEXT_CODECS:
                            slice_fn = (
                                lambda idx, _r=raw, _k=kind:
                                _PAGED_TEXT_CODECS[_k][0](_r, idx)
                            )
                        elif kind in _PAGED_MIXED_CODECS:
                            slice_fn = (
                                lambda idx, _r=raw, _k=kind:
                                _PAGED_MIXED_CODECS[_k][0](_r, idx)
                            )
                    except ValueError:
                        slice_fn = None
                for b in range(n_buckets):
                    lo, hi = b * k, min(n_pages, (b + 1) * k)
                    payload, sliced = raw, False
                    if slice_fn is not None:
                        try:
                            payload = slice_fn(range(lo, hi))
                            sliced = True
                        except ValueError:
                            # probe already validated the doc, so this
                            # is near-dead defensive code: fall back to
                            # the full payload rather than quarantine
                            pass
                    out["doc_id"].append(doc_id)
                    out["offset"].append(offset)
                    out["media_ref"].append(ref)
                    out["media_kind"].append(kind)
                    out["bucket_index"].append(b)
                    out["page_lo"].append(lo)
                    out["page_hi"].append(hi)
                    out["error"].append(None)
                    out["sliced"].append(sliced)
                    out["data"].append(payload)
            res = pd.DataFrame(out)
            for c in ("offset", "bucket_index", "page_lo", "page_hi"):
                res[c] = res[c].astype("int32")
            yield res

    return _bucket_batches


def emit_text_blocks(doc_id: str, offset: int, ref: str, page_index: int,
                     blocks: list, page_w: int, page_h: int,
                     out: dict[str, list]) -> None:
    """Text-layer / DOM-tier blocks -> the same ``BLOCK`` rows the OCR
    core emits (:func:`..operators.extract.ocr_rendered_page`): one row
    per block, ``conf=1.0`` (the source text is authoritative — there is
    no recognition uncertainty to score), text under the M11
    unicode-strip contract. ``blocks`` duck-types on
    ``x1/y1/x2/y2/text`` (:class:`..pdftext.TextBlock` or
    :class:`..htmltext.ContentBlock`)."""
    for i, b in enumerate(blocks):
        text = b.text.strip()
        if not text:
            continue
        out["doc_id"].append(doc_id)
        out["offset"].append(offset)
        out["media_ref"].append(ref)
        out["page_index"].append(page_index)
        out["block_index"].append(i)
        out["x1"].append(b.x1)
        out["y1"].append(b.y1)
        out["x2"].append(b.x2)
        out["y2"].append(b.y2)
        out["text"].append(text)
        out["conf"].append(1.0)
        out["page_width"].append(page_w)
        out["page_height"].append(page_h)


def _decode_raster_pages(payload: bytes) -> list:
    """Standalone raster payload -> grayscale page list via the magic
    dispatch (PNG/BMP/TIFF/GIF/JPEG), shared by the top-level image
    branch and the office embedded-media interleave."""
    kind = formats.sniff_kind(payload)
    if kind == "png":
        return [pdfcodec.rgb_to_gray(pngcodec.decode_png(payload))]
    if kind == "bmp":
        from .. import bmpcodec

        return [pdfcodec.rgb_to_gray(bmpcodec.decode_bmp(payload))]
    if kind in _PAGED_CODECS:
        return _PAGED_CODECS[kind][1](payload, mode="L", page_indices=None)
    return [pdfcodec.rgb_to_gray(jpegcodec.decode_jpeg(payload))]


def _decode_mixed_parts(parts: list[tuple]) -> list[tuple]:
    """One MIXED page's part walk -> emission-ready parts: text parts
    pass through, each supported embedded picture decodes to
    ``("rasters", ordinal, gray_pages)`` (so decode failures surface
    inside the caller's atomic try), unsupported formats drop."""
    out: list[tuple] = []
    for part in parts:
        if part[0] == "text":
            out.append(part)
        elif formats.sniff_kind(part[-1]) in docxtext.EMBED_RASTER_KINDS:
            out.append(
                ("rasters", part[1], _decode_raster_pages(part[-1]))
            )
    return out


def _office_content(parts: list[tuple]) -> list[tuple]:
    """Part walk output (:func:`..docxtext.document_parts` /
    :func:`..odttext.document_parts` / :func:`..rtftext.document_parts`
    / :func:`..htmltext.html_parts`) -> ordered ``("text", text)`` /
    ``("raster", gray_page)`` content items; the text/payload slot is
    uniformly the LAST tuple element across the walks. Embedded
    pictures whose bytes sniff as a supported raster codec decode here
    (a multi-frame TIFF/GIF contributes one item per frame, in frame
    order); unsupported formats (EMF/WMF vectors, nested containers)
    contribute nothing — the deep probe validates exactly this subset
    (:func:`..docxtext.validate_embedded_media`)."""
    content: list[tuple] = []
    for part in parts:
        if part[0] == "text":
            content.append(("text", part[-1]))
        elif formats.sniff_kind(part[-1]) in docxtext.EMBED_RASTER_KINDS:
            for page in _decode_raster_pages(part[-1]):
                content.append(("raster", page))
    return content


def _emit_mixed_page_parts(doc_id: str, offset: int, ref: str,
                           page_index: int, parts: list[tuple],
                           out: dict[str, list]) -> None:
    """One MIXED page (PPTX slide) -> BLOCK rows preserving shape-tree
    order: text parts emit at ``(y1=ordinal, x1=0)``; each embedded
    picture OCRs through the shared core and its blocks re-emit at
    ``(y1=picture ordinal, x1=reading rank)`` — synthetic coordinates
    (the slide has no shared pixel space with its pictures), so the
    per-page sort key ``(y1, x1, block_index)`` interleaves the OCR'd
    text exactly at the picture's slot while keeping the picture's own
    reading order and per-block confidences."""
    bi = 0
    for part in parts:
        if part[0] == "text":
            _k, ordinal, text = part
            text = text.strip()
            if not text:
                continue
            out["doc_id"].append(doc_id)
            out["offset"].append(offset)
            out["media_ref"].append(ref)
            out["page_index"].append(page_index)
            out["block_index"].append(bi)
            out["x1"].append(0)
            out["y1"].append(ordinal)
            out["x2"].append(max(1, len(text)))
            out["y2"].append(ordinal + 1)
            out["text"].append(text)
            out["conf"].append(1.0)
            out["page_width"].append(0)
            out["page_height"].append(0)
            bi += 1
            continue
        _k, ordinal, pages = part  # ("rasters", ordinal, gray pages)
        rank = 0
        for page in pages:
            tmp: dict[str, list] = {f.name: [] for f in BLOCK.fields}
            ocr_rendered_page(doc_id, offset, ref, 0, page, tmp)
            order = sorted(
                range(len(tmp["text"])),
                key=lambda k: (tmp["y1"][k], tmp["x1"][k],
                               tmp["block_index"][k]),
            )
            for k in order:
                out["doc_id"].append(doc_id)
                out["offset"].append(offset)
                out["media_ref"].append(ref)
                out["page_index"].append(page_index)
                out["block_index"].append(bi)
                out["x1"].append(rank)
                out["y1"].append(ordinal)
                out["x2"].append(rank + 1)
                out["y2"].append(ordinal + 1)
                out["text"].append(tmp["text"][k])
                out["conf"].append(tmp["conf"][k])
                out["page_width"].append(0)
                out["page_height"].append(0)
                bi += 1
                rank += 1


def _ocr_real_batches_fn(text_layer: bool = False):
    # keep the closure's __name__ descriptive: it is what
    # .explain("formatted") prints on the MapInPandas node
    def _ocr_real_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _ocr_real_frame(pdf, text_layer)

    return _ocr_real_batches


def _ocr_real_frame(pdf: pd.DataFrame, text_layer: bool) -> pd.DataFrame:
    out: dict[str, list] = {f.name: [] for f in BLOCK.fields}
    for doc_id, offset, ref, kind, lo, hi, sliced, data in zip(
        pdf["doc_id"], pdf["offset"], pdf["media_ref"],
        pdf["media_kind"], pdf["page_lo"], pdf["page_hi"],
        pdf["sliced"], pdf["data"]
    ):
        if kind == MEDIA_KIND_ERROR:
            continue
        raw = bytes(data)
        # Decode inside the try (a decode failure drops the bucket
        # ATOMICALLY — no partial emission), emission outside it (an
        # OCR/kernel failure propagates LOUDLY; swallowing it after
        # some pages' rows were appended would leave a silently
        # part-extracted document).
        blocks = hybrid = pages = paged_text = paged_mixed = office = None
        try:
            # mode="L": the OCR kernels are grayscale — native-gray
            # PDF pages stay 2-D end-to-end (no RGB round trip),
            # color content converts with PIL's exact convert("L")
            # luma AFTER resampling (pdfcodec.rgb_to_gray)
            if kind == "html":
                # DOM tier: innermost blocks, link-density boilerplate
                # drop — plus embedded data-URI images (the saved-page
                # shape) OCR'd in place between their surrounding
                # blocks (round 5). Text-only documents keep the flat
                # block emission (byte-identical to the pre-r5 path).
                hp = htmltext.html_parts(htmltext.decode_html(raw))
                if all(p[0] == "text" for p in hp):
                    blocks = [
                        htmltext.ContentBlock(p[1], p[2], 0.0) for p in hp
                    ]
                else:
                    office = _office_content(hp)
            elif kind == "docx":
                # office tier: the INTERLEAVED part walk — paragraphs
                # in document order PLUS embedded pictures
                # (w:drawing/a:blip, VML imagedata) decoded through the
                # real raster codecs and OCR'd IN PLACE, so a scanned
                # page pasted into a DOCX extracts between its
                # surrounding paragraphs (headers/footers live in other
                # zip members and never emit — the office boilerplate
                # drop)
                office = _office_content(docxtext.document_parts(raw))
            elif kind == "odt":
                # OpenDocument sibling: content.xml text:p/text:h walk
                # + draw:image pictures, same interleave contract
                office = _office_content(odttext.document_parts(raw))
            elif kind == "rtf":
                # legacy desktop/email: strict RTF token stream, with
                # embedded \pict PNG/JPEG pictures interleaving like
                # the DOCX walk (round 5)
                office = _office_content(rtftext.document_parts(raw))
            elif kind == "txt":
                # plain-text tier: blank-line paragraph split, the
                # probe's final no-magic fallback
                blocks = plaintext.paragraph_blocks(
                    plaintext.decode_text(raw)
                )
            elif kind == "md":
                # markdown tier (probe-refined from txt): rendered-text
                # blocks — markup stripped, soft wraps join, code
                # fences verbatim (..mdtext module docstring)
                blocks = mdtext.markdown_blocks(
                    plaintext.decode_text(raw)
                )
            elif kind == "tex":
                # LaTeX tier (probe-refined from txt): the arXiv
                # shape — rendered text, math/cites dropped, captions
                # kept (..latextext module docstring)
                from .. import latextext

                blocks = latextext.latex_blocks(
                    plaintext.decode_text(raw)
                )
            elif kind == "eml":
                # e-mail tier (probe-refined from txt): decoded
                # Subject + supported body parts in part order, html
                # parts through the DOM walk, and raster ATTACHMENTS
                # OCR'd in place between the parts around them
                # (round 5 — the office interleave rule applied to
                # mail); mbox archives take the paged route below
                office = _office_content(
                    emltext.eml_parts(plaintext.decode_text(raw))
                )
            elif kind == "sub":
                # subtitle tier (probe-refined from txt): SRT/WebVTT
                # cue text — ids/timestamps/markup drop, rolling
                # duplicates collapse (..subtext module docstring)
                from .. import subtext

                blocks = subtext.subtitle_blocks(
                    plaintext.decode_text(raw)
                )
            elif kind == "csv":
                # tabular tier (probe-refined from txt): one block per
                # row, cells joined with a single space — the XLSX
                # sheet rule over bare DSV (..csvtext module docstring)
                blocks = csvtext.tabular_blocks(
                    plaintext.decode_text(raw)
                )
            elif kind == "xml":
                # XML tier: feeds/sitemaps/data exports — leaf text
                # under strip-lines-join; feed rich-content elements
                # through the DOM walk (..xmltext module docstring)
                blocks = xmltext.xml_blocks(raw)
            elif kind == "json":
                # JSON/JSONL tier (probe-refined from txt): string
                # VALUES only, document order (..jsontext docstring)
                blocks = jsontext.json_blocks(
                    plaintext.decode_text(raw)
                )
            elif kind in _PAGED_TEXT_CODECS:
                # paged office containers: sheets/chapters/messages are
                # pages, so buckets and slicing apply exactly like
                # raster PDFs — but pages extract as text blocks,
                # never rasters
                idx = (None if sliced
                       else list(range(int(lo), int(hi))))
                paged_text = _PAGED_TEXT_CODECS[kind][1](
                    raw, page_indices=idx,
                )
            elif kind in _PAGED_MIXED_CODECS:
                # paged MIXED containers (PPTX): slides are pages whose
                # parts interleave text paragraphs with embedded
                # pictures; pictures decode through the raster codecs
                # HERE (atomically with the part walk) and OCR below
                idx = (None if sliced
                       else list(range(int(lo), int(hi))))
                paged_mixed = [
                    _decode_mixed_parts(p)
                    for p in _PAGED_MIXED_CODECS[kind][1](
                        raw, page_indices=idx,
                    )
                ]
            elif kind == "pdf" and text_layer:
                # HYBRID dispatch: text-layer pages parse (no pixels
                # ever produced), scanned pages raster here + OCR below
                idx = (None if sliced
                       else list(range(int(lo), int(hi))))
                hybrid = pdftext.extract_hybrid_pages(
                    raw, page_indices=idx, mode="L",
                )
            elif kind == "pdf":
                # a sliced payload holds ONLY this bucket's pages
                # (local indices 0..hi-lo); global numbering still
                # comes from page_lo below
                idx = (None if sliced
                       else list(range(int(lo), int(hi))))
                pages = pdfcodec.decode_pdf(
                    raw, page_indices=idx, mode="L",
                )
            elif kind in _PAGED_CODECS:
                idx = (None if sliced
                       else list(range(int(lo), int(hi))))
                pages = _PAGED_CODECS[kind][1](
                    raw, mode="L", page_indices=idx,
                )
            elif formats.sniff_kind(raw) == "png":
                pages = [pdfcodec.rgb_to_gray(pngcodec.decode_png(raw))]
            elif formats.sniff_kind(raw) == "bmp":
                from .. import bmpcodec

                pages = [pdfcodec.rgb_to_gray(bmpcodec.decode_bmp(raw))]
            else:
                pages = [pdfcodec.rgb_to_gray(jpegcodec.decode_jpeg(raw))]
        except Exception:
            # residual corruption past the probe: entropy-level only
            # (JPEG entropy bits carry no checksum; a PDF image
            # stream body can be broken behind a valid structure).
            # Degrade to zero OCR blocks for this bucket — the
            # empty-page-passthrough contract — rather than failing
            # the job; everything structurally detectable already
            # quarantined with a triage row at probe time.
            continue
        if blocks is not None:
            emit_text_blocks(doc_id, int(offset), ref, int(lo),
                             blocks, 0, 0, out)
        elif office is not None:
            # content ordinal AS page_index: the assembler's global
            # sort key (offset, page_index, y1, x1, block_index) then
            # interleaves each picture's OCR blocks (real in-page
            # geometry, internal reading order intact) exactly between
            # the paragraphs around it. For text-only documents this
            # is sort-equivalent to the old single-page ordinal-y1
            # emission — identical span output.
            for i, (okind, item) in enumerate(office):
                if okind == "text":
                    emit_text_blocks(
                        doc_id, int(offset), ref, i,
                        [plaintext.TextParagraph(0, item)], 0, 0, out,
                    )
                else:
                    ocr_rendered_page(
                        doc_id, int(offset), ref, i, item, out,
                    )
        elif paged_text is not None:
            for i, page_blocks in enumerate(paged_text):
                emit_text_blocks(doc_id, int(offset), ref, int(lo) + i,
                                 page_blocks, 0, 0, out)
        elif paged_mixed is not None:
            for i, page_parts in enumerate(paged_mixed):
                _emit_mixed_page_parts(doc_id, int(offset), ref,
                                       int(lo) + i, page_parts, out)
        elif hybrid is not None:
            for i, (pkind, payload, pw, ph) in enumerate(hybrid):
                if pkind == "text":
                    emit_text_blocks(
                        doc_id, int(offset), ref, int(lo) + i,
                        payload, pw, ph, out,
                    )
                else:
                    ocr_rendered_page(
                        doc_id, int(offset), ref, int(lo) + i,
                        payload, out,
                    )
        else:
            for i, page in enumerate(pages):
                ocr_rendered_page(
                    doc_id, int(offset), ref, int(lo) + i, page, out
                )
    res = pd.DataFrame(out)
    for c in _INT_BLOCK_COLS:
        res[c] = res[c].astype("int32")
    res["conf"] = res["conf"].astype("float64")
    return res


def real_page_buckets(
    documents: DataFrame,
    media: DataFrame,
    bucket_pages: int | None = DEFAULT_BUCKET_PAGES,
    broadcast_spans: bool | None = None,
    spans: DataFrame | None = None,
    slice_payloads: bool = True,
    text_layer: bool = True,
) -> DataFrame:
    """Stage 1: spans ⋈ payloads -> validated page-bucket rows.

    The join shape mirrors :func:`..operators.extract.decode_pages` (the
    narrow span-ref side broadcasts under the same leaf-stats auto mode;
    payload bytes never move for the join), and a missing-payload
    anti-join surfaces dangling ``media_ref``s as quarantine rows.

    ``spans``: optional pre-exploded frame (pass
    :func:`..operators.extract.shared_exploded_spans` output so the
    documents table is scanned once across this join, the anti-join, and
    span assembly — the flagship's round-3 single-scan shape).

    ``slice_payloads`` (default on): multi-bucket PDFs are re-cut at
    probe time into per-bucket sub-PDFs (:class:`..pdfcodec._Slicer` —
    only the bucket's own page/content/image objects, stream bytes
    verbatim), so the bucket shuffle moves ~size·K/pages bytes per row
    instead of ⌈pages/K⌉ full-payload copies. Decode equality with the
    unsliced path is test-pinned; False restores full-payload rows.
    """
    if spans is None:
        spans = exploded_spans(documents)
    if broadcast_spans is None:
        broadcast_spans = _span_refs_fit_broadcast(documents)
    span_refs = (
        spans.filter(F.col("kind") != "text")
        .select("doc_id", "offset", "media_ref")
    )
    build = F.broadcast(span_refs) if broadcast_spans else span_refs
    media_spans = build.join(media.select("media_ref", "data"), "media_ref")
    buckets = media_spans.mapInPandas(
        _bucket_batches_fn(bucket_pages, slice_payloads, text_layer),
        schema=REAL_BUCKET,
    )
    missing = span_refs.join(
        media.select("media_ref"), "media_ref", "left_anti"
    ).select(
        "doc_id", "offset", "media_ref",
        F.lit(MEDIA_KIND_ERROR).alias("media_kind"),
        F.lit(-1).cast("int").alias("bucket_index"),
        F.lit(-1).cast("int").alias("page_lo"),
        F.lit(-1).cast("int").alias("page_hi"),
        F.lit("missing media payload").alias("error"),
        F.lit(False).alias("sliced"),
        F.lit(None).cast("binary").alias("data"),
    )
    return buckets.unionByName(missing)


def real_media_errors(buckets: DataFrame) -> DataFrame:
    """Quarantine table for the real-codec path (probe-time failures +
    missing payloads); same triage contract as ``media_errors``."""
    return buckets.filter(F.col("media_kind") == MEDIA_KIND_ERROR).select(
        "doc_id", "offset", "media_ref", "error"
    )


def ocr_real_blocks(
    buckets: DataFrame, num_partitions: int | None = None,
    text_layer: bool = True,
) -> DataFrame:
    """Stage 2: bucket rows -> OCR block rows, behind the explicit
    bucket-key repartition (see module docstring item 2).

    ``text_layer`` (default on) enables the per-page HYBRID dispatch for
    PDFs: pages with a text layer are parsed directly
    (:func:`..pdftext.extract_hybrid_pages` — no rasterization, no
    detect/recognize), scanned pages take the raster+OCR path. Must match
    the flag the bucket stage was probed with — a text PDF probed with
    ``text_layer=False`` quarantines there and never reaches this stage.
    """
    if num_partitions is None:
        num_partitions = 3 * buckets.sparkSession.sparkContext.defaultParallelism
    buckets = buckets.filter(F.col("media_kind") != MEDIA_KIND_ERROR)
    buckets = buckets.repartition(
        num_partitions, "doc_id", "offset", "bucket_index"
    )
    return buckets.mapInPandas(_ocr_real_batches_fn(text_layer), schema=BLOCK)


def extract_real_documents(
    documents: DataFrame,
    media: DataFrame,
    bucket_pages: int | None = DEFAULT_BUCKET_PAGES,
    num_partitions: int | None = None,
    broadcast_spans: bool | None = None,
    share_spans: "bool | str" = True,
    slice_payloads: bool = True,
    text_layer: bool = True,
) -> DataFrame:
    """End-to-end OCR extraction over REAL-codec media payloads.

    Same input/output contract as ``extract_documents`` (documents with
    interleaved spans + a media table -> documents_out with the
    extracted span arrays in document-global reading order), but the
    media column holds real scanned-PDF/PNG/JPEG bytes instead of
    synthetic containers. See the module docstring for the plan shape
    and its scale trade-offs.

    ``share_spans`` mirrors the flagship's single-scan shape: one lazily
    ``localCheckpoint``-ed explode of the documents table serves the
    bucket join, the missing-payload anti-join, and span assembly
    (instead of three full scans). Same executor-loss caveat as
    :func:`..operators.extract.extract_documents` — pass False on
    clusters with preemptible executors to trade re-scans for plain
    lineage recompute, or ``"replicated"`` to keep the single-scan plan
    on a replicated, recomputable ``MEMORY_AND_DISK_2`` persist.
    """
    spans = (
        shared_exploded_spans(documents,
                              replicated=share_spans == "replicated")
        if share_spans else None
    )
    buckets = real_page_buckets(
        documents, media, bucket_pages, broadcast_spans, spans=spans,
        slice_payloads=slice_payloads, text_layer=text_layer,
    )
    blocks = ocr_real_blocks(buckets, num_partitions, text_layer=text_layer)
    return assemble_spans(documents, blocks, spans=spans)
