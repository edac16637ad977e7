"""Rasterization + image ops (pure numpy; PIL/cv2 are unavailable here).

Images are ``numpy.ndarray`` of ``uint8``, shape ``(H, W)``, grayscale,
white=255 / ink=0 — the stand-in for the reference's RGB ``PIL.Image``
(``.convert("RGB")`` callers never use color, only geometry + intensity).

Three reference semantics are reproduced *byte-exactly* where they are pure
arithmetic, and by a documented deterministic stand-in where they are a codec:

* Page render at dpi=150 — ``page.get_pixmap(dpi=150)`` in
  ``apps/worker/app/tasks/ocr_tasks.py:47``; here: pixel dims =
  ``round(page_units * unit_scale)`` with ``unit_scale = 150/72`` for SPDF1
  point-space pages, ``1.0`` for SIMG1 pixel-space pages.
* Preprocess resize — exact ratio math of
  ``libs/ocr_core/ocr_core/pipeline/preprocess.py:11-20``:
  ``scale = max(w, h) / max_side``; only if ``scale > 1``:
  ``new_w = int(w / scale); new_h = int(h / scale)``.  The LANCZOS resampler
  itself is replaced by a deterministic separable area (box) filter — the
  stand-in interpolation kernel (cv2 ``INTER_AREA`` analog, cf. the detect-stage
  resize in ``pipeline/detect.py:16-23``).
* Crop clamp — ``pipeline/recognize.py:9-13``: ``x1=max(0,x1); y1=max(0,y1);
  x2=max(x1+1,x2); y2=max(y1+1,y2)`` then a PIL-style crop (out-of-bounds area,
  if any, pads with black, matching ``PIL.Image.crop``).

Performance note (100 TB posture): the recognize stage only ever *reads small
crops* of the preprocessed page, so :class:`PrepView` evaluates the area filter
lazily on crop windows — O(crop area) instead of O(page area) per page, ~100x
less resampling work on a typical A4 page.  Window evaluation is bit-identical
to full-image evaluation: per-output-pixel sums are ``np.add.reduceat`` segment
sums over exactly the same source samples in the same order.
"""

from __future__ import annotations

import numpy as np

from .formats import PDF_POINT_DPI, RENDER_DPI, PageDesc
from .kernels import glyph_row

WHITE = 255

PDF_UNIT_SCALE = RENDER_DPI / PDF_POINT_DPI  # 150/72 — ocr_tasks.py:47
OCR_MAX_SIDE = 1200  # env OCR_MAX_SIDE default — preprocess.py:8


def render_page(page: PageDesc, unit_scale: float) -> np.ndarray:
    """Render one page description to a grayscale raster.

    Analog of ``_raw_to_pages`` (``ocr_tasks.py:34-55``): SPDF1 pages pass
    ``unit_scale = 150/72`` (PDF points -> 150-dpi pixels), SIMG1 pages pass
    ``1.0``.  Band text is painted with the run-length glyph code; every pixel
    row of a given text line is identical (vertical uniformity), so horizontal
    strip cuts and vertical box-filter resizing both preserve decodability.
    """
    w_px = int(round(page.width * unit_scale))
    h_px = int(round(page.height * unit_scale))
    img = np.full((h_px, w_px), WHITE, dtype=np.uint8)
    for band in page.bands:
        x0 = int(round(band.x * unit_scale))
        y0 = int(round(band.y * unit_scale))
        line_h = max(1, int(round(band.line_h * unit_scale)))
        gap = int(round(band.gap * unit_scale))
        for i, text in enumerate(band.lines):
            row = glyph_row(text)
            if row.size == 0:
                continue
            r0 = y0 + i * (line_h + gap)
            r1 = min(r0 + line_h, h_px)
            c1 = min(x0 + row.size, w_px)
            if r0 >= h_px or x0 >= w_px or r1 <= r0 or c1 <= x0:
                continue
            img[r0:r1, x0:c1] = row[: c1 - x0]
    return img


def _resize_axis0(arr: np.ndarray, dst: int, lo: int, hi: int) -> np.ndarray:
    """Area-resample ``arr`` (S, C) along axis 0 from S to ``dst`` rows, but
    evaluate only output rows ``[lo, hi)``.

    Each output row j integrates source rows over ``[j*r, (j+1)*r)`` with
    ``r = S/dst``: full interior source rows via ``np.add.reduceat`` (same
    segment elements and summation order regardless of the window -> window
    evaluation is bit-identical to full evaluation), plus fractional edge rows.
    """
    src = arr.shape[0]
    if src == dst:
        return np.asarray(arr[lo:hi], dtype=np.float64)
    ratio = src / dst
    j = np.arange(lo, hi, dtype=np.float64)
    starts = j * ratio
    ends = np.minimum((j + 1.0) * ratio, float(src))
    l = np.ceil(starts).astype(np.int64)
    r = np.floor(ends).astype(np.int64)
    # only the source slab under the window is ever touched
    slab_lo = max(0, int(np.floor(starts[0])) - 1)
    slab_hi = min(src, int(np.ceil(ends[-1])) + 1)
    arrf = np.asarray(arr[slab_lo:slab_hi], dtype=np.float64)
    lb = l - slab_lo
    # interior full-row sums: reduceat segments [l_j, r_eff_j); r is capped at
    # src-1 and the capped row's full weight moves into the right-edge term,
    # so an exact end==src window stays in bounds
    r_eff = np.minimum(r, src - 1)
    rb = r_eff - slab_lo
    n = hi - lo
    bounds = np.empty(2 * n, dtype=np.int64)
    bounds[0::2] = np.clip(lb, 0, arrf.shape[0] - 1)
    bounds[1::2] = np.maximum(np.clip(rb, 0, arrf.shape[0] - 1), bounds[0::2])
    seg = np.add.reduceat(arrf, bounds, axis=0)[0::2]
    core = np.where((r_eff > l)[:, None], seg, 0.0)
    # left fractional row: weight = l - start over row l-1
    wl = (l - starts)[:, None]
    left = arrf[np.clip(lb - 1, 0, arrf.shape[0] - 1)] * wl
    # right fractional row: weight = end - r_eff over row r_eff (includes the
    # full weight of row src-1 when r == src)
    wr = (ends - r_eff)[:, None]
    right = arrf[np.clip(rb, 0, arrf.shape[0] - 1)] * np.where(wr > 0, wr, 0.0)
    return (left + core + right) / ratio


def area_resize_window(
    img: np.ndarray,
    new_w: int,
    new_h: int,
    x1: int,
    y1: int,
    x2: int,
    y2: int,
) -> np.ndarray:
    """The window ``[y1:y2, x1:x2]`` of ``area_resize(img, new_w, new_h)``
    without materializing the full resized image (bit-identical values)."""
    out = _resize_axis0(img, new_h, y1, y2)
    out = _resize_axis0(np.ascontiguousarray(out.T), new_w, x1, x2).T
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def area_resize(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic separable area (box-average) resize, uint8 -> uint8.

    Stand-in for PIL ``Image.Resampling.LANCZOS`` (``preprocess.py:19``) /
    cv2 ``INTER_AREA`` (``detect.py:23``): identical call structure and ratio
    math, dependency-free kernel.
    """
    return area_resize_window(img, new_w, new_h, 0, 0, new_w, new_h)


def preprocess_image(img: np.ndarray, max_side: int = OCR_MAX_SIDE) -> np.ndarray:
    """Exact ratio semantics of ``preprocess_image`` (``preprocess.py:11-20``).

    ``scale = max(w, h) / max_side``; resize only when ``scale > 1`` to
    ``(int(w / scale), int(h / scale))``.
    """
    h, w = img.shape[:2]
    scale = max(w, h) / max_side
    if scale > 1:
        new_w = int(w / scale)
        new_h = int(h / scale)
        return area_resize(img, new_w, new_h)
    return img


class LazyCropView:
    """A crop of the (virtually) preprocessed image, materialized **per
    pixel row** on demand.

    The recognizer only ever reads one row per strip
    (``kernels.predict`` reads ``crop[h // 2]``), so materializing the
    whole resized crop wastes ~30x the resample work; this view exposes
    ``shape`` / ``size`` / row indexing / row slicing (what the strip
    splitter and recognizer use) and evaluates the area filter only for
    rows actually read. Row values are bit-identical to the eager crop:
    each row is the matching one-row window of ``area_resize_window``,
    whose window evaluation is bit-identical to full evaluation (module
    invariant above); out-of-bounds padding is the same black PIL pad.
    """

    __slots__ = ("_img", "_w", "_h", "_x1", "_y1", "_x2", "_y2",
                 "_pad_r", "_pad_b", "shape")

    def __init__(self, img, w, h, x1, y1, x2, y2, pad_r, pad_b):
        self._img = img          # source raster (pre-preprocess)
        self._w, self._h = w, h  # virtual preprocessed dims
        self._x1, self._y1 = x1, y1  # clamped crop rect in prep coords
        self._x2, self._y2 = x2, y2
        self._pad_r, self._pad_b = pad_r, pad_b
        self.shape = (y2 - y1 + pad_b, x2 - x1 + pad_r)

    @property
    def size(self) -> int:
        return self.shape[0] * self.shape[1]

    def _row(self, i: int) -> np.ndarray:
        rows_in = self._y2 - self._y1
        if i < 0:
            i += self.shape[0]
        if i < 0 or i >= self.shape[0]:
            # match ndarray indexing: out-of-range must raise, not
            # fabricate black rows a caller bug would silently decode
            raise IndexError(
                f"row {i} out of bounds for crop of height {self.shape[0]}"
            )
        if i >= rows_in or self._x2 <= self._x1:
            # bottom padding rows, or a fully out-of-page crop whose inner
            # window is empty (every pixel is PIL-style black padding)
            return np.zeros(self.shape[1], dtype=np.uint8)
        out = area_resize_window(
            self._img, self._w, self._h,
            self._x1, self._y1 + i, self._x2, self._y1 + i + 1,
        )[0]
        if self._pad_r:
            out = np.concatenate(
                [out, np.zeros(self._pad_r, dtype=np.uint8)]
            )
        return out

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(self.shape[0])
            if step != 1:
                raise IndexError("LazyCropView supports contiguous row slices")
            rows_in = self._y2 - self._y1
            ny1 = self._y1 + min(start, rows_in)
            ny2 = self._y1 + min(stop, rows_in)
            pad_b = max(0, stop - max(start, rows_in))
            return LazyCropView(
                self._img, self._w, self._h,
                self._x1, ny1, self._x2, max(ny2, ny1), self._pad_r, pad_b,
            )
        return self._row(int(key))

    def __array__(self, dtype=None, copy=None):
        """Full materialization fallback (tests / debugging)."""
        rows_in = self._y2 - self._y1
        if rows_in > 0 and self._x2 > self._x1:
            body = area_resize_window(
                self._img, self._w, self._h,
                self._x1, self._y1, self._x2, self._y2,
            )
        else:
            body = np.zeros((max(rows_in, 0), max(self._x2 - self._x1, 0)),
                            dtype=np.uint8)
        out = np.pad(body, ((0, self._pad_b), (0, self._pad_r)),
                     constant_values=0)
        return out.astype(dtype) if dtype is not None else out


class PrepView:
    """Lazy preprocessed page: same pixels as :func:`preprocess_image`, but the
    resample is evaluated only under :meth:`crop` windows — and, for the
    resized path, only under the crop *rows* the recognizer actually reads
    (:class:`LazyCropView`).

    The recognize stage (``orchestrator.py:141-156``) resizes the page then
    crops a handful of small boxes out of it — evaluating the filter only
    inside those boxes gives identical bytes at a fraction of the cost.
    """

    def __init__(self, img: np.ndarray, max_side: int = OCR_MAX_SIDE):
        self._img = img
        h, w = img.shape[:2]
        scale = max(w, h) / max_side
        if scale > 1:
            self.width = int(w / scale)
            self.height = int(h / scale)
            self._resized = True
        else:
            self.width = w
            self.height = h
            self._resized = False

    @property
    def size(self) -> tuple[int, int]:
        """(w, h), PIL ``Image.size`` convention (``orchestrator.py:142``)."""
        return self.width, self.height

    def crop(self, box: tuple[int, int, int, int]) -> np.ndarray:
        """Clamped crop of the (virtually) preprocessed image — byte-exact
        ``_crop`` semantics (``recognize.py:9-13``) incl. PIL black padding."""
        x1, y1, x2, y2 = box
        x1 = max(0, x1)
        y1 = max(0, y1)
        x2 = max(x1 + 1, x2)
        y2 = max(y1 + 1, y2)
        w, h = self.width, self.height
        ix2, iy2 = min(x2, w), min(y2, h)
        pad_b = max(0, y2 - max(y1, h))
        pad_r = max(0, x2 - max(x1, w))
        if not self._resized:
            out = self._img[y1:iy2, x1:ix2]
            if pad_b or pad_r:
                out = np.pad(out, ((0, pad_b), (0, pad_r)), constant_values=0)
            return out
        # resized path: per-row lazy evaluation (recognizer reads ~1 row
        # per strip; materializing the full crop is ~30x wasted resampling).
        # The inner rect must clamp on BOTH axes: a box lying fully right
        # of the page (x1 >= w) otherwise reaches LazyCropView with
        # x1 > ix2 (negative inner width) and crashes the resampler where
        # the eager path returns the black-padded crop (an edited-boxes
        # input can place boxes anywhere on a >max_side page).
        nx1, ny1 = min(x1, w), min(y1, h)
        return LazyCropView(
            self._img, w, h, nx1, ny1, max(ix2, nx1), max(iy2, ny1),
            pad_r, pad_b
        )


def crop(img: np.ndarray, box: tuple[int, int, int, int]) -> np.ndarray:
    """Clamped crop, byte-exact to ``_crop`` (``pipeline/recognize.py:9-13``),
    including PIL's pad-with-black behavior for out-of-bounds edges."""
    x1, y1, x2, y2 = box
    x1 = max(0, x1)
    y1 = max(0, y1)
    x2 = max(x1 + 1, x2)
    y2 = max(y1 + 1, y2)
    h, w = img.shape[:2]
    out = img[y1 : min(y2, h), x1 : min(x2, w)]
    pad_b = max(0, y2 - max(y1, h))
    pad_r = max(0, x2 - max(x1, w))
    if pad_b or pad_r:
        out = np.pad(out, ((0, pad_b), (0, pad_r)), constant_values=0)
    return out
