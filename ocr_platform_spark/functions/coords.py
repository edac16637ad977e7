"""Coordinate-space conversion: detect-image pixels (150 dpi) ↔ PDF points
(72 dpi) — the M15 operator (SURVEY.md §2.3).

The reference converts detect coordinates between the 150-dpi raster space
and PDF user space in the viewer:

* image px → PDF pt: multiply by ``72/150`` — no rounding (used as a CSS
  scale factor), ``pdf-viewer.component.ts:473`` (``IMAGE_TO_PDF_SCALE``);
* screen/pt → image px: multiply by ``150/72`` then ``Math.round`` —
  JS half-up, i.e. ``floor(x + 0.5)`` — ``pdf-viewer.component.ts:101,
  480-485`` (``screenToImageBox``).

Both constants are embedded as the exact same float64 literal on the
Spark and DuckDB sides (Python ``repr``), so conversions are
bit-identical cross-engine. Round-trip ``pt_to_px(px_to_pt(px)) == px``
holds for every non-negative integer px (pinned by tests/test_coords.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IMAGE_TO_PDF_SCALE = 72.0 / 150.0  # pdf-viewer.component.ts:473
PDF_TO_IMAGE = 150.0 / 72.0        # pdf-viewer.component.ts:101


def px_to_pt(col: Column) -> Column:
    """150-dpi image pixels → PDF points (float, FE applies no rounding)."""
    return col.cast("double") * F.lit(IMAGE_TO_PDF_SCALE)


def pt_to_px(col: Column) -> Column:
    """PDF points → 150-dpi image pixels with ``Math.round`` semantics
    (half-up = floor(x + 0.5); JS rounds -0.5 to 0, identical to this
    formula)."""
    return F.floor(col.cast("double") * F.lit(PDF_TO_IMAGE) + F.lit(0.5)).cast(
        "long"
    )


def sql_px_to_pt(expr: str) -> str:
    return f"(CAST({expr} AS DOUBLE) * {IMAGE_TO_PDF_SCALE!r})"


def sql_pt_to_px(expr: str) -> str:
    return (
        f"CAST(floor(CAST({expr} AS DOUBLE) * {PDF_TO_IMAGE!r} + 0.5) AS BIGINT)"
    )
