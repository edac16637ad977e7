"""M15 coordinate conversion: FE-exact 72/150 constants + Math.round.

Round-trip identity and JS half-up rounding are pinned against a pure
Python reimplementation, then the operator is applied to real detect-box
coordinates from the pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocr_platform_spark import corpus, schemas
from ocr_platform_spark.functions import coords
from ocr_platform_spark.operators import extract


def _py_px_to_pt(px: float) -> float:
    return px * (72.0 / 150.0)


def _py_pt_to_px(pt: float) -> int:
    return int(math.floor(pt * (150.0 / 72.0) + 0.5))  # JS Math.round


def test_roundtrip_identity_over_pixel_range(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("px"))
    out = df.select(
        "px",
        coords.pt_to_px(coords.px_to_pt(F.col("px"))).alias("rt"),
    )
    assert out.filter(F.col("px") != F.col("rt")).count() == 0


def test_half_up_rounding_matches_js_math_round(spark):
    # pt values whose px image lands exactly on .5 exercise the JS
    # "round half toward +inf" rule: Math.round(1.5) = 2, Math.round(2.5) = 3
    pts = [0.24, 0.72, 1.2, 1.68, 5.0, 123.456]
    df = spark.createDataFrame([(p,) for p in pts], "pt double")
    got = {
        r["pt"]: r["px"]
        for r in df.select("pt", coords.pt_to_px(F.col("pt")).alias("px")).collect()
    }
    for p in pts:
        assert got[p] == _py_pt_to_px(p), p


def test_detect_boxes_convert_and_roundtrip(spark):
    docs, media = corpus.generate(10, seed=7, max_pages=4)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(
        [{"media_ref": k, **v} for k, v in sorted(media.items())],
        schema=schemas.MEDIA,
    )
    boxes = extract.detect_boxes_table(extract.decode_pages(docs_df, media_df))
    conv = boxes.select(
        "x1",
        coords.px_to_pt(F.col("x1")).alias("x1_pt"),
        coords.pt_to_px(coords.px_to_pt(F.col("x1"))).alias("x1_rt"),
    )
    rows = conv.collect()
    assert rows  # detector found boxes
    for r in rows:
        assert r["x1_pt"] == _py_px_to_pt(r["x1"])
        assert r["x1_rt"] == r["x1"]
