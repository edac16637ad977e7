"""Unit layer pinning the stand-in kernels + exact reference semantics
(SURVEY.md §5 item 1): strip arithmetic, clamp, resize ratios, codec
round-trips, detector geometry."""

import numpy as np
import pytest

from ocr_platform_spark import kernels, raster
from ocr_platform_spark.formats import Band, PageDesc, decode_media, encode_image, encode_pdf, page_count
from ocr_platform_spark.kernels import (
    decode_row,
    detect_text_boxes,
    glyph_row,
    predict,
    predict_batch,
    split_tall_crop_into_strips,
    text_px_width,
)


# --- glyph codec -------------------------------------------------------------


@pytest.mark.parametrize("text", ["a", "ocr", "scan data", "box-1", "mo0d", "z. ,"])
def test_glyph_roundtrip_scale1(text):
    row = glyph_row(text)
    assert row.size == text_px_width(text)
    decoded, clean = decode_row(row)
    assert decoded == text
    assert clean


@pytest.mark.parametrize("scale", [0.60, 0.684, 0.75, 0.9])
def test_glyph_roundtrip_downscaled(scale):
    """Decoder is scale-free down to the worst preprocess ratio (1754->1200)."""
    text = "scan page"
    row = glyph_row(text)
    img = np.tile(row, (40, 1))
    small = raster.area_resize(img, int(row.size * scale), 40)
    decoded, clean = decode_row(small[20])
    assert decoded == text and clean


def test_decode_blank_row():
    assert decode_row(np.full(100, 255, dtype=np.uint8)) == ("", False)


# --- strip split: exact port of vietocr_engine.py:63-100 ---------------------


def test_short_crop_no_split():
    img = np.zeros((56, 40), dtype=np.uint8)
    assert len(split_tall_crop_into_strips(img)) == 1


def test_tall_crop_height_based_split():
    # h=57 > 56: strips at y=0,28,56... last strip (57-56=1px <8) dropped
    img = np.arange(57 * 4, dtype=np.uint8).reshape(57, 4)
    strips = split_tall_crop_into_strips(img)
    assert [s.shape[0] for s in strips] == [32, 29]
    assert np.array_equal(strips[1], img[28:57])


def test_original_height_banker_rounding():
    # round(80/32)=round(2.5)=2 (banker's) — strip count uses Python round
    img = np.zeros((55, 10), dtype=np.uint8)  # crop scaled below threshold
    strips = split_tall_crop_into_strips(img, original_height_px=80)
    assert len(strips) == 2
    # round(112/32)=round(3.5)=4
    strips = split_tall_crop_into_strips(img, original_height_px=112)
    assert len(strips) == 4


def test_original_height_last_strip_absorbs_remainder():
    img = np.zeros((115, 10), dtype=np.uint8)
    strips = split_tall_crop_into_strips(img, original_height_px=115)
    # num=round(115/32)=4, step=28: orig ranges [0,32][28,60][56,88][84,115]
    assert len(strips) == 4
    assert strips[-1].shape[0] == 115 - int(84 * 115 / 115)


def test_original_height_small_strips_dropped():
    # orig 64 -> 2 strips; crop h=8: y1=int(0*8/64)=0,y2=int(32*8/64)=4 <8 drop;
    # second: y1=int(28*8/64)=3, y2=8, 5px <8 drop -> fallback [img]
    img = np.zeros((8, 10), dtype=np.uint8)
    strips = split_tall_crop_into_strips(img, original_height_px=64)
    assert len(strips) == 1 and strips[0].shape == (8, 10)


# --- crop clamp: recognize.py:9-13 -------------------------------------------


def test_crop_clamp_semantics():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert raster.crop(img, (-5, -3, 4, 2)).shape == (2, 4)
    # degenerate -> min 1px
    c = raster.crop(img, (3, 3, 3, 3))
    assert c.shape == (1, 1) and c[0, 0] == 33
    # beyond right edge: PIL pads with black
    c = raster.crop(img, (9, 9, 12, 11))
    assert c.shape == (2, 3) and c[0, 0] == 99 and c[0, 2] == 0 and c[1, 1] == 0


# --- preprocess ratio math: preprocess.py:11-20 -------------------------------


def test_preprocess_resize_ratio():
    img = np.zeros((1754, 1240), dtype=np.uint8)
    out = raster.preprocess_image(img)
    scale = 1754 / 1200
    assert out.shape == (int(1754 / scale), int(1240 / scale))


def test_preprocess_noop_at_or_below_max_side():
    img = np.zeros((1200, 900), dtype=np.uint8)
    assert raster.preprocess_image(img) is img


# --- detector -----------------------------------------------------------------


def _page_with(bands, w=1000, h=800):
    return raster.render_page(PageDesc(width=w, height=h, bands=bands), 1.0)


def test_detect_single_band_box():
    img = _page_with([Band(x=50, y=100, lines=["ocr"], line_h=40, gap=8)])
    boxes = detect_text_boxes(img)
    assert len(boxes) == 1
    x1, y1, x2, y2 = boxes[0]
    assert (x1, y1) == (50, 100)
    assert x2 == 50 + text_px_width("ocr")
    assert y2 == 140


def test_detect_multiline_band_merges_to_tall_box():
    img = _page_with([Band(x=50, y=100, lines=["ab", "cd", "ex"], line_h=34, gap=8)])
    boxes = detect_text_boxes(img)
    assert len(boxes) == 1
    _, y1, _, y2 = boxes[0]
    assert y1 == 100 and y2 == 100 + 3 * 34 + 2 * 8
    assert y2 - y1 > kernels.MAX_SINGLE_LINE_HEIGHT


def test_detect_separate_bands_and_tiebreak_geometry():
    img = _page_with(
        [
            Band(x=50, y=100, lines=["ab"], line_h=40, gap=8),
            Band(x=700, y=100, lines=["cd"], line_h=40, gap=8),
            Band(x=50, y=300, lines=["ex"], line_h=40, gap=8),
        ]
    )
    boxes = detect_text_boxes(img)
    assert len(boxes) == 3
    ys = sorted(b[1] for b in boxes)
    assert ys == [100, 100, 300]


def test_detect_empty_page():
    img = np.full((400, 400), 255, dtype=np.uint8)
    assert detect_text_boxes(img) == []


def test_detect_valid_filter_and_int_cast():
    """Output boxes are int corners (detect.py:119 astype(int))."""
    img = _page_with([Band(x=0, y=0, lines=["go"], line_h=30, gap=8)])
    boxes = detect_text_boxes(img)
    assert all(isinstance(v, int) for b in boxes for v in b)
    assert boxes[0][0] == 0 and boxes[0][1] == 0  # page-edge band


# --- recognize ----------------------------------------------------------------


def test_predict_reads_band_crop():
    img = _page_with([Band(x=50, y=100, lines=["page"], line_h=40, gap=8)])
    (box,) = detect_text_boxes(img)
    crop = raster.crop(img, box)
    text, conf = predict(crop)
    assert text == "page" and conf == 0.98


def test_predict_batch_multiline_newline_join_min_conf():
    img = _page_with([Band(x=50, y=100, lines=["ab", "cd"], line_h=34, gap=8)])
    (box,) = detect_text_boxes(img)
    crop = raster.crop(img, box)
    oh = box[3] - box[1]
    [(text, conf)] = predict_batch([crop], [oh])
    assert "\n" in text
    assert text.split("\n")[0] == "ab"
    assert conf <= 0.98


# --- container formats ---------------------------------------------------------


def test_media_container_roundtrip():
    pages = [
        PageDesc(width=595, height=842, bands=[Band(x=10, y=20, lines=["ab"], line_h=16, gap=4)]),
        PageDesc(width=400, height=500, bands=[]),
    ]
    raw = encode_pdf(pages)
    kind, decoded = decode_media(raw)
    assert kind == "pdf" and len(decoded) == 2
    assert decoded[0].bands[0].lines == ["ab"]
    assert page_count(raw) == 2
    kind, decoded = decode_media(encode_image(pages[0]))
    assert kind == "image" and len(decoded) == 1


def test_prepview_crop_out_of_page_boxes_match_eager():
    """Regression: boxes fully right of / below the preprocessed page used
    to reach LazyCropView with a negative inner width and crash the
    resampler; the contract is the eager path's black-padded crop."""
    import numpy as np

    from ocr_platform_spark import raster

    img = np.full((1400, 1500), 255, dtype=np.uint8)
    img[100:130, 200:400] = 0
    pv = raster.PrepView(img)
    full = raster.area_resize(img, pv.width, pv.height)
    for box in [
        (1125, 10, 1160, 30),      # fully right of the 1120-wide prep page
        (1122, 1202, 1129, 1209),  # fully below-right
        (-5, -5, 10, 10),          # negative corner
        (0, 1300, 20, 1320),       # fully below
        (1100, 10, 1160, 30),      # straddling the right edge
    ]:
        got = np.asarray(pv.crop(box))
        want = raster.crop(full, box)
        assert got.shape == want.shape, box
        assert np.array_equal(got, want), box
    # ndarray indexing fidelity: out-of-range raises instead of
    # fabricating black rows
    view = pv.crop((10, 10, 40, 40))
    with pytest.raises(IndexError):
        view[999]
