"""Property-based tests (SURVEY.md §5 item 5), pure single-node — no
Spark session needed.

* reading order is a deterministic total order, invariant under input
  permutation when (y1, x1) are distinct;
* strip count is monotone non-decreasing in the original box height;
* strip y-ranges always cover the crop top-to-bottom within bounds;
* the glyph codec round-trips any alphabet string at any bounded
  downscale the preprocess step can produce.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_platform_spark import kernels, raster
from ocr_platform_spark.oracle import Block, reading_order

_coord = st.integers(min_value=0, max_value=2000)


@st.composite
def _blocks(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    pts = draw(
        st.lists(
            st.tuples(_coord, _coord), min_size=n, max_size=n, unique=True
        )
    )
    return tuple(
        Block(
            block_id=f"0-{i}",
            box=(x, y, x + 10, y + 10),
            score=1.0,
            text=f"t{i}",
            conf=1.0,
        )
        for i, (x, y) in enumerate(pts)
    )


@given(_blocks(), st.randoms())
@settings(max_examples=100, deadline=None)
def test_reading_order_total_and_permutation_invariant(blocks, rnd):
    ordered = reading_order(blocks)
    # total deterministic order: sorted by (y1, x1) for distinct corners
    keys = [(b.box[1], b.box[0]) for b in ordered]
    assert keys == sorted(keys)
    # permutation invariance when (y1, x1) pairs are unique
    if len({(b.box[1], b.box[0]) for b in blocks}) == len(blocks):
        shuffled = list(blocks)
        rnd.shuffle(shuffled)
        assert [
            (b.box[1], b.box[0]) for b in reading_order(tuple(shuffled))
        ] == keys


@given(
    st.integers(min_value=57, max_value=600),
    st.integers(min_value=8, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_strip_invariants_original_height_regime(orig_h, crop_h):
    """In the original-height regime (> 56 px): the emitted strip count
    never exceeds the nominal banker's-rounded count ``round(h/32)``
    (strips mapping to < 8 crop px are dropped, ``vietocr_engine.py:86``),
    and every emitted strip is >= 8 px unless it is the whole-image
    fallback. Monotonicity in h holds only for the nominal count — the
    post-drop count can shrink when the crop is much smaller than the
    original box (each strip's crop window shrinks below 8 px)."""
    img = np.zeros((crop_h, 20), dtype=np.uint8)
    strips = kernels.split_tall_crop_into_strips(img, orig_h)
    nominal = max(1, round(orig_h / kernels.LINE_STRIP_HEIGHT))
    assert 1 <= len(strips) <= nominal
    if len(strips) == 1 and strips[0].shape[0] == crop_h:
        return  # whole-image fallback
    for s in strips:
        assert s.shape[0] >= 8


@given(
    st.integers(min_value=8, max_value=300),
    st.integers(min_value=57, max_value=600),
)
@settings(max_examples=200, deadline=None)
def test_strips_within_bounds_and_ordered(crop_h, orig_h):
    img = np.arange(crop_h * 4, dtype=np.uint8).reshape(crop_h, 4)
    strips = kernels.split_tall_crop_into_strips(img, orig_h)
    assert len(strips) >= 1
    for s in strips:
        assert 1 <= s.shape[0] <= crop_h
        assert s.shape[1] == 4


@given(
    st.text(alphabet=kernels.ALPHABET, min_size=1, max_size=12),
    st.floats(min_value=0.60, max_value=1.0),
)
@settings(max_examples=60, deadline=None)
def test_glyph_roundtrip_any_text_any_preprocess_scale(text, scale):
    if not text.strip(" "):
        return  # pure-whitespace rows decode as empty by design
    row = kernels.glyph_row(text)
    if row.size == 0:
        return
    img = np.tile(row, (20, 1))
    w = max(1, int(row.size * scale))
    small = raster.area_resize(img, w, 20)
    decoded, _clean = kernels.decode_row(small[10])
    assert decoded == text


@settings(max_examples=100, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, seed):
    """encode_png -> decode_png is the identity for every HxWx3 uint8
    array (the stdlib real-codec seam, ocr_platform_spark.pngcodec)."""
    from ocr_platform_spark import pngcodec

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = pngcodec.decode_png(pngcodec.encode_png(arr))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
    ftype=st.integers(0, 4),
)
def test_png_filter_inversion_property(h, w, seed, ftype):
    """decode_png inverts every scanline filter type on arbitrary pixel
    data (forward filter applied by an independent reference impl)."""
    import struct
    import zlib

    from ocr_platform_spark import pngcodec
    from tests.test_real_codecs import _forward_filter

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = (
        pngcodec.SIGNATURE
        + pngcodec._chunk(b"IHDR", ihdr)
        + pngcodec._chunk(
            b"IDAT", zlib.compress(_forward_filter(arr.reshape(h, w * 3), ftype))
        )
        + pngcodec._chunk(b"IEND", b"")
    )
    assert (pngcodec.decode_png(raw) == arr).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    subsampling=st.sampled_from(["444", "420"]),
    restart=st.integers(0, 3),
)
def test_jpeg_roundtrip_property(h, w, seed, subsampling, restart):
    """encode_jpeg -> decode_jpeg round-trips every HxWx3 uint8 array
    within the all-ones-quantization error budget (coefficient rounding
    is +-0.5 through an orthonormal IDCT; chroma adds subsample loss on
    the 420 arm) for any geometry / subsampling / restart interval."""
    from ocr_platform_spark import jpegcodec

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = jpegcodec.decode_jpeg(
        jpegcodec.encode_jpeg(
            arr, subsampling=subsampling, restart_interval=restart
        )
    )
    assert out.shape == arr.shape
    if subsampling == "444":
        err = np.abs(out.astype(int) - arr.astype(int))
        assert err.max() <= 6 and err.mean() <= 2.0
    # 420 on random noise is legitimately lossy (chroma decimation); the
    # exactness pin for 420 lives in test_jpeg_420_constant_color_exact
