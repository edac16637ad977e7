"""CMYK / YCCK JPEG (the print-origin class: Photoshop, Distiller,
press-ready PDFs) through the stdlib codec, and ``/DeviceCMYK`` images
through the PDF rasterizer.

Ground truth comes from three independent directions:

* hand-computed ``cmyk_to_rgb`` values replaying PIL Convert.c's
  ``MULDIV255`` integer rounding;
* round trips through our own encoder at both Adobe transforms
  (0 = CMYK stored, 2 = YCCK) with the all-ones quant tables;
* Java ImageIO ``readRaster`` — the documented escape hatch for CMYK
  JPEGs (``ImageIO.read`` refuses them) — decoding OUR streams' raw
  stored samples, proving the files are conventional Adobe CMYK JPEGs
  to a foreign parser, not a private dialect.

Reference behavior being re-expressed: the reference OCR service opens
every JPEG via PIL ``Image.open(...).convert("RGB")``
(``libs/ocr_core/.../ocr_tasks.py:54-55``), which for Adobe CMYK files
means the "CMYK;I" inverted unpack followed by Convert.c cmyk2rgb —
exactly the math pinned here.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_platform_spark import jpegcodec, pdfcodec

from test_pdfcodec import build_pdf, stream_obj


def _rng(seed=7):
    return np.random.default_rng(seed)


def _ref_rgb(cmyk: np.ndarray) -> np.ndarray:
    return jpegcodec.cmyk_to_rgb(cmyk[..., 0], cmyk[..., 1],
                                 cmyk[..., 2], cmyk[..., 3])


# --------------------------------------------------------------------------
# cmyk_to_rgb: PIL Convert.c integer parity
# --------------------------------------------------------------------------


def test_cmyk_to_rgb_hand_values():
    # nk = 255-55 = 200; MULDIV255(200,200): t=40128 -> (40128 + 156)>>8
    # = 157 -> r = 43; m=100: t=20128 -> (20128+78)>>8 = 78 -> 122;
    # y=50: t=10128 -> (10128+39)>>8 = 39 -> 161
    px = _ref_rgb(np.array([[[200, 100, 50, 55]]], np.uint8))
    np.testing.assert_array_equal(px[0, 0], [43, 122, 161])
    # k=255 is solid black regardless of CMY; zero ink is paper white
    assert _ref_rgb(np.array([[[0, 128, 255, 255]]], np.uint8)).tolist() \
        == [[[0, 0, 0]]]
    assert _ref_rgb(np.array([[[0, 0, 0, 0]]], np.uint8)).tolist() \
        == [[[255, 255, 255]]]
    # full single ink, no black: the complementary channel drops to 0
    np.testing.assert_array_equal(
        _ref_rgb(np.array([[[255, 0, 0, 0]]], np.uint8))[0, 0],
        [0, 255, 255])


def test_cmyk_to_rgb_muldiv255_rounding_sweep():
    # exhaustive single-channel sweep vs the float formula: the integer
    # MULDIV255 is round-to-nearest of ink*nk/255, never off by > 1,
    # and matches the exact +128 fixed-point definition everywhere
    c = np.arange(256, dtype=np.uint8).reshape(1, -1)
    z = np.zeros_like(c)
    for k in (0, 1, 77, 200, 254, 255):
        kk = np.full_like(c, k)
        got = jpegcodec.cmyk_to_rgb(c, z, z, kk)[0, :, 0].astype(int)
        nk = 255 - k
        t = c.astype(np.int64)[0] * nk + 128
        exact = nk - ((t + (t >> 8)) >> 8)
        np.testing.assert_array_equal(got, np.clip(exact, 0, 255))


# --------------------------------------------------------------------------
# encoder/decoder round trips
# --------------------------------------------------------------------------


def test_cmyk_transform0_roundtrip_and_constant_exact():
    cmyk = _rng(3).integers(0, 256, (24, 32, 4), dtype=np.uint8)
    out = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(cmyk, cmyk_transform=0))
    assert np.abs(out.astype(int) - _ref_rgb(cmyk).astype(int)).max() <= 2
    const = np.full((16, 16, 4), 77, np.uint8)
    np.testing.assert_array_equal(
        jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(const, cmyk_transform=0)),
        _ref_rgb(const))


def test_ycck_roundtrip_444_and_restarts():
    cmyk = _rng(5).integers(0, 256, (24, 32, 4), dtype=np.uint8)
    ref = _ref_rgb(cmyk)
    plain = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(cmyk))
    assert np.abs(plain.astype(int) - ref.astype(int)).max() <= 2
    rst = jpegcodec.decode_jpeg(
        jpegcodec.encode_jpeg(cmyk, restart_interval=2))
    assert np.abs(rst.astype(int) - ref.astype(int)).max() <= 2


def test_ycck_420_roundtrip_smooth_content():
    # 4:2:0 subsampling is lossy on noise by construction; smooth inks
    # pin the multi-block YCCK MCU layout (Y/K 2x2, Cb/Cr 1x1 = the
    # T.81 sum(Hi*Vi) == 10 ceiling) within resample rounding
    yy, xx = np.mgrid[0:32, 0:48]
    cmyk = (np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256,
                      xx % 200], axis=-1) // 4 * 4).astype(np.uint8)
    out = jpegcodec.decode_jpeg(
        jpegcodec.encode_jpeg(cmyk, subsampling="420"))
    assert np.abs(out.astype(int) - _ref_rgb(cmyk).astype(int)).max() <= 4


def test_cmyk_transform0_rejects_subsampling():
    cmyk = np.zeros((8, 8, 4), np.uint8)
    with pytest.raises(ValueError, match="4:4:4"):
        jpegcodec.encode_jpeg(cmyk, cmyk_transform=0, subsampling="420")
    with pytest.raises(ValueError, match="cmyk_transform"):
        jpegcodec.encode_jpeg(cmyk, cmyk_transform=1)


# --------------------------------------------------------------------------
# Adobe APP14 semantics
# --------------------------------------------------------------------------


def _strip_app14(raw: bytes) -> bytes:
    assert raw[2:4] == b"\xff\xee"
    seglen = int.from_bytes(raw[4:6], "big")
    return raw[:2] + raw[4 + seglen:]


def test_four_component_without_adobe_marker_still_inverts():
    # stripping the APP14 marker must NOT flip the inversion convention:
    # PIL's JpegImagePlugin sets rawmode "CMYK;I" unconditionally for
    # 4-layer frames ("assume adobe conventions"), so the marker-free
    # file decodes identically to its transform-0 twin — anything else
    # would make the stdlib fallback a color negative of the PIL path
    cmyk = np.full((16, 16, 4), 0, np.uint8)
    cmyk[:, :, 0] = 60  # cyan ink only
    raw = jpegcodec.encode_jpeg(cmyk, cmyk_transform=0)
    marked = jpegcodec.decode_jpeg(raw)
    np.testing.assert_array_equal(marked, _ref_rgb(cmyk))
    bare = jpegcodec.decode_jpeg(_strip_app14(raw))
    np.testing.assert_array_equal(bare, marked)


def test_adobe_transform1_on_four_components_raises():
    raw = bytearray(jpegcodec.encode_jpeg(
        np.zeros((8, 8, 4), np.uint8), cmyk_transform=0))
    assert raw[2:4] == b"\xff\xee"
    raw[4 + 13] = 1  # APP14 transform byte: YCbCr is 3-component-only
    with pytest.raises(ValueError, match="transform 1"):
        jpegcodec.decode_jpeg(bytes(raw))


# --------------------------------------------------------------------------
# Java ImageIO readRaster: foreign-parser ground truth
# --------------------------------------------------------------------------


def _read_raster(path) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline() == b"PR\n"
        w, h, bands = map(int, f.readline().split())
        assert f.readline() == b"255\n"
        data = f.read(w * h * bands)
    return np.frombuffer(data, np.uint8).reshape(h, w, bands)


def test_imageio_raster_reads_our_cmyk_stream(tifftool, tmp_path):
    # transform 0, constant 8-aligned blocks: the stored samples are
    # recovered bit-exactly by a foreign decoder -> our stream is a
    # conventional Adobe CMYK JPEG, not a private dialect
    cmyk = np.zeros((16, 24, 4), np.uint8)
    cmyk[:8] = [200, 100, 50, 55]
    cmyk[8:] = [0, 255, 30, 0]
    p = tmp_path / "c.jpg"
    p.write_bytes(jpegcodec.encode_jpeg(cmyk, cmyk_transform=0))
    tifftool("decodejpegraster", p, tmp_path / "c.raw")
    got = _read_raster(tmp_path / "c.raw")
    assert got.shape == (16, 24, 4)
    np.testing.assert_array_equal(got, 255 - cmyk)


def test_imageio_raster_reads_our_ycck_stream(tifftool, tmp_path):
    # transform 2 (YCCK): ImageIO's readRaster skips color conversion,
    # returning the stored Y/Cb/Cr/K planes; a constant image makes the
    # DCT round trip exact, so stored == our forward transform rounded
    cmyk = np.full((16, 16, 4), 0, np.uint8)
    cmyk[:, :, 0], cmyk[:, :, 3] = 120, 33
    p = tmp_path / "y.jpg"
    p.write_bytes(jpegcodec.encode_jpeg(cmyk, cmyk_transform=2))
    tifftool("decodejpegraster", p, tmp_path / "y.raw")
    got = _read_raster(tmp_path / "y.raw").astype(int)
    assert got.shape == (16, 16, 4)
    y = 0.299 * 120.0
    cb, cr = 128.0 - 0.168736 * 120.0, 128.0 + 0.5 * 120.0
    expect = [round(y), round(cb), round(cr), 255 - 33]
    assert np.abs(got - np.array(expect)).max() <= 1
    # and the full decode of the same stream matches our conversion math
    ours = jpegcodec.decode_jpeg(p.read_bytes())
    np.testing.assert_array_equal(ours, _ref_rgb(cmyk))


def test_imageio_raster_gradient_within_rounding(tifftool, tmp_path):
    yy, xx = np.mgrid[0:24, 0:32]
    cmyk = (np.stack([yy * 5 % 256, xx * 3 % 256, (yy + xx) * 2 % 256,
                      yy % 128], axis=-1) // 2 * 2).astype(np.uint8)
    p = tmp_path / "g.jpg"
    p.write_bytes(jpegcodec.encode_jpeg(cmyk, cmyk_transform=0))
    tifftool("decodejpegraster", p, tmp_path / "g.raw")
    got = _read_raster(tmp_path / "g.raw").astype(int)
    assert np.abs(got - (255 - cmyk.astype(int))).max() <= 2


# --------------------------------------------------------------------------
# /DeviceCMYK through the PDF rasterizer
# --------------------------------------------------------------------------


def _cmyk_pdf(img_obj: bytes, w: int, h: int) -> bytes:
    mw, mh = w * 72 / 150, h * 72 / 150
    return build_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           f"/MediaBox [0 0 {mw} {mh}] >>".encode(),
        3: b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", f"q {mw} 0 0 {mh} 0 0 cm /Im0 Do Q".encode()),
        5: img_obj,
    })


def test_pdf_dct_cmyk_page_matches_jpeg_decoder():
    cmyk = _rng(9).integers(0, 256, (32, 48, 4), dtype=np.uint8)
    jpg = jpegcodec.encode_jpeg(cmyk)
    raw = _cmyk_pdf(stream_obj(
        "/Subtype /Image /Width 48 /Height 32 /ColorSpace /DeviceCMYK "
        "/BitsPerComponent 8 /Filter /DCTDecode", jpg), 48, 32)
    pages = pdfcodec.decode_pdf(raw)
    np.testing.assert_array_equal(pages[0], jpegcodec.decode_jpeg(jpg))


def test_pdf_raw_cmyk_flate_ink_convention():
    import zlib
    cmyk = _rng(13).integers(0, 256, (20, 30, 4), dtype=np.uint8)
    raw = _cmyk_pdf(stream_obj(
        "/Subtype /Image /Width 30 /Height 20 /ColorSpace /DeviceCMYK "
        "/BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(cmyk.tobytes())), 30, 20)
    pages = pdfcodec.decode_pdf(raw)
    np.testing.assert_array_equal(pages[0], _ref_rgb(cmyk))


def test_pdf_iccbased_n4_resolves_to_cmyk():
    import zlib
    cmyk = np.full((16, 16, 4), 99, np.uint8)
    img = stream_obj(
        "/Subtype /Image /Width 16 /Height 16 /ColorSpace [/ICCBased 6 0 R] "
        "/BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(cmyk.tobytes()))
    raw = _cmyk_pdf(img, 16, 16)
    # splice the ICC stream dict in as object 6
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           b"/MediaBox [0 0 7.68 7.68] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", b"q 7.68 0 0 7.68 0 0 cm /Im0 Do Q"),
        5: img,
        6: stream_obj("/N 4", b"\x00" * 8),
    }
    pages = pdfcodec.decode_pdf(build_pdf(objs))
    np.testing.assert_array_equal(pages[0], _ref_rgb(cmyk))
    del raw


def test_pdf_dct_cmyk_explicit_decode_quarantines():
    cmyk = np.zeros((8, 8, 4), np.uint8)
    jpg = jpegcodec.encode_jpeg(cmyk)
    raw = _cmyk_pdf(stream_obj(
        "/Subtype /Image /Width 8 /Height 8 /ColorSpace /DeviceCMYK "
        "/BitsPerComponent 8 /Filter /DCTDecode "
        "/Decode [1 0 1 0 1 0 1 0]", jpg), 8, 8)
    with pytest.raises(ValueError, match="Decode"):
        pdfcodec.decode_pdf(raw)


def test_cmyk_media_through_distributed_pipeline(spark):
    """Print-origin media end-to-end: image pages re-encoded as YCCK
    JPEGs and PDF pages as scanned PDFs whose images are Adobe CMYK DCT
    streams, driven through ``extract_real_documents`` — span-sequence
    EQUALITY with the synthetic flagship. Black ink rides the K channel
    (C=M=Y=0), so ``cmyk_to_rgb`` returns the gray raster exactly and
    the only loss is the all-ones-quant DCT round trip, which the
    recognizer's glyph threshold absorbs (same contract as the RGB-JPEG
    smoke pin in test_extract_real)."""
    from ocr_platform_spark import corpus, schemas
    from ocr_platform_spark.operators import extract, extract_real
    from tests.test_extract_real import _render_pages, _spans_by_doc

    def _to_cmyk(g: np.ndarray) -> np.ndarray:
        z = np.zeros_like(g)
        return np.stack([z, z, z, 255 - g], axis=-1)

    def cmyk_scanned_pdf(pages_gray) -> bytes:
        objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
        kids, nxt = [], 3
        for img in pages_gray:
            h, w = img.shape[:2]
            mw, mh = w * 72 / 150, h * 72 / 150
            pg, ct, im = nxt, nxt + 1, nxt + 2
            nxt += 3
            kids.append(f"{pg} 0 R")
            objs[pg] = (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {mw:.8f} {mh:.8f}] "
                f"/Resources << /XObject << /Im0 {im} 0 R >> >> "
                f"/Contents {ct} 0 R >>"
            ).encode()
            objs[ct] = stream_obj(
                "", f"q {mw:.8f} 0 0 {mh:.8f} 0 0 cm /Im0 Do Q".encode())
            objs[im] = stream_obj(
                f"/Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceCMYK /BitsPerComponent 8 "
                f"/Filter /DCTDecode",
                jpegcodec.encode_jpeg(_to_cmyk(img)))
        objs[2] = (f"<< /Type /Pages /Kids [{' '.join(kids)}] "
                   f"/Count {len(kids)} >>").encode()
        return build_pdf(objs)

    docs, media = corpus.generate(16, seed=77, max_pages=4)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    rows = []
    for ref, m in sorted(media.items()):
        kind, pages = _render_pages(m["data"])
        if kind == "image":
            payload = jpegcodec.encode_jpeg(_to_cmyk(pages[0]))
        else:
            payload = cmyk_scanned_pdf(pages)
        rows.append((ref, bytearray(payload)))
    real = spark.createDataFrame(rows, "media_ref string, data binary")
    expected = _spans_by_doc(extract.extract_documents(docs_df, synth))
    got = _spans_by_doc(
        extract_real.extract_real_documents(docs_df, real, bucket_pages=2))
    assert got == expected


def test_pdf_indexed_over_cmyk_quarantines():
    import zlib
    img = stream_obj(
        "/Subtype /Image /Width 8 /Height 8 "
        "/ColorSpace [/Indexed /DeviceCMYK 1 <00000000ffffffff>] "
        "/BitsPerComponent 1 /Filter /FlateDecode",
        zlib.compress(b"\x00" * 8))
    raw = _cmyk_pdf(img, 8, 8)
    with pytest.raises(ValueError, match="Indexed over DeviceCMYK"):
        pdfcodec.decode_pdf(raw)
