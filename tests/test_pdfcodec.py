"""pdfcodec: pure-stdlib scanned-PDF rasterizer, pinned against hand-built
PDFs (classic xref assembled byte-by-byte here — no PDF library exists in
this sandbox, which is exactly why the codec does).

The load-bearing pins:

* identity-scale geometry — a page whose MediaBox is ``dims * 72/150``
  renders at dpi=150 to a canvas exactly the embedded image's size, so
  the decoded canvas must be BYTE-EQUAL to the source samples (Flate) or
  to ``jpegcodec.decode_jpeg`` of the identical bytes (DCT);
* PDF y-up vs raster y-down placement, sub-rect margins, negative-scale
  flips;
* the ValueError contract on everything outside the scanned subset
  (vector text, path painting, CCITT, xref streams, Form XObjects) — a
  vector page must never silently render blank.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from ocr_platform_spark import jpegcodec, pdfcodec
from ocr_platform_spark.raster import area_resize


def _rng(seed=7):
    return np.random.default_rng(seed)


def build_pdf(objects: dict[int, bytes], root: int = 1,
              header: bytes = b"%PDF-1.4\n") -> bytes:
    """Assemble a classic-xref PDF from ``{obj_num: body_bytes}``."""
    out = bytearray(header)
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    n = max(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n} /Root {root} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF").encode()
    return bytes(out)


def stream_obj(dict_body: str, data: bytes) -> bytes:
    return (f"<< {dict_body} /Length {len(data)} >>\nstream\n".encode()
            + data + b"\nendstream")


def rgb_image_obj(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return stream_obj(
        f"/Subtype /Image /Width {w} /Height {h} /ColorSpace /DeviceRGB "
        f"/BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(arr.tobytes()),
    )


def scanned_pdf(images: list[np.ndarray], mediaboxes: list[str],
                cms: list[str] | None = None) -> bytes:
    """One page per image; content = q <cm> /Im0 Do Q."""
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    kids, next_num = [], 3
    for i, (img, mb) in enumerate(zip(images, mediaboxes)):
        pg, ct, im = next_num, next_num + 1, next_num + 2
        next_num += 3
        kids.append(f"{pg} 0 R")
        cm = (cms[i] if cms else None) or _fill_cm(mb)
        objs[pg] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [{mb}] "
            f"/Resources << /XObject << /Im0 {im} 0 R >> >> "
            f"/Contents {ct} 0 R >>"
        ).encode()
        objs[ct] = stream_obj("", f"q {cm} cm /Im0 Do Q".encode())
        objs[im] = rgb_image_obj(img)
    objs[2] = (f"<< /Type /Pages /Kids [{' '.join(kids)}] "
               f"/Count {len(kids)} >>").encode()
    return build_pdf(objs)


def _fill_cm(mb: str) -> str:
    x0, y0, x1, y1 = (float(v) for v in mb.split())
    return f"{x1 - x0} 0 0 {y1 - y0} {x0} {y0}"


# --- geometry / sample-exactness -------------------------------------------


def test_single_page_flate_rgb_byte_exact():
    # MediaBox 48x24 pt at 150 dpi -> 100x50 px == image dims: no resample
    src = _rng().integers(0, 256, (50, 100, 3), dtype=np.uint8)
    pages = pdfcodec.decode_pdf(scanned_pdf([src], ["0 0 48 24"]))
    assert len(pages) == 1
    np.testing.assert_array_equal(pages[0], src)


def test_dct_page_matches_jpeg_decoder_byte_exact():
    src = _rng(11).integers(0, 256, (48, 96, 3), dtype=np.uint8)
    jpg = jpegcodec.encode_jpeg(src, subsampling="420")
    img_obj = stream_obj(
        "/Subtype /Image /Width 96 /Height 48 /ColorSpace /DeviceRGB "
        "/BitsPerComponent 8 /Filter /DCTDecode", jpg)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           b"/MediaBox [0 0 46.08 23.04] >>",  # inherited: 96x48 @150dpi
        3: b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", b"q 46.08 0 0 23.04 0 0 cm /Im0 Do Q"),
        5: img_obj,
    }
    pages = pdfcodec.decode_pdf(build_pdf(objs))
    np.testing.assert_array_equal(pages[0], jpegcodec.decode_jpeg(jpg))


def test_multipage_sizes_resample_and_page_count():
    imgs = [_rng(1).integers(0, 256, (30, 40, 3), dtype=np.uint8),
            _rng(2).integers(0, 256, (20, 20, 3), dtype=np.uint8)]
    raw = scanned_pdf(imgs, ["0 0 100 200", "0 0 50 50"])
    assert pdfcodec.page_count(raw) == 2
    pages = pdfcodec.decode_pdf(raw)
    # canvas = round(mediabox * 150/72); image area-resampled to fill it
    assert pages[0].shape == (417, 208, 3)
    assert pages[1].shape == (104, 104, 3)
    expect0 = np.stack([area_resize(imgs[0][:, :, c], 208, 417)
                        for c in range(3)], axis=-1)
    np.testing.assert_array_equal(pages[0], expect0)


def test_subrect_placement_margins_and_y_flip():
    # 100x100 canvas; image at PDF bottom-left -> raster BOTTOM-left
    src = np.full((25, 25, 3), 7, np.uint8)
    raw = scanned_pdf([src], ["0 0 48 48"], cms=["12 0 0 12 4.8 4.8"])
    page = pdfcodec.decode_pdf(raw)[0]
    assert page.shape == (100, 100, 3)
    np.testing.assert_array_equal(page[65:90, 10:35], src)
    assert (page[:65] == 255).all() and (page[90:] == 255).all()
    assert (page[:, :10] == 255).all() and (page[:, 35:] == 255).all()


def test_negative_scales_flip():
    src = np.zeros((10, 10, 3), np.uint8)
    src[0, :, 0] = 200   # top row red-ish
    src[:, 0, 1] = 100   # left col green-ish
    mb = "0 0 4.8 4.8"   # 10x10 canvas
    up = pdfcodec.decode_pdf(scanned_pdf([src], [mb]))[0]
    np.testing.assert_array_equal(up, src)
    # d < 0 with f at top edge: vertical flip
    vflip = pdfcodec.decode_pdf(
        scanned_pdf([src], [mb], cms=["4.8 0 0 -4.8 0 4.8"]))[0]
    np.testing.assert_array_equal(vflip, src[::-1])
    # a < 0 with e at right edge: horizontal flip
    hflip = pdfcodec.decode_pdf(
        scanned_pdf([src], [mb], cms=["-4.8 0 0 4.8 4.8 0"]))[0]
    np.testing.assert_array_equal(hflip, src[:, ::-1])


def test_gray8_and_bitonal_decode_inversion():
    g = _rng(3).integers(0, 256, (50, 100), dtype=np.uint8)
    gray_obj = stream_obj(
        "/Subtype /Image /Width 100 /Height 50 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(g.tobytes()))
    bits = _rng(4).integers(0, 2, (50, 100), dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    bit_obj = stream_obj(
        "/Subtype /Image /Width 100 /Height 50 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Decode [1 0] /Filter /FlateDecode",
        zlib.compress(packed))
    for obj, expect in [
        (gray_obj, np.stack([g] * 3, axis=-1)),
        (bit_obj, np.stack([(1 - bits) * 255] * 3, axis=-1).astype(np.uint8)),
    ]:
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 48 24] "
               b"/Resources << /XObject << /Im0 5 0 R >> >> "
               b"/Contents 4 0 R >>",
            4: stream_obj("", b"q 48 0 0 24 0 0 cm /Im0 Do Q"),
            5: obj,
        }
        np.testing.assert_array_equal(
            pdfcodec.decode_pdf(build_pdf(objs))[0], expect)


def test_flate_png_predictor_up():
    src = _rng(5).integers(0, 256, (20, 30, 3), dtype=np.uint8)
    # PNG predictor stream: each row prefixed by filter byte 2 (Up)
    filtered = bytearray()
    prev = np.zeros((30, 3), np.uint16)
    for y in range(20):
        filtered.append(2)
        filtered += ((src[y].astype(np.uint16) - prev) % 256).astype(
            np.uint8).tobytes()
        prev = src[y].astype(np.uint16)
    img_obj = stream_obj(
        "/Subtype /Image /Width 30 /Height 20 /ColorSpace /DeviceRGB "
        "/BitsPerComponent 8 /Filter /FlateDecode "
        "/DecodeParms << /Predictor 12 /Colors 3 /Columns 30 >>",
        zlib.compress(bytes(filtered)))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 14.4 9.6] "
           b"/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", b"q 14.4 0 0 9.6 0 0 cm /Im0 Do Q"),
        5: img_obj,
    }
    np.testing.assert_array_equal(pdfcodec.decode_pdf(build_pdf(objs))[0], src)


def test_incremental_update_prev_chain_newest_wins():
    old = np.full((50, 100, 3), 10, np.uint8)
    new = np.full((50, 100, 3), 200, np.uint8)
    base = scanned_pdf([old], ["0 0 48 24"])
    # image object is the highest-numbered one in scanned_pdf's layout
    img_num = 5
    m = __import__("re").search(rb"startxref\s+(\d+)", base[-64:])
    prev_xref = int(m.group(1))
    upd = bytearray(base)
    new_off = len(upd)
    upd += f"{img_num} 0 obj\n".encode() + rgb_image_obj(new) + b"\nendobj\n"
    xref_pos = len(upd)
    upd += (f"xref\n{img_num} 1\n{new_off:010d} 00001 n \n"
            f"trailer\n<< /Size 6 /Root 1 0 R /Prev {prev_xref} >>\n"
            f"startxref\n{xref_pos}\n%%EOF").encode()
    np.testing.assert_array_equal(
        pdfcodec.decode_pdf(bytes(upd))[0], new)
    # the un-updated base still decodes to the old image
    np.testing.assert_array_equal(pdfcodec.decode_pdf(base)[0], old)


def test_mode_L_exactly_rgb_to_gray_of_RGB_render():
    """mode="L" must be bit-exactly rgb_to_gray(mode="RGB") on every
    content class — native gray (2-D fast path), true-color RGB that gets
    RESAMPLED (conversion must happen after the resize on both paths),
    1-bit bitonal, and DCT."""
    rng = _rng(21)
    color = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (25, 50), dtype=np.uint8)
    bits = rng.integers(0, 2, (20, 20), dtype=np.uint8)
    jpg = jpegcodec.encode_jpeg(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    mk = []
    imgdefs = [
        ("/DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
         zlib.compress(color.tobytes()), 40, 30),
        ("/DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
         zlib.compress(gray.tobytes()), 50, 25),
        ("/DeviceGray /BitsPerComponent 1 /Decode [1 0] /Filter /FlateDecode",
         zlib.compress(np.packbits(bits, axis=1).tobytes()), 20, 20),
        ("/DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode", jpg, 16, 16),
    ]
    nxt = 3
    for cs, data, w, h in imgdefs:
        pg, ct, im = nxt, nxt + 1, nxt + 2
        nxt += 3
        mk.append(f"{pg} 0 R")
        # MediaBox 100x60 pt -> 208x125 canvas: every image RESAMPLES
        objs[pg] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 60] "
            f"/Resources << /XObject << /Im0 {im} 0 R >> >> "
            f"/Contents {ct} 0 R >>").encode()
        objs[ct] = stream_obj("", b"q 100 0 0 60 0 0 cm /Im0 Do Q")
        objs[im] = stream_obj(
            f"/Subtype /Image /Width {w} /Height {h} /ColorSpace {cs}", data)
    objs[2] = (f"<< /Type /Pages /Kids [{' '.join(mk)}] "
               f"/Count {len(mk)} >>").encode()
    raw = build_pdf(objs)
    rgb_pages = pdfcodec.decode_pdf(raw)
    l_pages = pdfcodec.decode_pdf(raw, mode="L")
    assert all(p.ndim == 2 for p in l_pages)
    for rgb, lum in zip(rgb_pages, l_pages):
        np.testing.assert_array_equal(lum, pdfcodec.rgb_to_gray(rgb))


def test_rgb_to_gray_pil_parity_formula():
    rng = _rng(22)
    rgb = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    r, g, b = (rgb[:, :, i].astype(np.uint32) for i in range(3))
    expect = ((r * 19595 + g * 38470 + b * 7471) >> 16).astype(np.uint8)
    np.testing.assert_array_equal(pdfcodec.rgb_to_gray(rgb), expect)
    # equal-channel fast path is exact (weights sum to 65536)
    gray = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    np.testing.assert_array_equal(
        pdfcodec.rgb_to_gray(np.stack([gray] * 3, axis=-1)), gray)


# --- the ValueError contract ------------------------------------------------


def _one_page(content: bytes, extra_objs: dict[int, bytes] | None = None,
              resources: bytes = b"<< >>") -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 48 24] "
           b"/Resources " + resources + b" /Contents 4 0 R >>",
        4: stream_obj("", content),
    }
    objs.update(extra_objs or {})
    return build_pdf(objs)


def test_vector_text_page_raises_not_blank():
    raw = _one_page(b"BT /F1 12 Tf 10 10 Td (hello) Tj ET")
    with pytest.raises(ValueError, match="unsupported"):
        pdfcodec.decode_pdf(raw)


def test_path_painting_raises():
    raw = _one_page(b"0 0 10 10 re f")
    with pytest.raises(ValueError, match="unsupported"):
        pdfcodec.decode_pdf(raw)


def test_ccitt_filter_raises():
    img = stream_obj(
        "/Subtype /Image /Width 8 /Height 8 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /CCITTFaxDecode", b"\x00" * 8)
    raw = _one_page(b"q 48 0 0 24 0 0 cm /Im0 Do Q", {5: img},
                    b"<< /XObject << /Im0 5 0 R >> >>")
    with pytest.raises(ValueError, match="filter"):
        pdfcodec.decode_pdf(raw)


def test_form_xobject_raises():
    form = stream_obj("/Subtype /Form /BBox [0 0 1 1]", b"")
    raw = _one_page(b"/Fm0 Do", {5: form},
                    b"<< /XObject << /Fm0 5 0 R >> >>")
    with pytest.raises(ValueError, match="Form"):
        pdfcodec.decode_pdf(raw)


def test_xref_stream_raises():
    # startxref pointing at an object header instead of a classic table
    body = (b"%PDF-1.5\n1 0 obj\n<< /Type /XRef >>\nstream\nendstream\n"
            b"endobj\nstartxref\n9\n%%EOF")
    with pytest.raises(ValueError, match="cross-reference stream"):
        pdfcodec.decode_pdf(body)


def test_rotated_placement_raises():
    src = np.zeros((4, 4, 3), np.uint8)
    raw = scanned_pdf([src], ["0 0 48 24"], cms=["0 12 -12 0 24 0"])
    with pytest.raises(ValueError, match="axis-aligned"):
        pdfcodec.decode_pdf(raw)


def test_fuzz_mutations_raise_only_valueerror():
    """The public-API exception contract under adversarial bytes: every
    single-byte mutation / truncation of a valid scanned PDF either still
    decodes or raises ValueError — never IndexError/KeyError/TypeError/
    AttributeError/RecursionError leaking from the parser (the quarantine
    path keys on ValueError; anything else would fail the Spark job)."""
    src = _rng(99).integers(0, 256, (20, 25, 3), dtype=np.uint8)
    base = bytearray(scanned_pdf([src, src], ["0 0 12 9.6", "0 0 12 9.6"]))
    rng = np.random.default_rng(1234)
    decoded = errored = 0
    for _ in range(400):
        raw = bytearray(base)
        pos = int(rng.integers(0, len(raw)))
        raw[pos] = int(rng.integers(0, 256))
        try:
            pages = pdfcodec.decode_pdf(bytes(raw))
            assert all(p.ndim == 3 for p in pages)
            decoded += 1
        except ValueError:
            errored += 1
    for cut in range(1, len(base), max(1, len(base) // 60)):
        try:
            pdfcodec.decode_pdf(bytes(base[:cut]))
        except ValueError:
            pass
    assert errored > 50  # mutations really do hit load-bearing bytes
    # same contract with a DCT image XObject: mutations can land inside
    # the embedded JPEG, whose own wrapper must hold (ValueError, never
    # ZeroDivisionError/struct.error through the PDF layer)
    jpg = jpegcodec.encode_jpeg(
        _rng(98).integers(0, 256, (16, 24, 3), dtype=np.uint8))
    dct_base = bytearray(_one_page(
        b"q 11.52 0 0 7.68 0 0 cm /Im0 Do Q",
        {5: stream_obj(
            "/Subtype /Image /Width 24 /Height 16 /ColorSpace /DeviceRGB "
            "/BitsPerComponent 8 /Filter /DCTDecode", jpg)},
        b"<< /XObject << /Im0 5 0 R >> >>"))
    # fixture sanity so the loop can't pass vacuously: the unmutated PDF
    # must decode and actually paint the JPEG (not render blank)
    base_page = pdfcodec.decode_pdf(bytes(dct_base))[0]
    # image at PDF origin = raster BOTTOM-left of the 100x50 canvas
    np.testing.assert_array_equal(
        base_page[34:50, :24], jpegcodec.decode_jpeg(jpg))
    for _ in range(200):
        raw = bytearray(dct_base)
        raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
        try:
            pdfcodec.decode_pdf(bytes(raw))
        except ValueError:
            pass
    # deep nesting must not leak RecursionError
    bomb = b"%PDF-1.4\n1 0 obj\n" + b"[" * 50000
    with pytest.raises(ValueError):
        pdfcodec.page_count(bomb + b"\nstartxref\n9\n%%EOF")
    # lying dimensions must refuse, not allocate
    huge = _one_page(
        b"q 48 0 0 24 0 0 cm /Im0 Do Q",
        {5: stream_obj(
            "/Subtype /Image /Width 999999 /Height 999999 "
            "/ColorSpace /DeviceGray /BitsPerComponent 8", b"")},
        b"<< /XObject << /Im0 5 0 R >> >>")
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        pdfcodec.decode_pdf(huge)


def test_not_a_pdf_and_truncation():
    with pytest.raises(ValueError, match="header"):
        pdfcodec.decode_pdf(b"GIF89a...")
    good = scanned_pdf(
        [np.zeros((5, 5, 3), np.uint8)], ["0 0 2.4 2.4"])
    with pytest.raises(ValueError):
        pdfcodec.decode_pdf(good[: len(good) // 2])


# --- page slicing -------------------------------------------------------------


def _mixed_pdf(n_rgb: int = 2) -> bytes:
    """Multi-page PDF mixing every supported image class (RGB-Flate,
    gray-8, bitonal /Decode [1 0], DCT) so slice tests cover each
    stream-copy path."""
    rng = _rng(77)
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    kids, nxt = [], 3
    pages_payloads = [
        ("/DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
         zlib.compress(rng.integers(0, 256, (30, 40, 3), np.uint8).tobytes()),
         40, 30)
        for _ in range(n_rgb)
    ] + [
        ("/DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
         zlib.compress(rng.integers(0, 256, (25, 50), np.uint8).tobytes()),
         50, 25),
        ("/DeviceGray /BitsPerComponent 1 /Decode [1 0] /Filter /FlateDecode",
         zlib.compress(np.packbits(
             rng.integers(0, 2, (20, 20), np.uint8), axis=1).tobytes()),
         20, 20),
        ("/DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
         jpegcodec.encode_jpeg(
             rng.integers(0, 256, (16, 16, 3), np.uint8)), 16, 16),
    ]
    for cs, data, w, h in pages_payloads:
        pg, ct, im = nxt, nxt + 1, nxt + 2
        nxt += 3
        kids.append(f"{pg} 0 R")
        objs[pg] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 60] "
            f"/Resources << /XObject << /Im0 {im} 0 R >> >> "
            f"/Contents {ct} 0 R >>").encode()
        objs[ct] = stream_obj("", b"q 100 0 0 60 0 0 cm /Im0 Do Q")
        objs[im] = stream_obj(
            f"/Subtype /Image /Width {w} /Height {h} /ColorSpace {cs}", data)
    objs[2] = (f"<< /Type /Pages /Kids [{' '.join(kids)}] "
               f"/Count {len(kids)} >>").encode()
    return build_pdf(objs)


def test_slice_pages_decode_equality_all_image_classes():
    """decode_pdf(slice_pages(raw, idx)) == decode_pdf(raw, idx) pixel-
    exactly, for every image class, both modes, arbitrary index order."""
    raw = _mixed_pdf()
    n = pdfcodec.page_count(raw)
    assert n == 5
    for idx in ([0], [2, 3], [4], list(range(n)), [3, 1, 0]):
        for mode in ("RGB", "L"):
            a = pdfcodec.decode_pdf(
                pdfcodec.slice_pages(raw, idx), mode=mode)
            b = pdfcodec.decode_pdf(raw, page_indices=idx, mode=mode)
            assert len(a) == len(b) == len(idx)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
    # a slice is itself a valid scanned PDF: probe + re-slice both work
    sl = pdfcodec.slice_pages(raw, [1, 4])
    assert pdfcodec.validate_scanned(sl)[0] == 2
    np.testing.assert_array_equal(
        pdfcodec.decode_pdf(pdfcodec.slice_pages(sl, [1]))[0],
        pdfcodec.decode_pdf(raw, page_indices=[4])[0])


def test_slice_pages_size_proportional():
    """The point of slicing: a one-bucket slice of an N-page document
    carries ~1/N of the bytes, not a full-payload copy."""
    rng = _rng(55)
    pages = [rng.integers(0, 256, (80, 60), np.uint8) for _ in range(12)]
    from tests.test_extract_real import gray_scanned_pdf

    raw = gray_scanned_pdf(pages)
    one = pdfcodec.slice_pages(raw, [7])
    assert len(one) < len(raw) / 6  # 1/12 of payload + fixed overhead
    # and the union of disjoint slices stays ~the original total
    total = sum(
        len(pdfcodec.slice_pages(raw, range(lo, min(12, lo + 4))))
        for lo in range(0, 12, 4)
    )
    assert total < len(raw) * 1.2


def test_slice_prunes_pages_level_shared_resources():
    """A Pages-level /Resources dict naming EVERY page's image must not
    defeat the size win: the slicer keeps only the XObject names the
    selected pages' content streams actually paint."""
    rng = _rng(56)
    imgs = [rng.integers(0, 256, (50, 40), np.uint8) for _ in range(3)]
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    xod = " ".join(f"/Im{i} {10 + i} 0 R" for i in range(3))
    objs[2] = (f"<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 "
               f"/MediaBox [0 0 19.2 24] "
               f"/Resources << /XObject << {xod} >> >> >>").encode()
    payloads = [zlib.compress(img.tobytes()) for img in imgs]
    for i in range(3):
        objs[3 + i] = (f"<< /Type /Page /Parent 2 0 R "
                       f"/Contents {6 + i} 0 R >>").encode()
        objs[6 + i] = stream_obj(
            "", f"q 19.2 0 0 24 0 0 cm /Im{i} Do Q".encode())
        objs[10 + i] = stream_obj(
            f"/Subtype /Image /Width 40 /Height 50 /ColorSpace /DeviceGray "
            f"/BitsPerComponent 8 /Filter /FlateDecode", payloads[i])
    raw = build_pdf(objs)
    sl = pdfcodec.slice_pages(raw, [1])
    np.testing.assert_array_equal(
        pdfcodec.decode_pdf(sl, mode="L")[0],
        pdfcodec.decode_pdf(raw, page_indices=[1], mode="L")[0])
    assert payloads[1] in sl
    assert payloads[0] not in sl and payloads[2] not in sl
    # inherited MediaBox materialized into the sliced page
    assert pdfcodec.validate_scanned(sl) == (1, 40, 50)


def test_slice_of_incremental_update_takes_newest_object():
    """Slicing resolves through the /Prev chain: the slice of an
    incrementally-updated document carries the NEWEST object bytes."""
    old = np.full((50, 100, 3), 10, np.uint8)
    new = np.full((50, 100, 3), 200, np.uint8)
    base = scanned_pdf([old], ["0 0 48 24"])
    img_num = 5
    m = __import__("re").search(rb"startxref\s+(\d+)", base[-64:])
    upd = bytearray(base)
    new_off = len(upd)
    upd += f"{img_num} 0 obj\n".encode() + rgb_image_obj(new) + b"\nendobj\n"
    xref_pos = len(upd)
    upd += (f"xref\n{img_num} 1\n{new_off:010d} 00001 n \n"
            f"trailer\n<< /Size 6 /Root 1 0 R /Prev {int(m.group(1))} >>\n"
            f"startxref\n{xref_pos}\n%%EOF").encode()
    sl = pdfcodec.slice_pages(bytes(upd), [0])
    np.testing.assert_array_equal(pdfcodec.decode_pdf(sl)[0], new)


def test_slice_pages_error_contract():
    raw = _mixed_pdf(n_rgb=1)
    with pytest.raises(ValueError, match="out of range"):
        pdfcodec.slice_pages(raw, [99])
    with pytest.raises(ValueError, match="zero pages"):
        pdfcodec.slice_pages(raw, [])
    with pytest.raises(ValueError, match="header"):
        pdfcodec.slice_pages(b"GIF89a...", [0])
    # adversarial bytes: same ValueError-only contract as decode_pdf
    rng = np.random.default_rng(4321)
    base = bytearray(raw)
    errored = 0
    for _ in range(250):
        mut = bytearray(base)
        mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
        try:
            sl = pdfcodec.slice_pages(bytes(mut), [0, 1])
            # a successful slice must itself decode or raise ValueError
            try:
                pdfcodec.decode_pdf(sl)
            except ValueError:
                pass
        except ValueError:
            errored += 1
    # lower bar than the decode fuzz: slicing copies stream bytes
    # VERBATIM (never inflates them), so only structural bytes are
    # load-bearing — but those must still fail as ValueError only
    assert errored > 20


# --- the seam ----------------------------------------------------------------


def test_decode_real_media_pdf_fallback_runs_in_sandbox():
    from ocr_platform_spark import multimodal

    if multimodal._pdfium is not None:
        pytest.skip("pypdfium2 present: fast path covers this")
    src = _rng(9).integers(0, 256, (50, 100, 3), dtype=np.uint8)
    kind, pages = multimodal.decode_real_media(
        scanned_pdf([src], ["0 0 48 24"]))
    assert kind == "pdf"
    assert len(pages) == 1
    np.testing.assert_array_equal(pages[0], src)
