"""Real-codec seam: import-gated tests — green where PIL / pypdfium2
exist, SKIPPED (not stubbed) elsewhere. The magic-byte dispatch itself is
always tested (no optional deps needed).
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import formats, multimodal

# a minimal but valid single-page blank PDF (public-format boilerplate)
MINIMAL_PDF = (
    b"%PDF-1.4\n"
    b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
    b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
    b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 72 72]>>endobj\n"
    b"xref\n0 4\n0000000000 65535 f \n0000000009 00000 n \n"
    b"0000000052 00000 n \n0000000101 00000 n \n"
    b"trailer<</Size 4/Root 1 0 R>>\nstartxref\n164\n%%EOF\n"
)


def test_sniff_kind_magic_dispatch():
    assert formats.sniff_kind(b"%PDF-1.7 ...") == "pdf"
    assert formats.sniff_kind(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert formats.sniff_kind(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert formats.sniff_kind(formats.encode_image(
        formats.PageDesc(width=10, height=10))) == "simg"
    assert formats.sniff_kind(formats.encode_pdf([])) == "spdf"
    assert formats.sniff_kind(b"garbage") == "unknown"


def test_decode_media_names_the_real_codec_seam():
    with pytest.raises(ValueError, match="decode_real_media"):
        formats.decode_media(b"%PDF-1.4\n...")
    with pytest.raises(ValueError, match="unknown media magic"):
        formats.decode_media(b"nonsense-bytes")


def test_decode_real_media_rejects_synthetic_containers():
    raw = formats.encode_image(formats.PageDesc(width=4, height=4))
    with pytest.raises(ValueError, match="decode_media"):
        multimodal.decode_real_media(raw)


def test_real_png_decode():
    """Runs EVERYWHERE: a genuine (non-synthetic) PNG payload through the
    real-codec seam — PIL when present, the stdlib zlib/struct decoder
    otherwise (ocr_platform_spark.pngcodec)."""
    import numpy as np

    from ocr_platform_spark import pngcodec

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    kind, pages = multimodal.decode_real_media(pngcodec.encode_png(arr))
    assert kind == "image"
    assert len(pages) == 1
    assert pages[0].shape == (5, 7, 3)
    assert (pages[0] == arr).all()


def _forward_filter(arr, ftype):
    """Reference forward filter (spec §6) for crafting test scanlines."""
    import numpy as np

    h, stride = arr.shape
    bpp = 3
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        row = arr[y].astype(np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        b = prev
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 0:
            f = row
        elif ftype == 1:
            f = row - a
        elif ftype == 2:
            f = row - b
        elif ftype == 3:
            f = row - (a + b) // 2
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            f = row - pr
        out += bytes([ftype]) + (f % 256).astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_scanline_filters(ftype):
    """Hand-filtered IDAT for each of the five filter types decodes back
    to the source pixels (the filters are where PNG decoders go wrong)."""
    import struct
    import zlib

    import numpy as np

    from ocr_platform_spark import pngcodec

    rng = np.random.default_rng(11 + ftype)
    arr = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    flat = arr.reshape(6, 12)
    ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 2, 0, 0, 0)
    raw = (
        pngcodec.SIGNATURE
        + pngcodec._chunk(b"IHDR", ihdr)
        + pngcodec._chunk(b"IDAT", zlib.compress(_forward_filter(flat, ftype)))
        + pngcodec._chunk(b"IEND", b"")
    )
    assert (pngcodec.decode_png(raw) == arr).all()


def test_png_color_types_convert_to_rgb():
    """Gray/palette/alpha color types land as RGB with convert("RGB")
    semantics: gray replicated, alpha dropped (not composited)."""
    import struct
    import zlib

    import numpy as np

    from ocr_platform_spark import pngcodec

    def build(w, h, ctype, pixel_bytes, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        scan = b"".join(
            b"\x00" + pixel_bytes[y * w * ch:(y + 1) * w * ch] for y in range(h)
        )
        chunks = pngcodec._chunk(b"IHDR", ihdr)
        if plte is not None:
            chunks += pngcodec._chunk(b"PLTE", plte)
        chunks += pngcodec._chunk(b"IDAT", zlib.compress(scan))
        chunks += pngcodec._chunk(b"IEND", b"")
        return pngcodec.SIGNATURE + chunks

    # gray (ctype 0): value replicated to 3 bands
    g = pngcodec.decode_png(build(2, 1, 0, bytes([9, 200])))
    assert (g == np.array([[[9] * 3, [200] * 3]], np.uint8)).all()
    # gray+alpha (ctype 4): alpha dropped
    ga = pngcodec.decode_png(build(1, 1, 4, bytes([77, 5])))
    assert (ga == np.full((1, 1, 3), 77, np.uint8)).all()
    # RGBA (ctype 6): alpha dropped, never composited
    rgba = pngcodec.decode_png(build(1, 1, 6, bytes([1, 2, 3, 0])))
    assert (rgba == np.array([[[1, 2, 3]]], np.uint8)).all()
    # palette (ctype 3)
    plte = bytes([10, 20, 30, 40, 50, 60])
    pal = pngcodec.decode_png(build(2, 1, 3, bytes([1, 0]), plte))
    assert (pal == np.array([[[40, 50, 60], [10, 20, 30]]], np.uint8)).all()


def test_png_matches_pil_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from ocr_platform_spark import pngcodec

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    raw = pngcodec.encode_png(arr)
    pil = np.asarray(PIL.open(io.BytesIO(raw)).convert("RGB"))
    assert (pngcodec.decode_png(raw) == pil).all()


def test_real_pdf_decode_at_150dpi():
    pytest.importorskip("pypdfium2")
    kind, pages = multimodal.decode_real_media(MINIMAL_PDF)
    assert kind == "pdf"
    assert len(pages) == 1
    h, w = pages[0].shape[:2]
    # 72x72 pt page rendered at 150 dpi -> 150x150 px (+-1 rounding)
    assert abs(w - 150) <= 1 and abs(h - 150) <= 1


def test_png_palette_index_out_of_range_raises_valueerror():
    import struct
    import zlib

    from ocr_platform_spark import pngcodec

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    raw = (
        pngcodec.SIGNATURE
        + pngcodec._chunk(b"IHDR", ihdr)
        + pngcodec._chunk(b"PLTE", bytes([10, 20, 30]))  # 1 entry
        + pngcodec._chunk(b"IDAT", zlib.compress(b"\x00\x05"))  # index 5
        + pngcodec._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        pngcodec.decode_png(raw)
