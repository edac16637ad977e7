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
    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    img = PIL.new("RGB", (7, 5), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    kind, pages = multimodal.decode_real_media(buf.getvalue())
    assert kind == "image"
    assert len(pages) == 1
    assert pages[0].shape == (5, 7, 3)
    assert (pages[0] == np.array([10, 20, 30], dtype=np.uint8)).all()


def test_real_pdf_decode_at_150dpi():
    pytest.importorskip("pypdfium2")
    kind, pages = multimodal.decode_real_media(MINIMAL_PDF)
    assert kind == "pdf"
    assert len(pages) == 1
    h, w = pages[0].shape[:2]
    # 72x72 pt page rendered at 150 dpi -> 150x150 px (+-1 rounding)
    assert abs(w - 150) <= 1 and abs(h - 150) <= 1
