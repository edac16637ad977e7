"""pdftext: born-digital PDF text-layer extraction (the OCR bypass).

Pins the content-stream text interpreter (positioning, spacing, all four
show operators), character decode (WinAnsi / Standard / Differences /
ToUnicode), line/block assembly (kern-join, space-join, column split),
geometry (device pixel boxes, /Rotate), the strict ValueError contract
for everything outside the supported subset, and a mutation fuzz through
the hybrid dispatch. The reference OCRs every PDF unconditionally
(``ocr_tasks.py:34-55``); the text layer is this engine's 100 TB
efficiency tier, so its semantics get codec-grade pinning.
"""

from __future__ import annotations

import random

import pytest

from ocr_platform_spark import pdfcodec, pdftext
from tests.test_pdfcodec import build_pdf, stream_obj

SCALE = 150.0 / 72.0

HELV = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>")


def one_page(content: bytes, font: bytes = HELV,
             mediabox: bytes = b"[0 0 200 100]",
             extra_objs: dict[int, bytes] | None = None,
             page_extra: bytes = b"") -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox " + mediabox +
           b" /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R"
           + page_extra + b" >>",
        4: stream_obj("", content),
        5: font,
    }
    objs.update(extra_objs or {})
    return build_pdf(objs)


def blocks_of(raw: bytes, **kw) -> list[pdftext.TextBlock]:
    pages = pdftext.extract_hybrid_pages(raw, **kw)
    assert len(pages) == 1 and pages[0][0] == "text"
    return pages[0][1]


# --- positioning and ordering -------------------------------------------------


def test_td_lines_and_reading_order():
    # emitted bottom line FIRST: reading order must come from geometry,
    # not stream order
    raw = one_page(
        b"BT /F1 12 Tf 10 40 Td (second) Tj ET "
        b"BT /F1 12 Tf 10 80 Td (first) Tj ET"
    )
    blocks = blocks_of(raw)
    assert [b.text for b in blocks] == ["first", "second"]
    # x1 = 10pt * 150/72; y1 = (100 - 80)pt*scale - 0.8*12pt*scale
    assert blocks[0].x1 == round(10 * SCALE)
    # baseline sits in the ROUNDED pixel canvas (same geometry as the
    # raster path: H_px = round(100pt * scale) = 208)
    assert blocks[0].y1 == round(
        round(100 * SCALE) - 80 * SCALE - 0.8 * 12 * SCALE
    )
    n, w, h = pdftext.validate_hybrid(raw)
    assert (n, w, h) == (1, round(200 * SCALE), round(100 * SCALE))


def test_tm_tstar_tl_and_quote_ops():
    raw = one_page(
        b"BT /F1 10 Tf 14 TL 1 0 0 1 20 90 Tm (one) Tj T* (two) Tj "
        b"(three) ' 2 1 (four) \" ET"
    )
    assert [b.text for b in blocks_of(raw)] == [
        "one", "two", "three", "four"
    ]


def test_td_vs_TD_leading():
    # TD sets leading = -ty, so the following T* drops by the same step
    raw = one_page(
        b"BT /F1 10 Tf 10 90 Td 0 -15 TD (a) Tj T* (b) Tj ET"
    )
    a, b = blocks_of(raw)
    assert (a.text, b.text) == ("a", "b")
    assert b.y1 - a.y1 == round(15 * SCALE)  # same 15pt step twice


def test_rise_moves_baseline():
    raw = one_page(b"BT /F1 10 Tf 10 50 Td 5 Ts (up) Tj ET")
    up, = blocks_of(raw)
    flat, = blocks_of(one_page(b"BT /F1 10 Tf 10 50 Td (up) Tj ET"))
    assert flat.y1 - up.y1 == round(5 * SCALE)


def test_cm_translation_applies_to_text():
    raw = one_page(b"q 1 0 0 1 30 -10 cm BT /F1 10 Tf 10 50 Td (m) Tj ET Q")
    moved, = blocks_of(raw)
    base, = blocks_of(one_page(b"BT /F1 10 Tf 40 40 Td (m) Tj ET"))
    assert (moved.x1, moved.y1) == (base.x1, base.y1)


# --- runs, kerning, spacing ---------------------------------------------------


def test_tj_kern_join_space_join_column_split():
    # -20/1000 em: kern continuation; a 0.6em pen jump: space join;
    # a second BT 50pt away: separate column block
    raw = one_page(
        b"BT /F1 10 Tf 10 50 Td [(ker) -20 (ned) -600 (word)] TJ ET "
        b"BT /F1 10 Tf 120 50 Td (col2) Tj ET"
    )
    blocks = blocks_of(raw)
    assert [b.text for b in blocks] == ["kerned word", "col2"]


def test_widths_array_drives_advance():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding /FirstChar 97 "
            b"/Widths [400 800] >>")  # a=400, b=800
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (ab) Tj ET", font=font)
    blk, = blocks_of(raw)
    assert blk.x2 - blk.x1 == round((0.4 + 0.8) * 10 * SCALE)


def test_char_word_spacing_and_hscale():
    # Tc/Tw/Tz all stretch the pen advance (x2), per PDF 9.4.4
    plain, = blocks_of(one_page(b"BT /F1 10 Tf 10 50 Td (a a) Tj ET"))
    spaced, = blocks_of(one_page(
        b"BT /F1 10 Tf 2 Tc 3 Tw 10 50 Td (a a) Tj ET"
    ))
    # 3 chars x 2pt Tc + 1 space x 3pt Tw = 9pt wider
    assert (spaced.x2 - spaced.x1) - (plain.x2 - plain.x1) == round(
        9 * SCALE
    )
    wide, = blocks_of(one_page(
        b"BT /F1 10 Tf 200 Tz 10 50 Td (a a) Tj ET"
    ))
    assert (wide.x2 - wide.x1) == 2 * (plain.x2 - plain.x1)


def test_invisible_text_mode_is_extracted():
    # Tr 3 is exactly how upstream OCR embeds a text layer over scans
    raw = one_page(b"BT /F1 10 Tf 3 Tr 10 50 Td (hidden) Tj ET")
    assert [b.text for b in blocks_of(raw)] == ["hidden"]


# --- character decode ---------------------------------------------------------


def test_string_escapes_and_hex_strings():
    raw = one_page(
        rb"BT /F1 10 Tf 10 80 Td (par\(en\) \\ \134) Tj "
        rb"0 -20 Td <48692068657821> Tj 0 -20 Td (\101\102\103) Tj ET"
    )
    assert [b.text for b in blocks_of(raw)] == [
        "par(en) \\ \\", "Hi hex!", "ABC"
    ]


def test_winansi_high_bytes():
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (\223q\224 \226 \205) Tj ET")
    assert blocks_of(raw)[0].text == "“q” – …"


def test_standard_encoding_default_and_quotes():
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>"
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (it's `q') Tj ET", font=font)
    # StandardEncoding: 39 -> quoteright, 96 -> quoteleft
    assert blocks_of(raw)[0].text == "it’s ‘q’"


def test_differences_encoding():
    font = (b"<< /Type /Font /Subtype /TrueType /BaseFont /X "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [65 /eacute 97 /bullet /germandbls] >> >>")
    # consecutive names consume consecutive codes: 97 -> bullet,
    # 98 -> germandbls
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (Aab) Tj ET", font=font)
    assert blocks_of(raw)[0].text == "é•ß"


def test_unknown_glyph_name_raises():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /X "
            b"/Encoding << /Differences [65 /glorp] >> >>")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (A) Tj ET", font=font)
    with pytest.raises(ValueError, match="AGL subset"):
        pdftext.validate_hybrid(raw)


def test_uni_glyph_names():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /X "
            b"/Encoding << /Differences [65 /uni20AC /u1F600] >> >>")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (AB) Tj ET", font=font)
    assert blocks_of(raw)[0].text == "€\U0001f600"


def test_tounicode_overrides_encoding():
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"2 beginbfchar <41> <0057> <42> <00570058> endbfchar\n"
            b"1 beginbfrange <61> <63> <0070> endbfrange\n"
            b"1 beginbfrange <64> <66> [<0030> <0031> <0032>] endbfrange\n"
            b"end")
    font = (b"<< /Type /Font /Subtype /TrueType /BaseFont /X "
            b"/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (ABabcdef) Tj ET", font=font,
                   extra_objs={6: stream_obj("", cmap)})
    assert blocks_of(raw)[0].text == "WWXpqr012"


def test_tounicode_multibyte_codes_raise():
    # <0041> (value 0x41, padded) is legal for a simple font; a source
    # whose VALUE needs two bytes is composite-font territory
    cmap = b"1 beginbfchar <4142> <0057> endbfchar"
    font = (b"<< /Type /Font /Subtype /TrueType /BaseFont /X "
            b"/ToUnicode 6 0 R >>")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (A) Tj ET", font=font,
                   extra_objs={6: stream_obj("", cmap)})
    with pytest.raises(ValueError, match="wider than the font's 1-byte"):
        pdftext.validate_hybrid(raw)


def test_unmapped_code_raises_at_probe():
    # StandardEncoding leaves 0x80-0xA0 undefined
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /X >>"
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (\200) Tj ET", font=font)
    with pytest.raises(ValueError, match="unmapped"):
        pdftext.validate_hybrid(raw)


# --- subset refusals ----------------------------------------------------------


def test_type0_font_raises():
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
            b"/Encoding /Identity-H >>")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (\000A) Tj ET", font=font)
    with pytest.raises(ValueError, match="Type0"):
        pdftext.validate_hybrid(raw)


def test_type3_font_raises():
    font = b"<< /Type /Font /Subtype /Type3 /CharProcs << >> >>"
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (A) Tj ET", font=font)
    with pytest.raises(ValueError, match="Type3"):
        pdftext.validate_hybrid(raw)


def test_rotated_text_matrix_raises():
    raw = one_page(
        b"BT /F1 10 Tf 0.7 0.7 -0.7 0.7 30 30 Tm (tilt) Tj ET"
    )
    with pytest.raises(ValueError, match="rotated|sheared"):
        pdftext.validate_hybrid(raw)


def test_unknown_font_name_raises():
    raw = one_page(b"BT /F9 10 Tf 10 50 Td (x) Tj ET")
    with pytest.raises(ValueError, match="unknown font"):
        pdftext.validate_hybrid(raw)


def test_show_before_tf_raises():
    raw = one_page(b"BT 10 50 Td (x) Tj ET")
    with pytest.raises(ValueError, match="before Tf"):
        pdftext.validate_hybrid(raw)


def test_showless_text_object_falls_to_scanned_and_quarantines():
    # BT/ET with no show op does not claim the page for the text tier;
    # the scanned contract then refuses the text machinery outright
    raw = one_page(b"BT /F1 10 Tf 10 50 Td ET")
    with pytest.raises(ValueError, match="unsupported"):
        pdftext.validate_hybrid(raw)


def test_vector_only_page_still_quarantines():
    # no show ops -> scanned contract -> path painting refused, exactly
    # as before the hybrid tier existed
    raw = one_page(b"0 0 10 10 re f")
    with pytest.raises(ValueError, match="unsupported"):
        pdftext.validate_hybrid(raw)


# --- geometry -----------------------------------------------------------------


def test_rotate_90_box_mapping():
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (r) Tj ET",
                   page_extra=b" /Rotate 90")
    blk, = blocks_of(raw)
    plain, = blocks_of(one_page(b"BT /F1 10 Tf 10 50 Td (r) Tj ET"))
    h_px = round(100 * SCALE)  # pre-rotation canvas height
    assert (blk.x1, blk.y1, blk.x2, blk.y2) == (
        h_px - plain.y2, plain.x1, h_px - plain.y1, plain.x2
    )
    # displayed dims swap, same as the raster path
    n, w, h = pdftext.validate_hybrid(raw)
    assert (w, h) == (round(100 * SCALE), round(200 * SCALE))


def test_whitespace_only_show_is_invisible():
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (   ) Tj 0 -20 Td (seen) Tj ET")
    assert [b.text for b in blocks_of(raw)] == ["seen"]


# --- hybrid dispatch ----------------------------------------------------------


def _gray_image_page_objs(next_obj: int) -> tuple[bytes, bytes, dict]:
    import zlib

    import numpy as np

    img = (np.arange(100, dtype=np.uint8).reshape(10, 10) * 2 + 30)
    xo = stream_obj(
        "/Subtype /Image /Width 10 /Height 10 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(img.tobytes()),
    )
    content = b"q 48 0 0 24 0 0 cm /Im0 Do Q"
    return content, xo, {}


def test_mixed_document_dispatch():
    content_img, xo, _ = _gray_image_page_objs(9)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", b"BT /F1 10 Tf 10 50 Td (textpage) Tj ET"),
        5: HELV,
        6: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 48 24] "
           b"/Resources << /XObject << /Im0 8 0 R >> >> /Contents 7 0 R >>",
        7: stream_obj("", b"q 48 0 0 24 0 0 cm /Im0 Do Q"),
        8: xo,
    }
    raw = build_pdf(objs)
    pages = pdftext.extract_hybrid_pages(raw)
    assert [p[0] for p in pages] == ["text", "image"]
    assert pages[0][1][0].text == "textpage"
    assert pages[1][1].shape == (50, 100)  # 48x24pt at 150dpi, gray
    assert pdftext.validate_hybrid(raw)[0] == 2
    # page selection keeps the per-page kinds
    sel = pdftext.extract_hybrid_pages(raw, page_indices=[1])
    assert [p[0] for p in sel] == ["image"]


def test_image_on_text_page_is_inert():
    import zlib

    import numpy as np

    img = np.full((4, 4), 9, np.uint8)
    xo = stream_obj(
        "/Subtype /Image /Width 4 /Height 4 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(img.tobytes()),
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
           b"/Resources << /Font << /F1 5 0 R >> /XObject << /Im0 6 0 R >>"
           b" >> /Contents 4 0 R >>",
        4: stream_obj(
            "", b"q 10 0 0 10 5 5 cm /Im0 Do Q "
                b"BT /F1 10 Tf 10 50 Td (words) Tj ET"
        ),
        5: HELV,
        6: xo,
    }
    raw = build_pdf(objs)
    pages = pdftext.extract_hybrid_pages(raw)
    assert pages[0][0] == "text"
    assert [b.text for b in pages[0][1]] == ["words"]
    assert pdftext.validate_hybrid(raw)[0] == 1


def test_mutation_fuzz_valueerror_contract():
    raw = one_page(
        b"BT /F1 11 Tf 12 80 Td [(alpha) -300 (beta)] TJ "
        b"0 -20 Td (gamma \223delta\224) Tj ET"
    )
    rng = random.Random(4242)
    survived = 0
    for _ in range(400):
        buf = bytearray(raw)
        for _k in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            pdftext.validate_hybrid(bytes(buf))
            pdftext.extract_hybrid_pages(bytes(buf))
            survived += 1
        except ValueError:
            pass  # the contract: ValueError, never another leak
        except MemoryError:
            pass  # resource exhaustion surfaces as itself by design
    assert survived < 400  # the fuzz actually bit


def test_sliced_text_pdf_round_trip():
    # the bucket slicer must carry /Font resources so a sliced text page
    # still extracts; equality with the unsliced extraction
    pages_objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", b"BT /F1 10 Tf 10 50 Td (pageone) Tj ET"),
        5: HELV,
        6: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 7 0 R >>",
        7: stream_obj("", b"BT /F1 10 Tf 10 50 Td (pagetwo) Tj ET"),
    }
    raw = build_pdf(pages_objs)
    sliced = pdfcodec.slice_pages(raw, [1])
    pages = pdftext.extract_hybrid_pages(sliced)
    assert [b.text for b in pages[0][1]] == ["pagetwo"]


# --- graphics-state save/restore ----------------------------------------------


def test_q_restores_text_state():
    """Tc/Tw/Tz/TL/Tf/Ts are graphics-state parameters (PDF 32000-1
    §8.4.2): a Tc set inside q..Q must not survive the Q. A leaked
    Tc 40 inflates every later advance, splitting 'cd ef' into two
    far-apart blocks."""
    tail = b"BT /F1 12 Tf 10 50 Td (cd ef) Tj ET"
    raw_qq = one_page(
        b"q BT /F1 12 Tf 40 Tc 10 80 Td (ab) Tj ET Q " + tail)
    raw_plain = one_page(tail)
    qq = blocks_of(raw_qq)
    assert [b.text for b in qq] == ["ab", "cd ef"]
    plain = blocks_of(raw_plain)
    assert [(b.x1, b.y1, b.x2, b.y2, b.text) for b in qq[1:]] == \
        [(b.x1, b.y1, b.x2, b.y2, b.text) for b in plain]


# --- whitespace-only text layers ----------------------------------------------


def _whitespace_over_scan_pdf() -> bytes:
    import zlib

    import numpy as np

    img = np.full((10, 10), 128, dtype=np.uint8)
    return build_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 48 24] "
           b"/Resources << /Font << /F1 5 0 R >> "
           b"/XObject << /Im0 6 0 R >> >> /Contents 4 0 R >>",
        4: stream_obj("", b"q 48 0 0 24 0 0 cm /Im0 Do Q "
                          b"BT /F1 10 Tf 2 12 Td (   ) Tj ET"),
        5: HELV,
        6: stream_obj(
            "/Subtype /Image /Width 10 /Height 10 /ColorSpace /DeviceGray "
            "/BitsPerComponent 8 /Filter /FlateDecode",
            zlib.compress(img.tobytes()),
        ),
    })


def test_whitespace_only_layer_over_scan_quarantines():
    """A scan wearing a whitespace-only invisible text layer (bad
    upstream OCR) must NOT be claimed as a text page with zero blocks —
    that silently loses the whole scan. It dispatches to the raster
    path, whose show-op refusal quarantines it loudly."""
    raw = _whitespace_over_scan_pdf()
    with pytest.raises(ValueError, match="whitespace text over images"):
        pdftext.validate_hybrid(raw)
    with pytest.raises(ValueError):
        pdftext.extract_hybrid_pages(raw)


def test_whitespace_only_blank_page_is_empty_text_page():
    """Whitespace-only show ops and NO images: a genuinely blank page —
    empty-page passthrough, no raster, no quarantine."""
    raw = one_page(b"BT /F1 10 Tf 10 50 Td (   ) Tj ET")
    pages = pdftext.extract_hybrid_pages(raw)
    assert pages[0][0] == "text" and pages[0][1] == []
    assert pdftext.validate_hybrid(raw)[0] == 1


# --- composite fonts (Type0 / Identity-H) --------------------------------------


def _identity_h_objs(cmap: bytes, cid_font_extra: bytes = b"",
                     font_extra: bytes = b"") -> dict[int, bytes]:
    return {
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Emb "
            b"/Encoding /Identity-H /DescendantFonts [7 0 R] "
            b"/ToUnicode 6 0 R" + font_extra + b" >>"),
        6: stream_obj("", cmap),
        7: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Emb "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 500 "
            b"/W [1 [600 700] 5 8 800]" + cid_font_extra + b" >>"),
    }


def test_identity_h_decodes_and_advances():
    """The dominant born-digital class: 2-byte big-endian codes, code ==
    CID, ToUnicode text, /W + /DW widths. CIDs 1,2 carry explicit
    widths (600,700), CID 9 falls back to /DW 500."""
    cmap = (b"3 beginbfchar <0001> <0041> <0002> <0042> "
            b"<0009> <0043> endbfchar")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <000100020009> Tj ET",
                   extra_objs=_identity_h_objs(cmap))
    blocks = blocks_of(raw)
    assert [b.text for b in blocks] == ["ABC"]
    # advance = (600 + 700 + 500)/1000 * 10pt = 18pt; endpoints round
    # independently in pixel space
    blk = blocks[0]
    assert (blk.x1, blk.x2) == (round(10 * SCALE), round((10 + 18) * SCALE))
    assert pdftext.validate_hybrid(raw)[0] == 1


def test_identity_h_bfrange_and_tj_kern():
    cmap = b"1 beginbfrange <0001> <0003> <0061> endbfrange"
    raw = one_page(
        b"BT /F1 10 Tf 10 50 Td [<0001> -1000 <00020003>] TJ ET",
        extra_objs=_identity_h_objs(cmap))
    # TJ item -1000 moves the pen RIGHT 1000/1000 em = 10pt: a 1.0 em
    # gap sits between JOIN_GAP_EM (0.15) and SPACE_GAP_EM (1.2), so
    # the runs SPACE-join into one block — pinned exactly, so a CID
    # width regression that shifts the gap classification fails here
    assert [b.text for b in blocks_of(raw)] == ["a bc"]


def test_identity_h_dw_zero_is_honored():
    """/DW 0 is legal (zero-width default glyphs): CIDs outside /W must
    advance 0, not a silently-defaulted 1000."""
    cmap = (b"2 beginbfchar <0001> <0041> <0009> <0042> endbfchar")
    objs = _identity_h_objs(cmap)
    objs[7] = objs[7].replace(b"/DW 500", b"/DW 0")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <00010009> Tj ET",
                   extra_objs=objs)
    blk, = blocks_of(raw)
    # CID 1 width 600 from /W; CID 9 falls to /DW 0 — advance 6pt only
    assert (blk.x1, blk.x2) == (round(10 * SCALE), round(16 * SCALE))


def test_cid_widths_list_form_validates_bounds():
    cmap = b"1 beginbfchar <0001> <0041> endbfchar"
    objs = _identity_h_objs(cmap)
    objs[7] = objs[7].replace(b"/W [1 [600 700] 5 8 800]",
                              b"/W [65535 [600 700]]")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <0001> Tj ET",
                   extra_objs=objs)
    with pytest.raises(ValueError, match="16-bit CID range"):
        pdftext.validate_hybrid(raw)


def test_identity_h_word_spacing_never_applies():
    """PDF 9.3.3: Tw applies to byte 32 of SINGLE-byte codes only — a
    2-byte CID 32 must not take word spacing (a wrong Tw widens the
    advance and splits blocks)."""
    cmap = (b"3 beginbfchar <0020> <0020> <0001> <0041> "
            b"<0002> <0042> endbfchar")
    with_tw = one_page(
        b"BT /F1 10 Tf 100 Tw 10 50 Td <000100200002> Tj ET",
        extra_objs=_identity_h_objs(cmap))
    without = one_page(
        b"BT /F1 10 Tf 10 50 Td <000100200002> Tj ET",
        extra_objs=_identity_h_objs(cmap))
    bw, bo = blocks_of(with_tw), blocks_of(without)
    assert [(b.x1, b.x2, b.text) for b in bw] == \
        [(b.x1, b.x2, b.text) for b in bo]


def test_identity_h_refusals():
    cmap = b"1 beginbfchar <0001> <0041> endbfchar"
    # odd-length show string
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <000100> Tj ET",
                   extra_objs=_identity_h_objs(cmap))
    with pytest.raises(ValueError, match="odd-length"):
        pdftext.validate_hybrid(raw)
    # unmapped CID
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <0004> Tj ET",
                   extra_objs=_identity_h_objs(cmap))
    with pytest.raises(ValueError, match="unmapped"):
        pdftext.validate_hybrid(raw)
    # Identity-V (vertical layout)
    objs = _identity_h_objs(cmap)
    objs[5] = objs[5].replace(b"/Identity-H", b"/Identity-V")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <0001> Tj ET",
                   extra_objs=objs)
    with pytest.raises(ValueError, match="Identity-H only"):
        pdftext.validate_hybrid(raw)
    # Type0 without ToUnicode: opaque glyph ids
    objs = _identity_h_objs(cmap)
    objs[5] = objs[5].replace(b"/ToUnicode 6 0 R", b"")
    raw = one_page(b"BT /F1 10 Tf 10 50 Td <0001> Tj ET",
                   extra_objs=objs)
    with pytest.raises(ValueError, match="without /ToUnicode"):
        pdftext.validate_hybrid(raw)
