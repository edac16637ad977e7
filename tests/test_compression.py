"""The shared byte-stream codecs (LZW / PackBits / RunLength / ASCII
armor) and their wiring into the PDF and TIFF containers.

External ground truth: Java ImageIO's TIFF plugin (shipped with the JDK
that PySpark already requires) both encodes fixtures our decoders must
match bit-exactly and decodes our encoders' output — a foreign codec on
both directions rules out a self-consistent-but-wrong width schedule,
the failure mode pure round-trip tests cannot see. Reference analog:
``libs/ocr_core/ocr_tasks.py:54-55`` decodes scanned media through PIL,
which dispatches TIFF-LZW/PackBits and PDF LZW/A85 streams the same way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_platform_spark import compression as C
from ocr_platform_spark import pdfcodec, tiffcodec

from test_pdfcodec import build_pdf, scanned_objs, scanned_pdf, stream_obj

# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------


def test_lzw_pdf_spec_example_both_directions():
    """The worked example from PDF 1.7 §7.4.4.2 (ISO 32000-1 Table 7):
    a published vector pins the code assignment and packing exactly."""
    data = bytes([45] * 5 + [65] + [45] * 3 + [66])
    enc = bytes.fromhex("800B6050220C0C8501")
    assert C.decode_lzw(enc) == data
    assert C.encode_lzw(data) == enc


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4000), st.sampled_from([0, 1]))
def test_lzw_round_trip(data, ec):
    assert C.decode_lzw(C.encode_lzw(data, ec), ec) == data


def test_lzw_table_overflow_clear_cycles():
    """>4096-entry inputs force the encoder to emit Clear and restart;
    both early-change variants must stay in lockstep across the reset."""
    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    for ec in (0, 1):
        enc = C.encode_lzw(data, ec)
        assert C.decode_lzw(enc, ec) == data


def test_lzw_rejects_malformed():
    with pytest.raises(ValueError, match="EarlyChange"):
        C.decode_lzw(b"", 2)
    # Clear, literal 'A', then code 300 with only 259 table entries
    bits = "100000000" + format(65, "09b") + format(300, "09b")
    raw = int(bits + "0" * (-len(bits) % 8), 2).to_bytes(4, "big")
    with pytest.raises(ValueError, match="past table"):
        C.decode_lzw(raw)
    # a set bit in a trailing partial code = truncated stream
    bits = "100000000" + format(65, "09b") + "1"
    raw = int(bits + "0" * (-len(bits) % 8), 2).to_bytes(3, "big")
    with pytest.raises(ValueError, match="mid-code"):
        C.decode_lzw(raw)
    # first data code must be a literal
    bits = "100000000" + format(300, "09b")
    raw = int(bits + "0" * (-len(bits) % 8), 2).to_bytes(3, "big")
    with pytest.raises(ValueError):
        C.decode_lzw(raw)
    with pytest.raises(ValueError, match="cap"):
        C.decode_lzw(C.encode_lzw(b"\x00" * 5000), max_out=100)


def test_lzw_missing_eod_tolerated():
    """TIFF strips routinely end at the byte boundary without EOD."""
    enc = C.encode_lzw(b"hello world")
    # strip the EOD code: re-encode by hand — Clear, literals, no EOD
    codes = [256] + list(b"ab")
    acc, nbits, out = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert C.decode_lzw(bytes(out)) == b"ab"
    assert C.decode_lzw(enc) == b"hello world"


# --------------------------------------------------------------------------
# PackBits / RunLengthDecode
# --------------------------------------------------------------------------


def test_packbits_apple_spec_vector():
    """The worked example from the TIFF 6.0 spec §9 (Apple PackBits):
    24 unpacked bytes pack to the published 15-byte stream."""
    packed = bytes.fromhex("FEAA028000 2AFDAA0380 002A22F7AA".replace(" ", ""))
    unpacked = (b"\xAA" * 3 + b"\x80\x00\x2A" + b"\xAA" * 4
                + b"\x80\x00\x2A\x22" + b"\xAA" * 10)
    assert C.decode_packbits(packed) == unpacked
    assert C.encode_packbits(unpacked) == packed
    assert C.decode_packbits(C.encode_packbits(unpacked)) == unpacked


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=3000))
def test_packbits_and_rle_round_trip(data):
    assert C.decode_packbits(C.encode_packbits(data),
                             expected=len(data)) == data
    assert C.decode_rle_pdf(C.encode_rle_pdf(data)) == data


def test_packbits_rle_semantics_differ_on_128():
    """Control byte 128: PackBits no-op, PDF RunLength EOD."""
    stream = b"\x80\x01\x41\x42"
    assert C.decode_packbits(stream) == b"AB"
    assert C.decode_rle_pdf(stream) == b""


def test_packbits_rle_malformed():
    with pytest.raises(ValueError, match="literal"):
        C.decode_packbits(b"\x05\x41")
    with pytest.raises(ValueError, match="repeat"):
        C.decode_packbits(b"\xFE")
    with pytest.raises(ValueError, match="strip"):
        C.decode_packbits(b"\x01\x41\x42", expected=5)
    with pytest.raises(ValueError, match="literal"):
        C.decode_rle_pdf(b"\x05\x41")
    with pytest.raises(ValueError, match="repeat"):
        C.decode_rle_pdf(b"\xFE")


# --------------------------------------------------------------------------
# ASCII armor
# --------------------------------------------------------------------------


def test_ascii85_known_vectors():
    assert C.decode_ascii85(b"9jqo^~>") == b"Man "
    assert C.decode_ascii85(b"z~>") == b"\x00\x00\x00\x00"
    assert C.decode_ascii85(b" 9jq\no^ ~>") == b"Man "  # whitespace
    assert C.decode_ascii85(b"9jqo~>") == b"Man"  # partial group
    assert C.encode_ascii85(b"\x00\x00\x00\x00") == b"z~>"


def test_ascii85_malformed():
    with pytest.raises(ValueError, match="one character"):
        C.decode_ascii85(b"9~>")
    with pytest.raises(ValueError, match="inside a group"):
        C.decode_ascii85(b"9z~>")
    with pytest.raises(ValueError, match="2\\^32"):
        C.decode_ascii85(b"uuuuu~>")
    with pytest.raises(ValueError, match="invalid"):
        C.decode_ascii85(b"9jqo\x7f~>")
    with pytest.raises(ValueError, match="'~'"):
        C.decode_ascii85(b"9jqo^~x")


def test_ascii_hex_semantics():
    assert C.decode_ascii_hex(b"48 65 6C6C6F>") == b"Hello"
    assert C.decode_ascii_hex(b"7>") == b"\x70"  # odd digit pads 0
    assert C.decode_ascii_hex(b"4142") == b"AB"  # EOD optional at end
    with pytest.raises(ValueError, match="invalid"):
        C.decode_ascii_hex(b"4G>")


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=1000))
def test_ascii_armor_round_trip(data):
    assert C.decode_ascii85(C.encode_ascii85(data)) == data
    assert C.decode_ascii_hex(C.encode_ascii_hex(data)) == data


# --------------------------------------------------------------------------
# Java ImageIO interop (external ground truth, runs in-sandbox)
# --------------------------------------------------------------------------


def _write_pgm(path, arr):
    h, w = arr.shape
    path.write_bytes(b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes())


def _read_pnm(path):
    raw = path.read_bytes()
    hdr, px = raw.split(b"255\n", 1)
    magic, dims = hdr.split(b"\n", 2)[:2]
    w, h = map(int, dims.split())
    if magic == b"P6":
        return np.frombuffer(px, np.uint8).reshape(h, w, 3)
    return np.frombuffer(px, np.uint8).reshape(h, w)


def _structured_gray(w=200, h=120, seed=11):
    """Text-like structure + noise: pushes the LZW table well past the
    9->10->11-bit width switches, the regime where a wrong early-change
    schedule diverges."""
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    arr = ((x * 3 + y * 7) % 256).astype(np.uint8)
    mask = ((x // 17 + y // 13) % 2) == 0
    arr[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
    return arr


@pytest.mark.parametrize("comp", ["LZW", "PackBits", "Deflate"])
def test_imageio_encodes_we_decode_bitexact(tifftool, tmp_path, comp):
    arr = _structured_gray()
    _write_pgm(tmp_path / "g.pgm", arr)
    tifftool("encode", str(tmp_path / "g.pgm"),
             str(tmp_path / "g.tiff"), comp)
    pages = tiffcodec.decode_tiff((tmp_path / "g.tiff").read_bytes(),
                                  mode="L")
    assert len(pages) == 1
    np.testing.assert_array_equal(pages[0], arr)


def test_imageio_decodes_our_lzw_and_packbits(tifftool, tmp_path):
    arr = _structured_gray(seed=29)
    for name, (tag, enc) in {
        "lzw": (5, C.encode_lzw(arr.tobytes())),
        "pb": (32773, C.encode_packbits(arr.tobytes())),
    }.items():
        t = _gray_tiff(tag, enc, arr.shape[1], arr.shape[0])
        (tmp_path / f"{name}.tiff").write_bytes(t)
        tifftool("decode", str(tmp_path / f"{name}.tiff"),
                 str(tmp_path / f"{name}.pgm"))
        np.testing.assert_array_equal(
            _read_pnm(tmp_path / f"{name}.pgm"), arr, err_msg=name)


def _gray_tiff(comp_tag, data, w, h, pred=None):
    """Minimal single-strip little-endian gray TIFF wrapper."""
    entries = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
               (259, 3, 1, comp_tag), (262, 3, 1, 1), (273, 4, 1, 0),
               (277, 3, 1, 1), (278, 4, 1, h), (279, 4, 1, len(data))]
    if pred:
        entries.append((317, 3, 1, pred))
    entries.sort()
    out = struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", len(entries))
    data_off = 8 + 2 + len(entries) * 12 + 4
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        if typ == 3:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    return out + struct.pack("<I", 0) + data


# --------------------------------------------------------------------------
# TIFF container wiring
# --------------------------------------------------------------------------


def test_tiff_predictor2_horizontal_differencing(tifftool, tmp_path):
    arr = _structured_gray(seed=41)
    diff = np.empty_like(arr)
    diff[:, 0] = arr[:, 0]
    diff[:, 1:] = arr[:, 1:] - arr[:, :-1]
    t = _gray_tiff(5, C.encode_lzw(diff.tobytes()),
                   arr.shape[1], arr.shape[0], pred=2)
    np.testing.assert_array_equal(tiffcodec.decode_tiff(t, mode="L")[0],
                                  arr)
    # foreign decoder agrees the wrapper is well-formed predictor-2 LZW
    (tmp_path / "p2.tiff").write_bytes(t)
    tifftool("decode", str(tmp_path / "p2.tiff"), str(tmp_path / "p2.pgm"))
    np.testing.assert_array_equal(_read_pnm(tmp_path / "p2.pgm"), arr)


def test_tiff_deflate_both_tags():
    arr = _structured_gray(seed=43)
    for tag in (8, 32946):
        t = _gray_tiff(tag, zlib.compress(arr.tobytes()),
                       arr.shape[1], arr.shape[0])
        np.testing.assert_array_equal(
            tiffcodec.decode_tiff(t, mode="L")[0], arr)
        assert tiffcodec.probe_tiff(t) == (1, arr.shape[1], arr.shape[0])


def test_tiff_new_compression_guards():
    arr = _structured_gray(seed=47)
    # predictor 2 outside the LZW/Deflate family rejects
    t = _gray_tiff(1, arr.tobytes(), arr.shape[1], arr.shape[0], pred=2)
    with pytest.raises(ValueError, match="Predictor 2"):
        tiffcodec.decode_tiff(t)
    # corrupt LZW strip raises, never returns garbage silently
    t = _gray_tiff(5, b"\xff\xff\xff\xff", arr.shape[1], arr.shape[0])
    with pytest.raises(ValueError):
        tiffcodec.decode_tiff(t)
    # PackBits strip must decode to exactly rows*width bytes
    t = _gray_tiff(32773, C.encode_packbits(b"\x00" * 10), 4, 4)
    with pytest.raises(ValueError):
        tiffcodec.decode_tiff(t)


def _gray_tiff_multi(comp_tag, datas, w, h):
    """Hand-chained multi-page little-endian gray TIFF (one strip per
    page) so slice_pages can be exercised on the new compressions."""
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    ifd_offs = []
    for data in datas:
        entries = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
                   (259, 3, 1, comp_tag), (262, 3, 1, 1), (273, 4, 1, 0),
                   (277, 3, 1, 1), (278, 4, 1, h),
                   (279, 4, 1, len(data))]
        ifd_off = len(out)
        ifd_offs.append(ifd_off)
        data_off = ifd_off + 2 + len(entries) * 12 + 4
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            if typ == 3:
                out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
            else:
                out += struct.pack("<HHII", tag, typ, cnt, val)
        out += struct.pack("<I", 0)  # next-IFD patched below
        out += data
    struct.pack_into("<I", out, 4, ifd_offs[0])
    for prev, nxt in zip(ifd_offs, ifd_offs[1:]):
        # next-IFD pointer sits after the entry table of the prev IFD
        n = struct.unpack_from("<H", out, prev)[0]
        struct.pack_into("<I", out, prev + 2 + n * 12, nxt)
    return bytes(out)


def test_tiff_slice_pages_preserves_lzw():
    """The distributed bucket path slices multi-page TIFFs by verbatim
    strip copy — LZW pages must survive slicing byte-identically."""
    arrs = [_structured_gray(seed=s) for s in (51, 53, 57)]
    t = _gray_tiff_multi(5, [C.encode_lzw(a.tobytes()) for a in arrs],
                         arrs[0].shape[1], arrs[0].shape[0])
    assert tiffcodec.probe_tiff(t)[0] == 3
    sliced = tiffcodec.slice_pages(t, [2, 0])
    pages = tiffcodec.decode_tiff(sliced, mode="L")
    assert len(pages) == 2
    np.testing.assert_array_equal(pages[0], arrs[2])
    np.testing.assert_array_equal(pages[1], arrs[0])


# --------------------------------------------------------------------------
# PDF container wiring
# --------------------------------------------------------------------------


@pytest.fixture()
def rgb_fixture():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    ref = pdfcodec.decode_pdf(scanned_pdf([img], ["0 0 80 60"]))[0]
    return img, ref


def _image_variant(img, filt_dict, data):
    objs = scanned_objs([img], ["0 0 80 60"])
    h, w = img.shape[:2]
    objs[5] = stream_obj(
        f"/Subtype /Image /Width {w} /Height {h} /ColorSpace /DeviceRGB "
        f"/BitsPerComponent 8 {filt_dict}", data)
    return build_pdf(objs)


def test_pdf_image_filter_chains(rgb_fixture):
    img, ref = rgb_fixture
    raw = img.tobytes()
    cases = {
        "/Filter /LZWDecode": C.encode_lzw(raw),
        "/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>":
            C.encode_lzw(raw, 0),
        "/Filter /RunLengthDecode": C.encode_rle_pdf(raw),
        "/Filter [/ASCII85Decode /LZWDecode]":
            C.encode_ascii85(C.encode_lzw(raw)),
        "/Filter [/ASCIIHexDecode /FlateDecode]":
            C.encode_ascii_hex(zlib.compress(raw)),
        "/Filter [/ASCII85Decode /RunLengthDecode /LZWDecode]":
            C.encode_ascii85(C.encode_rle_pdf(C.encode_lzw(raw))),
    }
    for fd, data in cases.items():
        got = pdfcodec.decode_pdf(_image_variant(img, fd, data))[0]
        np.testing.assert_array_equal(got, ref, err_msg=fd)


def test_pdf_lzw_png_predictor_image(rgb_fixture):
    img, ref = rgb_fixture
    h, w = img.shape[:2]
    rows = img.reshape(h, w * 3)
    pred = bytearray()
    prev = bytes(w * 3)
    for r in rows:
        pred.append(2)  # PNG "Up"
        rb = r.tobytes()
        pred += bytes((c - p) & 0xFF for c, p in zip(rb, prev))
        prev = rb
    got = pdfcodec.decode_pdf(_image_variant(
        img,
        "/Filter /LZWDecode /DecodeParms "
        f"<< /Predictor 15 /Colors 3 /Columns {w} >>",
        C.encode_lzw(bytes(pred))))[0]
    np.testing.assert_array_equal(got, ref)


def test_pdf_content_stream_lzw_armor(rgb_fixture):
    img, ref = rgb_fixture
    objs = scanned_objs([img], ["0 0 80 60"])
    content = b"q 80 0 0 60 0 0 cm /Im0 Do Q"
    objs[4] = stream_obj("/Filter [/ASCII85Decode /LZWDecode]",
                         C.encode_ascii85(C.encode_lzw(content)))
    got = pdfcodec.decode_pdf(build_pdf(objs))[0]
    np.testing.assert_array_equal(got, ref)


def test_pdf_armor_before_dct(rgb_fixture):
    """ASCII armor ahead of a terminal DCTDecode: the pre-chain strips
    the armor, the JPEG decoder sees clean DCT bytes."""
    from ocr_platform_spark import jpegcodec

    img, _ = rgb_fixture
    jpg = jpegcodec.encode_jpeg(img)
    ref = pdfcodec.decode_pdf(_image_variant(
        img, "/Filter /DCTDecode", jpg))[0]
    got = pdfcodec.decode_pdf(_image_variant(
        img, "/Filter [/ASCII85Decode /DCTDecode]",
        C.encode_ascii85(jpg)))[0]
    np.testing.assert_array_equal(got, ref)


def test_pdf_rejects_bad_chains(rgb_fixture):
    img, _ = rgb_fixture
    raw = img.tobytes()
    with pytest.raises(ValueError, match="last image filter"):
        pdfcodec.decode_pdf(_image_variant(
            img, "/Filter [/DCTDecode /FlateDecode]", raw))
    with pytest.raises(ValueError, match="last image filter"):
        pdfcodec.decode_pdf(_image_variant(
            img, "/Filter [/FlateDecode /DCTDecode]",
            zlib.compress(raw)))
    with pytest.raises(ValueError, match="unsupported"):
        pdfcodec.decode_pdf(_image_variant(
            img, "/Filter /JBIG2Decode", raw))
    with pytest.raises(ValueError, match="EarlyChange"):
        pdfcodec.decode_pdf(_image_variant(
            img, "/Filter /LZWDecode /DecodeParms << /EarlyChange 5 >>",
            C.encode_lzw(raw)))


def test_lzw_final_code_on_width_boundary():
    """Regression (review finding): the decoder adds a table entry for
    the FINAL data code too — when that lands on a width-bump boundary
    the EOD must be written at the wider width. 254/255-byte
    incompressible inputs hit the 9->10 boundary exactly."""
    rng = np.random.default_rng(0)
    for n in range(245, 265):
        for ec in (0, 1):
            d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert C.decode_lzw(C.encode_lzw(d, ec), ec) == d, (n, ec)


def _pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """MSB-first bit packing of (code, width) pairs, zero-padded."""
    acc, nbits, out = 0, 0, bytearray()
    for c, w in codes:
        acc = (acc << w) | c
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_prebump_eod_every_byte_alignment():
    """The ImageIO writer quirk — EOD flushed at the PRE-bump width when
    the final table entry lands exactly on the 511 boundary — must decode
    at EVERY byte alignment of that tail (review finding): with 1-7 pad
    bits the full-width read yields an over-table code (EOD << pad) and
    previously raised. A leading Clear + m literals shifts the tail
    through all 8 alignments without disturbing the 511-boundary hit."""
    lits2 = [(i * 7 + 13) % 256 for i in range(254)]
    for m in range(8):
        lits1 = [(i * 5 + 3) % 256 for i in range(m)]
        codes = ([(256, 9)] + [(c, 9) for c in lits1]
                 + [(256, 9)] + [(c, 9) for c in lits2]
                 + [(257, 9)])  # the quirk: EOD at 9, decoder is at 10
        got = C.decode_lzw(_pack_codes(codes), 1)
        assert got == bytes(lits1 + lits2), m
    # an over-table code that is NOT the EOD pattern still raises
    bad = ([(256, 9), (3, 9)] + [(256, 9)] + [(c, 9) for c in lits2]
           + [(258, 9)])
    with pytest.raises(ValueError, match="past table"):
        C.decode_lzw(_pack_codes(bad), 1)


def test_unpack_subbyte_rows_contract():
    assert C.unpack_subbyte_rows(b"\xb4", 4, 1, 2).tolist() == [[2, 3, 1, 0]]
    assert C.unpack_subbyte_rows(b"\x80\x00", 3, 2, 1).tolist() == \
        [[1, 0, 0], [0, 0, 0]]
    with pytest.raises(ValueError, match="truncated"):
        C.unpack_subbyte_rows(b"\x00", 8, 2, 4)
    with pytest.raises(ValueError, match="bpc"):
        C.unpack_subbyte_rows(b"\x00", 2, 1, 3)
