"""ccittcodec: pure-stdlib CCITT Group 4 (T.6) codec.

Round-trip alone cannot pin the code tables (a shared wrong table would
round-trip), so the load-bearing pins are:

* prefix-freeness of each colour's complete code set together with the
  2D mode codes and EOL — a mis-typed table entry almost surely collides
  with or prefixes another code and fails this property;
* hand-assembled bit-level encodings of canonical cases (all-white row
  = a single V0 bit; a horizontal-mode row spelled out code by code
  against the published T.4 table values);
* third-party interop: tests/test_real_codecs.py decodes our G4 output
  with Java ImageIO's TIFF reader (JDK 9+ ships T.6) via Spark's
  ``image`` source — bit-exact, since G4 is lossless;
* the same ValueError contract as the other codecs under mutation.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_platform_spark import ccittcodec as cc


def _rng(seed=0):
    return np.random.default_rng(seed)


def _bits_to_bytes(s: str) -> bytes:
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big")


# --- table properties ---------------------------------------------------------


def test_code_tables_are_prefix_free_per_colour():
    """Within one colour's decode alphabet (terminating + make-up +
    extended make-up + the 2D mode codes + EOL), no code is a prefix of
    another — the property that makes bit-serial decoding unambiguous,
    and the property a single flipped/missing bit in a hand-entered
    table would break."""
    modes = list(cc.MODE_V.values()) + [cc.MODE_PASS, cc.MODE_HORIZ,
                                        "000000000001"]
    for runs in ({**cc.WHITE_TERM, **cc.WHITE_MAKEUP, **cc.COMMON_MAKEUP},
                 {**cc.BLACK_TERM, **cc.BLACK_MAKEUP, **cc.COMMON_MAKEUP}):
        codes = sorted(runs.values())
        assert len(set(codes)) == len(codes)  # no duplicates
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not b.startswith(a), (a, b)
        # mode codes are read between runs, never interleaved with them,
        # so they only need to be prefix-free among themselves
        ms = sorted(set(modes))
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                assert not b.startswith(a), (a, b)
    # expected alphabet sizes: 64 terminating, 27 make-up, 13 extended
    assert len(cc.WHITE_TERM) == len(cc.BLACK_TERM) == 64
    assert len(cc.WHITE_MAKEUP) == len(cc.BLACK_MAKEUP) == 27
    assert len(cc.COMMON_MAKEUP) == 13
    assert set(cc.WHITE_MAKEUP) == set(range(64, 1729, 64))
    assert set(cc.COMMON_MAKEUP) == set(range(1792, 2561, 64))


# --- canonical encodings ------------------------------------------------------


def test_all_white_rows_encode_as_single_v0_bits():
    # every all-white row == one V0 bit ("1"); 3 rows + EOFB
    enc = cc.encode_g4(np.zeros((3, 1728), np.uint8))
    assert enc == _bits_to_bytes("111" + cc.EOFB)
    assert np.array_equal(cc.decode_g4(enc, 1728, 3),
                          np.zeros((3, 1728), np.uint8))


def test_horizontal_mode_bit_exact_against_published_tables():
    # one row, 8 wide: 00111100 -> H(white 2, black 4) then V0 at the edge
    # H=001, white-2=0111, black-4=011, V0=1 (a1=b1=8), then EOFB
    row = np.array([[0, 0, 1, 1, 1, 1, 0, 0]], np.uint8)
    want = "001" + "0111" + "011" + "1" + cc.EOFB
    assert cc.encode_g4(row) == _bits_to_bytes(want)
    assert np.array_equal(cc.decode_g4(_bits_to_bytes(want), 8, 1), row)


def test_makeup_chain_row_bit_exact():
    # one row, 200 wide, first 130 black: H(white 0, black 130=makeup 128
    # + term 2) then V0; white-0=00110101, black-128=000011001000,
    # black-2=11
    row = np.zeros((1, 200), np.uint8)
    row[0, :130] = 1
    want = ("001" + "00110101" + "000011001000" + "11" + "1" + cc.EOFB)
    assert cc.encode_g4(row) == _bits_to_bytes(want)
    assert np.array_equal(cc.decode_g4(_bits_to_bytes(want), 200, 1), row)


def test_vertical_and_pass_modes_roundtrip_structured():
    """Text-like strokes: second row shifted ±1..3 from the first
    exercises every vertical mode; a black run that disappears exercises
    pass mode."""
    bm = np.zeros((6, 64), np.uint8)
    bm[0, 10:20] = 1
    bm[1, 11:21] = 1   # VR1 on both edges
    bm[2, 9:23] = 1    # VL2 / VR2
    bm[3, 12:20] = 1   # VR3 / VL3
    bm[4, 12:20] = 1
    bm[4, 40:50] = 1   # new run appears (horizontal mode)
    bm[5, 12:20] = 1   # run disappears (pass mode on the next row)
    enc = cc.encode_g4(bm)
    assert np.array_equal(cc.decode_g4(enc, 64, 6), bm)


# --- round-trip sweeps --------------------------------------------------------


@pytest.mark.parametrize("shape,density,seed", [
    ((1, 1), 0.5, 1),
    ((7, 3), 0.5, 2),
    ((23, 61), 0.3, 3),
    ((40, 200), 0.05, 4),
    ((16, 2730), 0.01, 5),   # wider than 2560: extended make-up chains
    ((64, 100), 0.95, 6),
])
def test_roundtrip_random(shape, density, seed):
    bm = (_rng(seed).random(shape) < density).astype(np.uint8)
    assert np.array_equal(cc.decode_g4(cc.encode_g4(bm), shape[1], shape[0]),
                          bm)


def test_roundtrip_scanned_document_like():
    """A rasterized-text-like page: the engine's own glyph kernel output
    thresholded — the actual payload class G4 exists for."""
    from ocr_platform_spark import kernels

    lines = ["the quick brown fox", "jumps over, 01 -"]
    rows = [kernels.glyph_row(t) for t in lines]  # 1-D ink rows (INK=0)
    w = max(r.shape[0] for r in rows) + 20
    h = len(rows) * 3 * kernels.UNIT + 10
    page = np.full((h, w), 255, np.uint8)
    for i, r in enumerate(rows):
        y = 5 + i * 3 * kernels.UNIT
        page[y:y + kernels.UNIT, 10:10 + r.shape[0]] = r[None, :]
    bm = (page < 128).astype(np.uint8)  # 1 = ink
    assert bm.any() and not bm.all()
    assert np.array_equal(cc.decode_g4(cc.encode_g4(bm), w, h), bm)


# --- error contract -----------------------------------------------------------


def test_decode_error_contract_under_mutation():
    bm = (_rng(9).random((12, 40)) < 0.25).astype(np.uint8)
    base = bytearray(cc.encode_g4(bm))
    rng = _rng(10)
    ok = err = 0
    for _ in range(300):
        raw = bytearray(base)
        raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
        try:
            out = cc.decode_g4(bytes(raw), 40, 12)
            assert out.shape == (12, 40)
            ok += 1
        except ValueError:
            err += 1
    assert err > 30  # mutations really hit load-bearing bits
    for cut in range(0, len(base)):
        try:
            cc.decode_g4(bytes(base[:cut]), 40, 12)
        except ValueError:
            pass
    with pytest.raises(ValueError):
        cc.decode_g4(b"", 8, 8)
    with pytest.raises(ValueError):
        cc.decode_g4(b"\xff", 0, 4)
    with pytest.raises(ValueError):
        cc.encode_g4(np.zeros((0, 4), np.uint8))


# --- Group 3 (T.4) ------------------------------------------------------------


def test_g3_1d_row_bit_exact_against_published_tables():
    # width 8, row 00111100 -> MH runs: white 2 ("0111"), black 4
    # ("011"), white 2 ("0111"); no EOL, zero-padded to the byte edge
    row = np.array([[0, 0, 1, 1, 1, 1, 0, 0]], np.uint8)
    want = "0111" + "011" + "0111"
    assert cc.encode_g3(row) == _bits_to_bytes(want)
    assert np.array_equal(cc.decode_g3(_bits_to_bytes(want), 8, 1), row)


def test_g3_all_white_standard_width_row():
    # 1728 white = makeup 1728 ("010011011") + terminating 0 ("00110101")
    row = np.zeros((1, 1728), np.uint8)
    want = "010011011" + "00110101"
    assert cc.encode_g3(row) == _bits_to_bytes(want)
    assert np.array_equal(cc.decode_g3(_bits_to_bytes(want), 1728, 1), row)


def test_g3_eol_and_fill_tolerated_when_k0():
    """T.4-proper 1D streams carry EOLs (and fill); PDF /K 0 data often
    drops them — both decode identically."""
    row = np.array([[0, 0, 1, 1, 1, 1, 0, 0]], np.uint8)
    body = "0111" + "011" + "0111"
    for prefix in ("", cc.EOL, "0000" + cc.EOL, cc.EOL + "000000000001"):
        # (last case: EOL twice — leading RTC-ish padding)
        enc = _bits_to_bytes(prefix + body)
        assert np.array_equal(cc.decode_g3(enc, 8, 1), row), prefix
    # encoder's eols=True output round-trips too
    enc = cc.encode_g3(row, eols=True)
    assert enc == _bits_to_bytes(cc.EOL + body)
    assert np.array_equal(cc.decode_g3(enc, 8, 1), row)


def test_g3_2d_hand_assembled():
    """K>0: EOL+tag per row; 1D first row, one 2D row of pure V0s."""
    bm = np.array([[0, 0, 1, 1, 1, 1, 0, 0],
                   [0, 0, 1, 1, 1, 1, 0, 0]], np.uint8)
    want = (cc.EOL + "1" + "0111" + "011" + "0111"   # 1D row
            + cc.EOL + "0" + "111")                  # 2D: V0,V0,V0(edge)
    assert cc.encode_g3(bm, k=2) == _bits_to_bytes(want)
    assert np.array_equal(cc.decode_g3(_bits_to_bytes(want), 8, 2, k=2),
                          bm)


def test_g3_byte_align_rows_start_on_byte_boundaries():
    row = np.array([[0, 0, 1, 1, 1, 1, 0, 0]], np.uint8)
    bm = np.vstack([row, row])
    enc = cc.encode_g3(bm, byte_align=True)
    # each 11-bit MH row padded to 2 bytes -> 4 bytes total
    one = "0111" + "011" + "0111"
    assert enc == _bits_to_bytes(one + "0" * 5 + one)
    assert np.array_equal(cc.decode_g3(enc, 8, 2, byte_align=True), bm)


@pytest.mark.parametrize("k", [0, 2, 4])
@pytest.mark.parametrize("byte_align", [False, True])
def test_g3_roundtrip_random(k, byte_align):
    for seed, shape, density in [(1, (30, 90), 0.1), (2, (17, 64), 0.5),
                                 (3, (8, 201), 0.9)]:
        bm = (_rng(seed).random(shape) < density).astype(np.uint8)
        enc = cc.encode_g3(bm, k=k, byte_align=byte_align)
        assert np.array_equal(
            cc.decode_g3(enc, shape[1], shape[0], k=k,
                         byte_align=byte_align), bm), (k, byte_align, seed)


def test_g3_black_start_rows_use_zero_length_white_run():
    bm = np.ones((3, 40), np.uint8)
    bm[1, 20:] = 0
    enc = cc.encode_g3(bm)
    assert np.array_equal(cc.decode_g3(enc, 40, 3), bm)
    # the canonical change list survives as a 2D reference line
    enc2 = cc.encode_g3(bm, k=3)
    assert np.array_equal(cc.decode_g3(enc2, 40, 3, k=3), bm)


def test_g3_error_contract():
    row = np.array([[0, 1, 0, 1, 0, 1, 0, 1]], np.uint8)
    enc1d = cc.encode_g3(row)
    # K>0 requires EOL+tag framing; bare 1D rows must raise
    with pytest.raises(ValueError, match="EOL"):
        cc.decode_g3(enc1d, 8, 1, k=2)
    # first row tagged 2D raises
    bad = _bits_to_bytes(cc.EOL + "0" + "111")
    with pytest.raises(ValueError, match="first row"):
        cc.decode_g3(bad, 8, 1, k=2)
    # overshooting run
    with pytest.raises(ValueError, match="overshoot"):
        cc.decode_g3(_bits_to_bytes("1000" * 4), 8, 1)  # white-3 x4 > 8
    # truncated stream
    with pytest.raises(ValueError):
        cc.decode_g3(b"", 8, 2)
    # adversarial all-zero stream: bounded fill scan, then error
    with pytest.raises(ValueError):
        cc.decode_g3(b"\x00" * 4096, 8, 1)
    with pytest.raises(ValueError):
        cc.decode_g3(cc.encode_g3(row), 0, 1)
    with pytest.raises(ValueError, match="K >= 0"):
        cc.decode_g3(enc1d, 8, 1, k=-1)
    with pytest.raises(ValueError, match="K >= 0"):
        cc.encode_g3(row, k=-4)
    with pytest.raises(ValueError, match="EOL"):
        cc.encode_g3(row, k=2, eols=False)


def test_g3_decode_matches_g4_on_same_bitmap():
    """Same pixels through both coders -> same raster (the decoders
    share the run tables and the 2D row loop; this pins the glue)."""
    bm = (_rng(9).random((40, 120)) < 0.2).astype(np.uint8)
    a = cc.decode_g4(cc.encode_g4(bm), 120, 40)
    b = cc.decode_g3(cc.encode_g3(bm, k=4), 120, 40, k=4)
    c = cc.decode_g3(cc.encode_g3(bm, byte_align=True), 120, 40,
                     byte_align=True)
    assert np.array_equal(a, bm) and np.array_equal(b, bm) \
        and np.array_equal(c, bm)
