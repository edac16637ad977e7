"""Pure-stdlib CCITT Group 4 (ITU-T T.6) codec: the dominant compression
for scanned bitonal documents (fax-class TIFFs and ``/CCITTFaxDecode``
PDF image streams — the reference platform's PyMuPDF renderer decodes
these natively; ``apps/worker/app/tasks/ocr_tasks.py:39-52``).

Like :mod:`pngcodec` / :mod:`jpegcodec` / :mod:`pdfcodec`, this closes an
env-gated seam with a dependency-free implementation so the real-codec
path has live in-sandbox coverage. Both directions are implemented:

* :func:`decode_g4` — T.6 two-dimensional decoding (pass / horizontal /
  vertical modes, T.4 modified-Huffman run tables with make-up chains),
  returning a ``(rows, cols)`` uint8 array with **1 = black** (ink).
* :func:`encode_g4` — the matching coder (vertical preferred within
  ±3, pass when the reference run ends early, horizontal otherwise,
  EOFB terminator) so fixtures round-trip without an external library.
* :func:`decode_g3` / :func:`encode_g3` — Group 3 (ITU-T T.4): pure-1D
  Modified Huffman rows (``K = 0`` in PDF terms, TIFF compression 2
  when byte-aligned) and mixed 2D (``K > 0``, EOL + tag-bit framing,
  TIFF compression 3 with the 2D ``T4Options`` bit), sharing the run
  tables and the 2D row loop with the T.6 coder. Older fax archives
  and pre-2000 scanner output ship G3 where modern scans ship G4.

Correctness evidence beyond round-trip (a shared wrong table would
round-trip): the code tables are pinned by a prefix-freeness property
test, canonical single-code encodings are asserted against hand-checked
bit strings from the T.4 tables, and ``tests/test_real_codecs.py``
cross-checks whole bitmaps against **Java ImageIO's TIFF reader** (JDK 9+
ships CCITT T.6 support) through Spark's ``image`` source — a true
third-party decoder that runs in-sandbox.

The ValueError contract matches the other codecs: malformed or
adversarial bit-streams raise ``ValueError`` (the quarantine path keys
on it), never a parser leak; decoded geometry is bounded by the caller's
``columns``/``rows`` so a lying header cannot balloon memory.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# --------------------------------------------------------------------------
# ITU-T T.4 modified-Huffman run-length tables (shared by T.4 2D and T.6)
# --------------------------------------------------------------------------

#: run length -> code bit-string, white runs, terminating (0..63)
WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

#: white make-up codes (64..1728)
WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

#: black terminating codes (0..63)
BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}

#: black make-up codes (64..1728)
BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

#: extended make-up codes (1792..2560), shared by both colours
COMMON_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

#: T.6 two-dimensional mode codes (T.4 table 4 / T.6 table 1)
MODE_PASS = "0001"
MODE_HORIZ = "001"
MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
          -1: "010", -2: "000010", -3: "0000010"}
#: T.4 end-of-line code (11 zeros + 1)
EOL = "000000000001"
#: T.6 end-of-facsimile-block: two EOLs
EOFB = EOL * 2
#: 2D extension escape (incl. uncompressed mode) — rejected
MODE_EXT_PREFIX = "0000001"


def _invert(table: dict[int, str]) -> dict[str, int]:
    inv = {}
    for run, code in table.items():
        if code in inv:  # pragma: no cover - table typo guard
            raise AssertionError(f"duplicate code {code}")
        inv[code] = run
    return inv


_WHITE_DEC = _invert({**WHITE_TERM, **WHITE_MAKEUP, **COMMON_MAKEUP})
_BLACK_DEC = _invert({**BLACK_TERM, **BLACK_MAKEUP, **COMMON_MAKEUP})

# --- decode acceleration: flat prefix-expanded lookup tables ----------------
# Bit-serial dict lookups cost ~100 ms on a realistic 150-DPI text page;
# the decoder instead precomputes, once at import, (a) a 128-entry table
# mapping any 7-bit prefix to its 2D mode and (b) 8192-entry tables
# mapping any 13-bit prefix to (run, code length) per colour — prefix
# expansion is valid exactly because the alphabets are prefix-free
# (pinned in tests). The bit-stream itself becomes a list of 16-bit
# sliding windows built with vectorized shifts, so the hot loop is pure
# int indexing (~15 ms/page on the same input).

#: mode actions in _MODE_TBL: -3..3 = vertical delta, _H / _P sentinels
_H, _P = 99, 98
_MODE_SPECS = [
    (MODE_V[0], 0), (MODE_V[1], 1), (MODE_V[-1], -1),
    (MODE_HORIZ, _H), (MODE_PASS, _P),
    (MODE_V[2], 2), (MODE_V[-2], -2), (MODE_V[3], 3), (MODE_V[-3], -3),
]


def _expand(specs, width: int) -> list:
    tbl: list = [None] * (1 << width)
    for code, action in specs:
        ln = len(code)
        base = int(code, 2) << (width - ln)
        for fill in range(1 << (width - ln)):
            tbl[base | fill] = (action, ln)
    return tbl


_MODE_TBL = _expand(_MODE_SPECS, 7)
_RUN_WIDTH = 13  # longest MH code
_WHITE_TBL = _expand(list(_WHITE_DEC.items()), _RUN_WIDTH)
_BLACK_TBL = _expand(list(_BLACK_DEC.items()), _RUN_WIDTH)


def _windows(data: bytes):
    """16-bit MSB-first sliding windows: ``win[i]`` holds bits i..i+15
    (zero-padded past the end, where no valid code can match — the
    all-zero prefix region is EOL/extension, which the decoder rejects).
    Stored as ``array('I')``: Python-int indexing speed at 4 bytes/entry,
    so an adversarial maximum-entropy stream costs 32x its own size, not
    the ~300x a list of boxed ints would."""
    import array

    bits = np.unpackbits(np.frombuffer(data, np.uint8)).astype(np.uint32)
    n = len(bits)
    bits = np.concatenate([bits, np.zeros(16, np.uint32)])
    acc = np.zeros(n, np.uint32)
    for k in range(16):
        acc = (acc << 1) | bits[k:k + n]
    win = array.array("I")
    win.frombytes(acc.tobytes())
    return win


def _b1_b2(ref: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """First changing element on the reference line right of ``a0`` with
    colour opposite to ``color`` (T.4 §2.2.4 definitions). ``ref`` holds
    alternating change positions: even index = change TO black."""
    i = bisect_right(ref, a0)
    # need a change to the opposite of `color`: to black (even index) when
    # current colour is white (0), to white (odd index) when black (1)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def _run(win: list, pos: int, white: bool) -> tuple[int, int]:
    """One MH run (make-up chain + terminating code) -> (length, pos)."""
    tbl = _WHITE_TBL if white else _BLACK_TBL
    total = 0
    for _ in range(64):  # bound make-up chains (adversarial streams)
        e = tbl[win[pos] >> 3]  # top 13 of the 16-bit window
        if e is None:
            raise ValueError(
                f"invalid CCITT {'white' if white else 'black'} run code"
            )
        run, ln = e
        pos += ln
        total += run
        if run < 64:  # terminating code ends the run
            return total, pos
    raise ValueError("CCITT make-up chain too long")


def _decode_2d_row(win, pos: int, ref: list, columns: int):
    """One 2D-coded row (shared by T.6 and the 2D rows of T.4 ``K>0``)
    against reference line ``ref`` -> ``(changes, pos)``."""
    cur: list[int] = []
    append = cur.append
    a0 = -1
    color = 0  # 0 = white, 1 = black
    ri = 0  # monotone pointer: first ref change right of a0
    nref = len(ref)
    mode_tbl = _MODE_TBL
    H, P = _H, _P
    while a0 < columns:
        m = mode_tbl[win[pos] >> 9]  # top 7 bits
        if m is None:
            # 0000000...: EOL/EOFB inside the row, or extension
            raise ValueError(
                "unexpected CCITT EOL/extension code inside a 2D row "
                "(uncompressed mode unsupported)"
            )
        action, ln = m
        pos += ln
        if action == H:
            start = a0 if a0 > 0 else 0
            r1, pos = _run(win, pos, color == 0)
            r2, pos = _run(win, pos, color != 0)
            t1, t2 = start + r1, start + r1 + r2
            if not (a0 < t1 <= t2 <= columns) or \
                    (cur and t1 < cur[-1]):
                raise ValueError(
                    "CCITT horizontal runs overshoot row"
                )
            cur.extend((t1, t2))
            a0 = t2
            continue
        # b1 = first ref change > a0 of colour opposite to a0's
        # (even ref index = change to black); a0 only grows, so a
        # monotone pointer replaces per-mode bisect
        while ri < nref and ref[ri] <= a0:
            ri += 1
        i = ri if (ri & 1) == color else ri + 1
        if action == P:
            b2 = ref[i + 1] if i + 1 < nref else columns
            if b2 > columns:
                raise ValueError("CCITT pass mode overshoots row")
            a0 = b2
            continue
        b1 = ref[i] if i < nref else columns
        a1 = b1 + action  # vertical: a changing element at a1
        if a1 <= a0 or a1 > columns or a1 < 0 or \
                (cur and a1 < cur[-1]):
            raise ValueError("CCITT vertical mode out of order")
        append(a1)
        a0 = a1
        color ^= 1
    if a0 > columns:
        raise ValueError("CCITT row overshoots width")
    return cur, pos


def _decode_1d_row(win, pos: int, columns: int):
    """One MH (T.4 1D) row: alternating white/black runs summing to
    exactly ``columns`` -> ``(changes, pos)``. Zero-length runs (a row
    starting black, or makeup boundary artifacts) cancel in place so the
    returned change list stays canonical for use as a 2D reference."""
    cur: list[int] = []
    a0 = 0
    white = True
    while a0 < columns:
        run, pos = _run(win, pos, white)
        a0 += run
        if a0 > columns:
            raise ValueError("CCITT 1D run overshoots row")
        if cur and cur[-1] == a0:
            cur.pop()
        else:
            cur.append(a0)
        white = not white
    return cur, pos


def _bit(win, p: int) -> int:
    return (win[p] >> 15) & 1


#: fill-run bound: T.4 fill is sub-byte in practice; 4096 zero bits of
#: "fill" is an adversarial stream, not a fax
_MAX_FILL = 4096


def _try_eol(win, pos: int, nbits: int):
    """Scan optional fill (zeros) + EOL (``>=11`` zeros then a 1)
    starting at ``pos``. Returns the position after the EOL's 1, or
    ``None`` (nothing consumed) when the bits at ``pos`` are a data
    code. MH/mode alphabets never contain 11 consecutive zeros, so this
    cannot swallow a valid code."""
    p = pos
    z = 0
    while p < nbits and not _bit(win, p):
        z += 1
        if z > _MAX_FILL:
            raise ValueError("CCITT fill run too long")
        p += 1
    if p >= nbits or z < 11:
        return None
    return p + 1


def _paint(flat: list, rows: int, columns: int) -> np.ndarray:
    """Parity paint: changing elements collected as flat plane indices;
    one bincount + XOR-accumulate replaces per-change numpy writes
    (which dominated the profile on text-density pages). Changes
    alternate white->black->white...; a trailing odd change keeps its
    run black to the row edge, which parity gives for free."""
    stride = columns + 1
    delta = (np.bincount(
        np.asarray(flat, dtype=np.int64), minlength=rows * stride
    ) & 1).astype(np.uint8)
    return np.bitwise_xor.accumulate(
        delta.reshape(rows, stride), axis=1
    )[:, :columns]


def decode_g4(data: bytes, columns: int, rows: int) -> np.ndarray:
    """T.6 decode -> ``(rows, columns)`` uint8 array, 1 = black.

    ``rows`` must be known by the caller (PDF ``/Rows``/``/Height``,
    TIFF ``ImageLength``) — decoding stops after exactly that many rows;
    a trailing EOFB, zero-fill or byte padding is ignored. Raises
    ``ValueError`` on invalid codes, runs overshooting the row width,
    2D extension/uncompressed escapes, or a truncated stream.
    """
    if columns <= 0 or rows <= 0:
        raise ValueError("CCITT decode needs positive columns and rows")
    win = _windows(data)
    pos = 0
    stride = columns + 1
    flat: list[int] = []
    ref: list[int] = []  # imaginary all-white line above the first row
    try:
        for y in range(rows):
            cur, pos = _decode_2d_row(win, pos, ref, columns)
            if cur:
                base = y * stride
                flat.extend(base + x for x in cur)
            ref = cur
    except IndexError as e:
        raise ValueError("CCITT bit-stream exhausted") from e
    return _paint(flat, rows, columns)


def decode_g3(data: bytes, columns: int, rows: int, k: int = 0,
              byte_align: bool = False) -> np.ndarray:
    """T.4 (Group 3) decode -> ``(rows, columns)`` uint8 array, 1 = black.

    ``k=0``: pure 1D MH rows; EOLs (with any fill) are tolerated before
    any row but not required — covers PDF ``/K 0`` streams with or
    without ``/EndOfLine`` and TIFF compression 3 with 1D ``T4Options``.
    ``k>0``: T.4 2D — every row is preceded by a REQUIRED EOL plus a
    1-bit tag (1 = the row is 1D-coded, 0 = 2D-coded against the line
    above); the first row must be 1D. ``byte_align`` starts each row
    (including its EOL, when present) on a byte boundary — TIFF
    compression 2 layout and PDF ``/EncodedByteAlign``. Trailing RTC /
    EOFB / padding after the last row is ignored, like
    :func:`decode_g4`.
    """
    if columns <= 0 or rows <= 0:
        raise ValueError("CCITT decode needs positive columns and rows")
    if k < 0:
        raise ValueError("decode_g3 handles K >= 0; K < 0 is decode_g4")
    win = _windows(data)
    nbits = len(win)
    pos = 0
    stride = columns + 1
    flat: list[int] = []
    ref: list[int] = []
    try:
        for y in range(rows):
            if byte_align:
                pos = (pos + 7) & ~7
            one_d = True
            if k > 0:
                p2 = _try_eol(win, pos, nbits)
                if p2 is None:
                    raise ValueError("T.4 2D row missing its EOL")
                pos = p2
                if pos >= nbits:
                    raise ValueError("CCITT bit-stream exhausted")
                one_d = _bit(win, pos) == 1
                pos += 1
                if y == 0 and not one_d:
                    raise ValueError("T.4 first row must be 1D-coded")
            else:
                # consume any run of EOLs (T.4-proper streams, leading
                # RTC-style padding); plain /K 0 data has none
                p2 = _try_eol(win, pos, nbits)
                while p2 is not None:
                    pos = p2
                    p2 = _try_eol(win, pos, nbits)
            if one_d:
                cur, pos = _decode_1d_row(win, pos, columns)
            else:
                cur, pos = _decode_2d_row(win, pos, ref, columns)
            if cur:
                base = y * stride
                flat.extend(base + x for x in cur)
            ref = cur
    except IndexError as e:
        raise ValueError("CCITT bit-stream exhausted") from e
    return _paint(flat, rows, columns)


# --------------------------------------------------------------------------
# encoder (fixtures / round-trip; same tables, independent control flow)
# --------------------------------------------------------------------------


def _encode_run(bits: list[str], run: int, white: bool) -> None:
    term = WHITE_TERM if white else BLACK_TERM
    makeup = {**(WHITE_MAKEUP if white else BLACK_MAKEUP), **COMMON_MAKEUP}
    while run >= 64:
        m = min(2560, run & ~63)
        while m not in makeup:  # pragma: no cover - all multiples exist
            m -= 64
        bits.append(makeup[m])
        run -= m
    bits.append(term[run])


def _changes(row: np.ndarray) -> list[int]:
    """Positions where the colour flips, starting from white at x=0."""
    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    pos = (d + 1).tolist()
    if row[0]:
        pos.insert(0, 0)
    return pos


def _encode_2d_row(bits: list, cur: list, ref: list, width: int) -> None:
    """2D-code one row's changes against ``ref`` (shared by T.6 and the
    2D rows of T.4 ``K>0``)."""
    a0 = -1
    color = 0
    i = 0  # index into cur of the next changing element right of a0
    while a0 < width:
        a1 = cur[i] if i < len(cur) else width
        b1, b2 = _b1_b2(ref, a0, color, width)
        if b2 < a1:
            bits.append(MODE_PASS)
            a0 = b2
            # a0 moved; cur index unchanged (a1 still right of a0)
        elif abs(a1 - b1) <= 3:
            bits.append(MODE_V[a1 - b1])
            a0 = a1
            color ^= 1
            i += 1
        else:
            a2 = cur[i + 1] if i + 1 < len(cur) else width
            start = a0 if a0 > 0 else 0
            bits.append(MODE_HORIZ)
            _encode_run(bits, a1 - start, white=color == 0)
            _encode_run(bits, a2 - a1, white=color != 0)
            a0 = a2
            i += 2


def _encode_1d_row(bits: list, cur: list, width: int) -> None:
    """MH-code one row from its canonical change list: alternating
    white/black run lengths summing to the row width."""
    prev = 0
    white = True
    for x in cur:
        _encode_run(bits, x - prev, white)
        prev = x
        white = not white
    if prev < width or not cur:
        _encode_run(bits, width - prev, white)


def _pack_bits_str(bits: list) -> bytes:
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def encode_g4(bitmap: np.ndarray) -> bytes:
    """T.6 encode of a ``(rows, cols)`` array (nonzero = black), EOFB
    terminated, zero-padded to a byte boundary."""
    if bitmap.ndim != 2 or bitmap.size == 0:
        raise ValueError("encode_g4 needs a non-empty 2-D bitmap")
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    rows, width = bm.shape
    bits: list[str] = []
    ref: list[int] = []
    for y in range(rows):
        cur = _changes(bm[y])
        _encode_2d_row(bits, cur, ref, width)
        ref = cur
    bits.append(EOFB)
    return _pack_bits_str(bits)


def encode_g3(bitmap: np.ndarray, k: int = 0,
              byte_align: bool = False, eols: bool | None = None) -> bytes:
    """T.4 (Group 3) encode of a ``(rows, cols)`` array (nonzero =
    black), fixture-grade like :func:`encode_g4`.

    ``k=0``: pure 1D MH rows; ``eols`` (default False) prefixes every
    row with an EOL as T.4-proper streams do. ``k>0``: every row gets
    EOL + tag bit, 1D on every k-th row and 2D in between (``eols`` is
    implied). ``byte_align`` pads each row start to a byte boundary —
    TIFF compression-2 layout (``k=0, eols=False``) or PDF
    ``/EncodedByteAlign``.
    """
    if bitmap.ndim != 2 or bitmap.size == 0:
        raise ValueError("encode_g3 needs a non-empty 2-D bitmap")
    if k < 0:
        raise ValueError("encode_g3 handles K >= 0; K < 0 is encode_g4")
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    rows, width = bm.shape
    if eols is None:
        eols = k > 0
    if k > 0 and not eols:
        raise ValueError("T.4 2D requires EOL tags")
    out: list[str] = []
    nbits = 0
    ref: list[int] = []
    for y in range(rows):
        bits: list[str] = []
        if byte_align and nbits % 8:
            bits.append("0" * (8 - nbits % 8))
        one_d = True
        if eols:
            bits.append(EOL)
            if k > 0:
                one_d = y % k == 0
                bits.append("1" if one_d else "0")
        cur = _changes(bm[y])
        if one_d:
            _encode_1d_row(bits, cur, width)
        else:
            _encode_2d_row(bits, cur, ref, width)
        ref = cur
        nbits += sum(len(b) for b in bits)
        out.extend(bits)
    return _pack_bits_str(out)
