"""Pure-stdlib byte-stream codecs shared by the PDF and TIFF containers:
LZW (PDF ``/LZWDecode``, TIFF compression 5), PackBits (TIFF 32773) and
its PDF sibling ``/RunLengthDecode``, and the two ASCII armor filters
(``/ASCIIHexDecode``, ``/ASCII85Decode``).

These close the wild-corpus gap left after Flate/DCT/CCITT: pre-2000
scanner output overwhelmingly ships TIFF-LZW and PackBits, and legacy
PDF producers (Distiller 3.x era, fax gateways) emit LZW and ASCII85
streams that the reference stack decodes through PIL/pdfium
(reference analog: ``libs/ocr_core/ocr_tasks.py:54-55`` decodes whatever
``Image.open`` dispatches). Encoders are fixture-grade: they exist so
tests can round-trip and so Java ImageIO can cross-validate the TIFF
wrappers bit-exactly (see tests/test_compression.py).

Every decoder raises :class:`ValueError` on malformed input — the same
strict contract as pdfcodec/tiffcodec, so adversarial payloads quarantine
instead of crashing executors — and caps its output size (``max_out``)
because LZW and RLE amplify: a 4 KiB adversarial LZW stream can legally
inflate ~3600x, so callers decoding untrusted bytes must bound it.
"""

from __future__ import annotations

import numpy as np

#: default decoder output cap — generous for scanned-page strips (a full
#: RGB A4 page at 300 DPI is ~25 MiB) while bounding adversarial blowup
MAX_OUT = 1 << 28  # 256 MiB

_CLEAR = 256
_EOD = 257


def decode_lzw(data: bytes, early_change: int = 1,
               max_out: int = MAX_OUT) -> bytes:
    """LZW decode (PDF 7.4.4 / TIFF 6.0 §13): MSB-first variable-width
    codes, 9..12 bits, Clear=256, EOD=257.

    ``early_change=1`` (both formats' default) bumps the code width one
    entry before the table would overflow the current width; TIFF LZW is
    always early-change, PDF exposes it as ``/DecodeParms /EarlyChange``.
    A missing EOD at end-of-stream is tolerated (real TIFF strips often
    end at the byte boundary without one); a code past the table, a
    width overflow, or output past ``max_out`` raise ``ValueError``.
    """
    if early_change not in (0, 1):
        raise ValueError(f"LZW EarlyChange must be 0 or 1, got {early_change}")

    def _prebump_eod_tail(acc: int, rem: int, width: int) -> bool:
        # ``rem`` unconsumed bits remain at end-of-data; True iff they read
        # as EOD at the PRE-bump width (width - 1) followed only by the
        # 0-7 zero bits of byte padding — the ImageIO writer quirk.
        pw = width - 1
        pad = rem - pw
        if pw < 9 or pad < 0 or pad > 7:
            return False
        bits = acc & ((1 << rem) - 1)
        return (bits >> pad) == _EOD and (bits & ((1 << pad) - 1)) == 0

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    full = False
    acc = nbits = 0
    pos, n = 0, len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # trailing zero-fill to the byte boundary is legal
                # padding; any set bit is a truncated real code —
                # EXCEPT a terminator written at the pre-bump width:
                # Java ImageIO's TIFF writer flushes EOD without
                # applying the width bump its final table entry just
                # triggered (observed when the table hits 511 exactly
                # at end of data, e.g. high-entropy 16x16 tiles), so a
                # short tail that reads exactly as EOD is end-of-stream
                tail = acc & ((1 << nbits) - 1)
                if tail == _EOD and nbits >= 9:
                    return bytes(out)
                if tail:
                    raise ValueError("LZW stream ends mid-code")
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            full = False
            continue
        if code == _EOD:
            return bytes(out)
        if full:
            # the encoder is REQUIRED to emit Clear once the table fills;
            # a data code here would be undecodable
            raise ValueError("LZW table overflow without Clear code")
        if prev is None:
            if not table:
                # stream must open with Clear before any data code
                table = [bytes([i]) for i in range(256)] + [b"", b""]
            if code >= 256:
                raise ValueError(f"LZW first code {code} is not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK case
            elif pos >= n and _prebump_eod_tail(acc, nbits + width, width):
                # the ImageIO pre-bump EOD (see the refill-loop comment)
                # with 1-7 zero pad bits: the full-width read yields
                # EOD << pad, an over-table code.  Accept it only here,
                # where the full-width interpretation would raise anyway,
                # so a legitimate data code can never be shadowed.
                return bytes(out)
            else:
                raise ValueError(
                    f"LZW code {code} past table size {len(table)}"
                )
            table.append(prev + entry[:1])
        out += entry
        if len(out) > max_out:
            raise ValueError(f"LZW output exceeds cap {max_out}")
        prev = entry
        if len(table) + early_change >= (1 << width):
            if width < 12:
                width += 1
            else:
                full = True


def encode_lzw(data: bytes, early_change: int = 1) -> bytes:
    """Fixture-grade LZW encoder (greedy longest-match, Clear at table
    capacity), byte-exact decodable by :func:`decode_lzw`, PIL, and Java
    ImageIO's TIFF plugin."""
    if early_change not in (0, 1):
        raise ValueError(f"LZW EarlyChange must be 0 or 1, got {early_change}")
    bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width = 9
    bits.append((_CLEAR, width))
    nxt = 258
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        table[w + c] = nxt
        nxt += 1
        # lockstep with decode_lzw: the decoder learns each entry one
        # code later than the encoder assigns it, so its table size at
        # the same stream position is nxt - 1 — the width schedule must
        # test that, not nxt (pinned externally: ImageIO TIFF-LZW both
        # decodes our output and is decoded by ours, bit-exact)
        if nxt - 1 + early_change >= (1 << width):
            if width < 12:
                width += 1
            else:
                bits.append((_CLEAR, width))
                table = {bytes([j]): j for j in range(256)}
                width = 9
                nxt = 258
        w = c
    if w:
        bits.append((table[w], width))
        # the decoder still ADDS a table entry for this final code; if
        # that lands on a width-bump boundary it reads EOD at the wider
        # width, so the encoder must follow the same schedule here
        nxt += 1
        if nxt - 1 + early_change >= (1 << width) and width < 12:
            width += 1
    bits.append((_EOD, width))
    acc = nbits = 0
    out = bytearray()
    for code, cw in bits:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_packbits(data: bytes, expected: int | None = None,
                    max_out: int = MAX_OUT) -> bytes:
    """Apple PackBits decode (TIFF 6.0 §9): control byte n as signed —
    0..127 copies the next n+1 literal bytes, -1..-127 repeats the next
    byte 1-n times, -128 is a no-op. Decodes the whole buffer; TIFF
    strips carry no EOD marker. ``expected`` (the strip's decoded size)
    is enforced exactly when given."""
    out = bytearray()
    cap = min(max_out, expected) if expected is not None else max_out
    pos, n = 0, len(data)
    while pos < n:
        ctl = data[pos]
        pos += 1
        if ctl == 128:
            continue
        if ctl < 128:
            end = pos + ctl + 1
            if end > n:
                raise ValueError("PackBits literal run past end of data")
            out += data[pos:end]
            pos = end
        else:
            if pos >= n:
                raise ValueError("PackBits repeat run missing its byte")
            out += data[pos:pos + 1] * (257 - ctl)
            pos += 1
        if len(out) > cap:
            raise ValueError(
                f"PackBits output exceeds {'strip size' if expected is not None else 'cap'} {cap}"
            )
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"PackBits strip decoded to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def encode_packbits(data: bytes) -> bytes:
    """Fixture-grade PackBits encoder (runs >= 3 become repeats, like
    TIFF writers in the wild; never emits the -128 no-op)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + run
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def decode_rle_pdf(data: bytes, max_out: int = MAX_OUT) -> bytes:
    """PDF ``/RunLengthDecode`` (PDF 7.4.5): like PackBits but length
    byte 128 is EOD (not a no-op) and 129..255 repeats the next byte
    257-length times. A stream ending cleanly at a run boundary without
    the EOD byte is tolerated (several real producers omit it)."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        ln = data[pos]
        pos += 1
        if ln == 128:
            return bytes(out)
        if ln < 128:
            end = pos + ln + 1
            if end > n:
                raise ValueError("RunLengthDecode literal past end of data")
            out += data[pos:end]
            pos = end
        else:
            if pos >= n:
                raise ValueError("RunLengthDecode repeat missing its byte")
            out += data[pos:pos + 1] * (257 - ln)
            pos += 1
        if len(out) > max_out:
            raise ValueError(f"RunLengthDecode output exceeds cap {max_out}")
    return bytes(out)


def encode_rle_pdf(data: bytes) -> bytes:
    """PackBits encoding with the PDF EOD byte appended."""
    return encode_packbits(data) + b"\x80"


_HEX = {**{ord("0") + i: i for i in range(10)},
        **{ord("a") + i: 10 + i for i in range(6)},
        **{ord("A") + i: 10 + i for i in range(6)}}
_WS = frozenset(b"\x00\t\n\x0c\r ")


def decode_ascii_hex(data: bytes) -> bytes:
    """PDF ``/ASCIIHexDecode`` (PDF 7.4.2): hex pairs, PDF whitespace
    ignored, ``>`` is EOD (optional at end-of-buffer), an odd trailing
    digit is padded with 0."""
    out = bytearray()
    hi = -1
    for b in data:
        if b in _WS:
            continue
        if b == 0x3E:  # '>'
            break
        v = _HEX.get(b)
        if v is None:
            raise ValueError(f"invalid ASCIIHex byte {b:#04x}")
        if hi < 0:
            hi = v
        else:
            out.append((hi << 4) | v)
            hi = -1
    if hi >= 0:
        out.append(hi << 4)
    return bytes(out)


def encode_ascii_hex(data: bytes) -> bytes:
    return data.hex().encode() + b">"


def decode_ascii85(data: bytes) -> bytes:
    """PDF ``/ASCII85Decode`` (PDF 7.4.3): base-85 groups ``!``..``u``,
    ``z`` for an all-zero group (only between groups), ``~>`` EOD, PDF
    whitespace ignored, a final partial group of 2-4 chars emits its
    leading bytes. A lone trailing char, ``z`` mid-group, a group value
    past 2^32, or garbage characters raise ``ValueError``."""
    out = bytearray()
    group: list[int] = []
    pos, n = 0, len(data)
    while pos < n:
        b = data[pos]
        pos += 1
        if b in _WS:
            continue
        if b == 0x7E:  # '~'
            if pos < n and data[pos] != 0x3E:
                raise ValueError("ASCII85 '~' not followed by '>'")
            break
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= b <= 0x75:
            raise ValueError(f"invalid ASCII85 byte {b:#04x}")
        group.append(b - 0x21)
        if len(group) == 5:
            v = 0
            for d in group:
                v = v * 85 + d
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85 group exceeds 2^32")
            out += v.to_bytes(4, "big")
            group.clear()
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85 partial group of one character")
        k = len(group)
        padded = group + [84] * (5 - k)  # pad with 'u'
        v = 0
        for d in padded:
            v = v * 85 + d
        if v > 0xFFFFFFFF:
            raise ValueError("ASCII85 group exceeds 2^32")
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def encode_ascii85(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        k = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - k), "big")
        if v == 0 and k == 4:
            out.append(0x7A)
            continue
        digs = []
        for _ in range(5):
            digs.append(v % 85)
            v //= 85
        out += bytes(0x21 + d for d in reversed(digs))[: k + 1]
    return bytes(out) + b"~>"


def unpack_subbyte_rows(data: bytes, w: int, h: int, bpc: int,
                        what: str = "image") -> "np.ndarray":
    """Row-padded sub-byte samples -> ``(h, w)`` int array.

    The shared bit layout of PDF sample data and TIFF strips: 1/2/4-bit
    samples, MSB-first within each byte, every row padded to a byte
    boundary. Used by the PDF Indexed/gray paths and the TIFF 4-bit
    gray path so the bounds/truncation handling lives once."""
    if bpc not in (1, 2, 4):
        raise ValueError(f"sub-byte unpack needs bpc 1/2/4, got {bpc}")
    stride = (w * bpc + 7) // 8
    need = stride * h
    if len(data) < need:
        raise ValueError(f"truncated {what} samples")
    bits = np.unpackbits(
        np.frombuffer(data[:need], np.uint8).reshape(h, stride),
        axis=1)[:, :w * bpc]
    if bpc == 1:
        return bits
    weights = 1 << np.arange(bpc - 1, -1, -1)
    return (bits.reshape(h, w, bpc) * weights).sum(axis=2)
