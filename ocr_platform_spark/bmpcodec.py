"""Pure-stdlib BMP codec (the uncompressed-desktop long-tail format:
clipboard dumps, MS-Office pastes, legacy scanner software).

The reference opens every raster through PIL ``Image.open(...)
.convert("RGB")`` (``libs/ocr_core/.../ocr_tasks.py:54-55``), which
covers BMP via ``BmpImagePlugin``; this module re-expresses that decode
with ``struct`` + ``numpy`` only, with PIL parity pinned by tests:

* ``BITMAPCOREHEADER`` (12) and ``BITMAPINFOHEADER``-family (40 / 52 /
  56 / 64 / 108 / 124) DIB headers;
* 1 / 4 / 8-bit palettized (BGRX entries, BGR for the core header),
  16-bit ``BI_RGB`` (X555) and ``BI_BITFIELDS`` (555 / 565 / any
  contiguous masks up to 8 bits, expanded by PIL-style bit
  replication), 24-bit BGR, 32-bit BGRX / 8888 bitfields;
* ``BI_RLE8`` / ``BI_RLE4`` with the end-of-line / end-of-bitmap /
  delta escapes and word-aligned absolute runs (undefined skipped
  pixels read as palette index 0, PIL's zero-initialized canvas);
* bottom-up rows by default, top-down via negative height (refused for
  RLE, where the spec defines no top-down form).

Contract: every malformed / truncated / unsupported input raises
``ValueError`` — the distributed probe's quarantine path keys on it.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 1 << 28

_HDR_SIZES = (12, 40, 52, 56, 64, 108, 124)


def _u16(raw: bytes, off: int) -> int:
    return struct.unpack_from("<H", raw, off)[0]


def _u32(raw: bytes, off: int) -> int:
    return struct.unpack_from("<I", raw, off)[0]


def _i32(raw: bytes, off: int) -> int:
    return struct.unpack_from("<i", raw, off)[0]


def _parse_header(raw: bytes) -> dict:
    """File + DIB headers -> a plan dict; raises on anything outside the
    supported subset WITHOUT touching pixel data."""
    if len(raw) < 26 or raw[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    data_off = _u32(raw, 10)
    hdr = _u32(raw, 14)
    if hdr not in _HDR_SIZES:
        raise ValueError(f"unsupported BMP DIB header size {hdr}")
    if len(raw) < 14 + hdr:
        raise ValueError("BMP truncated inside the DIB header")
    if hdr == 12:  # BITMAPCOREHEADER: 16-bit dims, 3-byte palette entries
        w, h = _u16(raw, 18), _u16(raw, 20)
        bpp = _u16(raw, 24)
        comp, clr_used, topdown = 0, 0, False
    else:
        w, h = _i32(raw, 18), _i32(raw, 22)
        topdown = h < 0
        h = abs(h)
        bpp = _u16(raw, 28)
        comp = _u32(raw, 30)
        clr_used = _u32(raw, 46)
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"BMP dimensions {w}x{h} out of range")
    masks = None
    if comp == 3:  # BI_BITFIELDS
        if bpp not in (16, 32):
            raise ValueError(f"BI_BITFIELDS with {bpp} bpp unsupported")
        # masks live at byte 54 in every layout: appended after a
        # 40-byte header, embedded in the header for 52+
        if len(raw) < 66:
            raise ValueError("BMP truncated before the bitfield masks")
        masks = struct.unpack_from("<III", raw, 54)
        for mask in masks:  # header-level: probe and decode both refuse
            _mask_shift(mask)
    elif comp == 0:
        if bpp not in (1, 4, 8, 16, 24, 32):
            raise ValueError(f"unsupported BMP bit depth {bpp}")
    elif comp == 1:
        if bpp != 8:
            raise ValueError("BI_RLE8 requires 8 bpp")
    elif comp == 2:
        if bpp != 4:
            raise ValueError("BI_RLE4 requires 4 bpp")
    else:
        raise ValueError(f"unsupported BMP compression {comp}")
    if topdown and comp in (1, 2):
        raise ValueError("top-down RLE BMP is not defined")
    pal = None
    if bpp <= 8:
        n_entries = clr_used or (1 << bpp)
        if n_entries > (1 << bpp):
            raise ValueError(f"BMP palette size {n_entries} exceeds 2^bpp")
        entry = 3 if hdr == 12 else 4
        pal_off = 14 + hdr + (12 if (comp == 3 and hdr == 40) else 0)
        need = pal_off + n_entries * entry
        if len(raw) < need:
            raise ValueError("BMP truncated inside the palette")
        table = np.frombuffer(raw[pal_off:need], np.uint8)
        pal = table.reshape(-1, entry)[:, 2::-1].copy()  # BGR(X) -> RGB
    if data_off > len(raw) or data_off < 14 + hdr:
        raise ValueError("BMP pixel-data offset out of bounds")
    return {"w": w, "h": h, "bpp": bpp, "comp": comp, "masks": masks,
            "pal": pal, "data_off": data_off, "topdown": topdown}


def validate_bmp(raw: bytes) -> tuple[int, int]:
    """Structural pre-flight -> ``(w, h)``: header/palette/mask bounds
    plus a full pixel-data size check (uncompressed) or an RLE opcode
    walk WITHOUT painting — so truncated payloads quarantine at probe
    time; BMP carries no checksum, so that is also decode-complete."""
    p = _parse_header(raw)
    if p["comp"] in (1, 2):
        _run_rle(raw[p["data_off"]:], p["w"], p["h"],
                 nibbles=p["comp"] == 2, out=None)
    else:
        stride = ((p["w"] * p["bpp"] + 31) // 32) * 4
        if p["data_off"] + stride * p["h"] > len(raw):
            raise ValueError("BMP truncated inside the pixel data")
    return p["w"], p["h"]


def _expand_bits(v: np.ndarray, n: int) -> np.ndarray:
    """n-bit channel -> 8-bit by PIL's bit replication (Unpack.c
    ImagingUnpackBGR15/16: ``v << (8-n) | v >> (2n-8)``)."""
    hi = v << (8 - n)
    return (hi | (hi >> n)).astype(np.uint8)


def _run_rle(data: bytes, w: int, h: int, nibbles: bool,
             out: np.ndarray | None) -> None:
    """Shared RLE8/RLE4 opcode walk; paints palette indices into ``out``
    (bottom-up row order) when given, else only validates bounds."""
    x = y = 0
    i, n = 0, len(data)
    while True:
        if i + 2 > n:
            raise ValueError("RLE BMP ends without an end-of-bitmap code")
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run: cnt pixels of val (nibble-alternating)
            if y >= h or x + cnt > w:
                raise ValueError("RLE run overflows the bitmap bounds")
            if out is not None:
                row = h - 1 - y
                if nibbles:
                    pair = np.array([val >> 4, val & 15], np.uint8)
                    out[row, x:x + cnt] = np.tile(pair, (cnt + 1) // 2)[:cnt]
                else:
                    out[row, x:x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return
        elif val == 2:  # delta: skipped pixels stay index 0
            if i + 2 > n:
                raise ValueError("RLE delta escape truncated")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("RLE delta overflows the bitmap bounds")
        else:  # absolute run of `val` raw pixels, word-aligned
            cnt = val
            if y >= h or x + cnt > w:
                raise ValueError("RLE absolute run overflows the bitmap")
            nbytes = ((cnt + 1) // 2 if nibbles else cnt)
            nbytes += nbytes & 1  # pad to a 16-bit boundary
            if i + nbytes > n:
                raise ValueError("RLE absolute run truncated")
            if out is not None:
                row = h - 1 - y
                chunk = np.frombuffer(data, np.uint8, nbytes, i)
                if nibbles:
                    nib = np.empty(nbytes * 2, np.uint8)
                    nib[0::2] = chunk >> 4
                    nib[1::2] = chunk & 15
                    out[row, x:x + cnt] = nib[:cnt]
                else:
                    out[row, x:x + cnt] = chunk[:cnt]
            i += nbytes
            x += cnt


def _mask_shift(mask: int) -> tuple[int, int]:
    """Contiguous bitmask -> (shift, width); rejects gappy/oversized."""
    if mask == 0:
        raise ValueError("zero BMP channel mask")
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    if (mask >> shift) != (1 << width) - 1:
        raise ValueError(f"non-contiguous BMP channel mask {mask:#x}")
    if width > 8:
        raise ValueError(f"BMP channel mask wider than 8 bits: {mask:#x}")
    return shift, width


def decode_bmp(raw: bytes) -> np.ndarray:
    """BMP bytes -> HxWx3 uint8 RGB (PIL ``convert("RGB")`` parity)."""
    try:
        return _decode_bmp(raw)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or malformed BMP: {e}") from e


def _decode_bmp(raw: bytes) -> np.ndarray:
    p = _parse_header(raw)
    w, h, bpp = p["w"], p["h"], p["bpp"]
    data = raw[p["data_off"]:]
    if p["comp"] in (1, 2):
        idx = np.zeros((h, w), np.uint8)
        _run_rle(data, w, h, nibbles=p["comp"] == 2, out=idx)
        return _palettize(idx, p["pal"])
    stride = ((w * bpp + 31) // 32) * 4
    if stride * h > len(data):
        raise ValueError("BMP truncated inside the pixel data")
    rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
    if not p["topdown"]:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR -> RGB
    if bpp == 32:
        px = np.ascontiguousarray(rows[:, :w * 4]).reshape(h, w, 4)
        if p["masks"] is not None:
            # explicit little-endian: a native view would byte-swap
            # every pixel on big-endian hosts
            return _apply_masks(
                px.view(np.dtype("<u4")).reshape(h, w), p["masks"])
        return px[:, :, 2::-1].copy()  # BGRX -> RGB
    if bpp == 16:
        px = np.ascontiguousarray(
            rows[:, :w * 2]).view(np.dtype("<u2")).reshape(h, w)
        masks = p["masks"] or (0x7C00, 0x03E0, 0x001F)  # BI_RGB: X555
        return _apply_masks(px, masks)
    if bpp == 8:
        return _palettize(rows[:, :w], p["pal"])
    if bpp == 4:
        nib = np.empty((h, stride * 2), np.uint8)
        nib[:, 0::2] = rows >> 4
        nib[:, 1::2] = rows & 15
        return _palettize(nib[:, :w], p["pal"])
    # bpp == 1
    bits = np.unpackbits(rows, axis=1)[:, :w]
    return _palettize(bits, p["pal"])


def _palettize(idx: np.ndarray, pal: np.ndarray) -> np.ndarray:
    if idx.size and int(idx.max()) >= len(pal):
        raise ValueError("BMP sample exceeds the palette size")
    return pal[idx]


def _apply_masks(px: np.ndarray, masks) -> np.ndarray:
    chans = []
    for mask in masks:
        shift, width = _mask_shift(int(mask))
        chans.append(_expand_bits((px >> shift) & ((1 << width) - 1),
                                  width))
    return np.stack(chans, axis=-1)


# --------------------------------------------------------------------------
# encoder (fixtures + sinks: 24-bit BI_RGB, 8-bit gray palette, BI_RLE8)
# --------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray, rle: bool = False,
               topdown: bool = False) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit ``BI_RGB`` BMP, or HxW uint8 gray ->
    8-bit BMP over the identity gray palette (``BI_RLE8`` when ``rle``,
    encoded-run + end-of-line opcodes only — every decoder-visible
    opcode family is exercised by hand-built fixtures in tests)."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_bmp expects HxWx3 RGB or HxW gray uint8")
    h, w = arr.shape[:2]
    if arr.ndim == 3:
        if arr.shape[2] != 3:
            raise ValueError("encode_bmp expects 3 channels for color")
        if rle:
            raise ValueError("BI_RLE8 requires 8-bit palettized input")
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = arr[:, :, ::-1].reshape(h, w * 3)
        if not topdown:
            rows = rows[::-1]
        return _wrap(rows.tobytes(), w, h, 24, 0, b"", topdown)
    pal = bytes(b for v in range(256) for b in (v, v, v, 0))  # BGRX ramp
    if not rle:
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = arr
        if not topdown:
            rows = rows[::-1]
        return _wrap(rows.tobytes(), w, h, 8, 0, pal, topdown)
    if topdown:
        raise ValueError("top-down RLE BMP is not defined")
    out = bytearray()
    for row in arr[::-1]:
        j = 0
        while j < w:
            v = row[j]
            run = 1
            while j + run < w and row[j + run] == v and run < 255:
                run += 1
            out += bytes((run, int(v)))
            j += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return _wrap(bytes(out), w, h, 8, 1, pal, False)


def _wrap(pixels: bytes, w: int, h: int, bpp: int, comp: int,
          pal: bytes, topdown: bool) -> bytes:
    data_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h, 1,
                       bpp, comp, len(pixels), 2835, 2835,
                       len(pal) // 4, 0)
    head = struct.pack("<2sIHHI", b"BM", data_off + len(pixels), 0, 0,
                       data_off)
    return head + info + pal + pixels
