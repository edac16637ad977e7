"""Pure-stdlib AVI (RIFF) container codec — the video leg of the
multimodal column family.

Video in a training corpus is an opaque ``binary`` column whose frames
are sampled, decoded and feature-extracted inside ``mapInPandas``
(SURVEY.md §"multimodal columns": decode / frame-sample as Pandas
UDFs). This module makes that path REAL for the two classic AVI video
stream formats that need no external codec:

* ``MJPG`` — motion JPEG: every ``00dc`` chunk is a standalone
  baseline/progressive JPEG, decoded by
  :mod:`ocr_platform_spark.jpegcodec`;
* ``DIB `` (``BI_RGB``) — uncompressed 24-bit bottom-up BGR frames in
  ``00db`` chunks, the raw-capture shape.

Single-video-stream AVIs only (the corpus interchange shape); audio
streams, OpenDML extensions (``AVIX`` riffs, ``indx``), and palettized
DIBs are out of subset and raise. The probe is header-only: chunk
bounds + per-frame structural validation (``validate_jpeg`` for MJPEG,
exact stride*height size for DIB) without inflating a sample byte —
the same shallow/deep economy as the image codecs.

Contract: every malformed / truncated / unsupported input raises
``ValueError`` — the distributed probe's quarantine path keys on it.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpegcodec
from .audiocodec import iter_riff as _chunks

#: per-frame pixel cap (matches the image codecs' allocation guard)
MAX_PIXELS = 1 << 28


def _u32(raw: bytes, off: int) -> int:
    return struct.unpack_from("<I", raw, off)[0]


def _parse(raw: bytes, deep: bool) -> dict:
    """Container walk -> plan dict with frame chunk table. ``deep``
    structurally validates every frame (marker walk / exact size);
    shallow checks chunk bounds only."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI magic")
    riff_size = _u32(raw, 4)
    if riff_size + 8 > len(raw):
        raise ValueError("AVI truncated: RIFF size exceeds payload")
    end = 8 + riff_size
    avih = None
    strh_vids = None
    strf = None
    frames: list[tuple[int, int, bytes]] = []
    for fourcc, off, size in _chunks(raw, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = raw[off:off + 4]
        if ltype == b"hdrl":
            for cc2, o2, s2 in _chunks(raw, off + 4, off + size):
                if cc2 == b"avih":
                    if s2 < 40:
                        raise ValueError("AVI avih header too short")
                    avih = struct.unpack_from("<10I", raw, o2)
                elif cc2 == b"LIST" and raw[o2:o2 + 4] == b"strl":
                    sh = sf = None
                    for cc3, o3, s3 in _chunks(raw, o2 + 4, o2 + s2):
                        if cc3 == b"strh" and s3 >= 48:
                            sh = (raw[o3:o3 + 4], raw[o3 + 4:o3 + 8])
                        elif cc3 == b"strf":
                            sf = (o3, s3)
                    if sh is not None and sh[0] == b"vids":
                        if strh_vids is not None:
                            raise ValueError(
                                "multiple video streams unsupported")
                        strh_vids, strf = sh, sf
        elif ltype == b"movi":
            for cc2, o2, s2 in _chunks(raw, off + 4, off + size):
                if cc2 in (b"00db", b"00dc"):
                    frames.append((o2, s2, cc2))
                elif cc2[2:] in (b"db", b"dc", b"wb"):
                    raise ValueError(
                        f"chunk {cc2!r}: only single-video-stream "
                        f"AVIs are supported")
    if avih is None:
        raise ValueError("AVI has no avih main header")
    if strh_vids is None or strf is None:
        raise ValueError("AVI has no video stream (strh 'vids' + strf)")
    w, h = avih[8], avih[9]
    if not (0 < w and 0 < h and w * h <= MAX_PIXELS):
        raise ValueError(f"AVI dimensions {w}x{h} out of range")
    sfo, sfs = strf
    if sfs < 40:
        raise ValueError("AVI strf BITMAPINFOHEADER too short")
    bw, bh = _u32(raw, sfo + 4), _u32(raw, sfo + 8)
    bits = struct.unpack_from("<H", raw, sfo + 14)[0]
    comp = raw[sfo + 16:sfo + 20]
    handler = strh_vids[1]
    if comp == b"MJPG" or handler == b"MJPG":
        codec = "mjpeg"
    elif comp == b"\x00\x00\x00\x00":  # BI_RGB
        if bits != 24:
            raise ValueError(
                f"DIB AVI must be 24-bit BI_RGB, got {bits}-bit")
        codec = "dib"
    else:
        raise ValueError(f"unsupported AVI video codec {comp!r}")
    if (bw, bh) != (w, h):
        raise ValueError("AVI strf dimensions disagree with avih")
    if avih[4] != len(frames):
        raise ValueError(
            f"AVI dwTotalFrames {avih[4]} != {len(frames)} movi "
            f"video chunks")
    if deep:
        stride = (w * 3 + 3) & ~3
        for o2, s2, cc2 in frames:
            if codec == "dib":
                if s2 != stride * h:
                    raise ValueError(
                        "DIB frame size != stride*height")
            else:
                fw, fh = jpegcodec.validate_jpeg(raw[o2:o2 + s2])
                if (fw, fh) != (w, h):
                    raise ValueError(
                        f"MJPEG frame {fw}x{fh} disagrees with "
                        f"container {w}x{h}")
    return dict(w=w, h=h, codec=codec, frames=frames,
                usec_per_frame=avih[0])


def probe_avi(raw: bytes, deep: bool = True) -> tuple[int, int, int]:
    """Header-only ``(n_frames, width, height)``. ``deep`` additionally
    validates every frame's structure (JPEG marker walk / DIB size)
    without inflating samples."""
    p = _parse(raw, deep)
    return len(p["frames"]), p["w"], p["h"]


def _decode_at(raw: bytes, p: dict, index: int) -> np.ndarray:
    off, size, _cc = p["frames"][index]
    w, h = p["w"], p["h"]
    if p["codec"] == "mjpeg":
        arr = jpegcodec.decode_jpeg(raw[off:off + size])
        if arr.shape[:2] != (h, w):
            raise ValueError("MJPEG frame dimensions disagree with "
                             "container")
        return arr
    stride = (w * 3 + 3) & ~3
    if size != stride * h:
        raise ValueError("DIB frame size != stride*height")
    rows = np.frombuffer(raw, np.uint8, stride * h, off)
    rows = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    # bottom-up BGR -> top-down RGB
    return rows[::-1, :, ::-1].copy()


def decode_frame(raw: bytes, index: int) -> np.ndarray:
    """One frame -> HxWx3 uint8 RGB."""
    p = _parse(raw, deep=False)
    if not 0 <= index < len(p["frames"]):
        raise ValueError(
            f"frame index {index} out of range "
            f"0..{len(p['frames']) - 1}")
    return _decode_at(raw, p, index)


def iter_frames(raw: bytes, every: int = 1):
    """``(index, HxWx3 RGB)`` for every ``every``-th frame — the
    frame-sampling consumer's shape: ONE container parse, frames
    decoded lazily so peak memory is a single frame."""
    if every < 1:
        raise ValueError("every must be >= 1")
    p = _parse(raw, deep=False)
    for i in range(0, len(p["frames"]), every):
        yield i, _decode_at(raw, p, i)


def encode_avi(frames: list[np.ndarray], fps: int = 10,
               codec: str = "dib") -> bytes:
    """Deterministic writer (tests / fixtures): equal-shape HxWx3 uint8
    RGB frames -> canonical single-stream AVI bytes."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, _ = frames[0].shape
    if codec == "dib":
        stride = (w * 3 + 3) & ~3
        cc, comp, handler = b"00db", b"\x00\x00\x00\x00", b"DIB "
        payloads = []
        for f in frames:
            if f.shape != (h, w, 3):
                raise ValueError("all frames must share one shape")
            row = np.zeros((h, stride), np.uint8)
            row[:, :w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            payloads.append(row.tobytes())
    elif codec == "mjpeg":
        cc, comp, handler = b"00dc", b"MJPG", b"MJPG"
        payloads = [jpegcodec.encode_jpeg(f) for f in frames]
    else:
        raise ValueError(f"unsupported encode codec {codec!r}")
    movi = b"movi"
    for p in payloads:
        movi += cc + struct.pack("<I", len(p)) + p
        if len(p) & 1:
            movi += b"\x00"
    bufsize = max(len(p) for p in payloads)
    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, bufsize,
        w, h) + b"\x00" * 16
    strh = (b"vids" + handler
            + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), bufsize, -1, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, comp,
                       len(payloads[0]), 0, 0, 0, 0)
    strl = (b"strl"
            + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    hdrl = (b"hdrl"
            + b"avih" + struct.pack("<I", len(avih)) + avih
            + b"LIST" + struct.pack("<I", len(strl)) + strl)
    body = (b"AVI "
            + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
            + b"LIST" + struct.pack("<I", len(movi)) + movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body
