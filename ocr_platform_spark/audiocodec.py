"""Pure-stdlib WAV (RIFF/WAVE) codec — the audio leg of the multimodal
column family.

A 100 TB training corpus carries audio the same way it carries images:
an opaque ``binary`` column riding next to typed metadata
(SURVEY.md §"multimodal columns"). The reference platform has no audio
path — this module exists for the same corpus-scale reason the real
image codecs do: the dominant uncompressed interchange format must
probe (header-only), decode, and feature-extract inside Arrow-batched
``mapInPandas`` without any optional dependency.

Supported subset (the interchange shapes that actually occur):

* ``fmt`` code 1 (integer PCM) at 8 (unsigned) / 16 / 24 / 32-bit;
* ``fmt`` code 3 (IEEE float) at 32 / 64-bit;
* ``fmt`` code 0xFFFE (WAVE_FORMAT_EXTENSIBLE) wrapping either of the
  above via its SubFormat GUID;
* any channel count 1..64, any rate 1..2^31-1; chunk walk skips
  unknown chunks (LIST/INFO, fact, cue) with RIFF even-padding.

Decode normalizes to float64 in [-1, 1): ``u8 -> (x-128)/128``,
``i16 -> x/2^15``, ``i24 -> x/2^23``, ``i32 -> x/2^31``, floats as
stored — the conventional symmetric-divisor rule, exact for
integer-born samples so an encode->decode round trip of
``k / 2^(bits-1)`` amplitudes is lossless (the correctness lever the
oracle-backed feature queries stand on).

Contract: every malformed / truncated / unsupported input raises
``ValueError`` — the distributed probe's quarantine path keys on it.
A decode whose declared sample count exceeds :data:`MAX_SAMPLES`
raises too (the pixel-cap analog: adversarial headers must not size
allocations).
"""

from __future__ import annotations

import struct

import numpy as np

#: decode allocation cap: frames x channels (512 MiB of float64)
MAX_SAMPLES = 1 << 26

_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE

# WAVE_FORMAT_EXTENSIBLE SubFormat GUIDs (first 2 bytes carry the code,
# the 14-byte tail is fixed)
_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")

#: (numpy dtype, zero offset, divisor) per (fmt, bits)
_LAYOUTS = {
    (_FMT_PCM, 8): ("u1", 128.0, 128.0),
    (_FMT_PCM, 16): ("<i2", 0.0, float(1 << 15)),
    (_FMT_PCM, 24): (None, 0.0, float(1 << 23)),  # 3-byte, hand-packed
    (_FMT_PCM, 32): ("<i4", 0.0, float(1 << 31)),
    (_FMT_FLOAT, 32): ("<f4", 0.0, 1.0),
    (_FMT_FLOAT, 64): ("<f8", 0.0, 1.0),
}


def iter_riff(raw: bytes, off: int, end: int):
    """Walk a RIFF chunk run in ``raw[off:end]`` ->
    ``(fourcc, payload_offset, size)``. Sizes are validated against the
    span; odd sizes advance by the spec's pad byte. The ONE
    bounds-checked RIFF walker — :mod:`.avicodec` shares it."""
    while off + 8 <= end:
        fourcc = raw[off:off + 4]
        size = struct.unpack_from("<I", raw, off + 4)[0]
        if off + 8 + size > end:
            raise ValueError(
                f"RIFF truncated inside {fourcc!r} chunk")
        yield fourcc, off + 8, size
        off += 8 + size + (size & 1)


def _chunks(raw: bytes):
    """WAV-form chunk walk: RIFF/WAVE magic + size validation, then
    :func:`iter_riff` over the chunk run."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    riff_size = struct.unpack_from("<I", raw, 4)[0]
    # the RIFF size field covers 'WAVE' + chunks; tolerate trailing
    # garbage after it (common in the wild) but never a SHORT payload
    if riff_size + 8 > len(raw):
        raise ValueError("WAV truncated: RIFF size exceeds payload")
    yield from iter_riff(raw, 12, 8 + riff_size)


def _parse(raw: bytes) -> dict:
    """Header walk -> plan dict; never touches sample bytes."""
    fmt = None
    data = None
    for fourcc, off, size in _chunks(raw):
        if fourcc == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("WAV fmt chunk shorter than 16 bytes")
            code, channels, rate, _br, block, bits = struct.unpack_from(
                "<HHIIHH", raw, off)
            if code == _FMT_EXTENSIBLE:
                if size < 40:
                    raise ValueError(
                        "WAVE_FORMAT_EXTENSIBLE fmt chunk shorter "
                        "than 40 bytes")
                guid = raw[off + 24:off + 40]
                if guid[2:] != _GUID_TAIL:
                    raise ValueError("unsupported SubFormat GUID")
                code = struct.unpack_from("<H", guid)[0]
                # valid bits per sample may be narrower than the
                # container width; the container width drives layout
            fmt = dict(code=code, channels=channels, rate=rate,
                       block=block, bits=bits)
        elif fourcc == b"data" and data is None:
            data = (off, size)
    if fmt is None:
        raise ValueError("WAV has no fmt chunk")
    if data is None:
        raise ValueError("WAV has no data chunk")
    if (fmt["code"], fmt["bits"]) not in _LAYOUTS:
        raise ValueError(
            f"unsupported WAV layout: fmt code {fmt['code']}, "
            f"{fmt['bits']}-bit")
    if not 1 <= fmt["channels"] <= 64:
        raise ValueError(f"unsupported channel count {fmt['channels']}")
    if not 1 <= fmt["rate"] <= 0x7FFFFFFF:
        raise ValueError(
            f"WAV sample rate {fmt['rate']} outside 1..2^31-1")
    expect_block = fmt["channels"] * (fmt["bits"] // 8)
    if fmt["block"] != expect_block:
        raise ValueError(
            f"WAV block align {fmt['block']} != "
            f"channels*bytes {expect_block}")
    off, size = data
    if size % expect_block:
        raise ValueError("WAV data size is not a whole frame count")
    fmt["data_off"] = off
    fmt["n_frames"] = size // expect_block
    return fmt


def probe_wav(raw: bytes) -> tuple[int, int, int, int]:
    """Header-only ``(n_frames, rate, channels, bits)`` — the metadata
    pass: full chunk-walk validation, zero sample bytes touched."""
    p = _parse(raw)
    return p["n_frames"], p["rate"], p["channels"], p["bits"]


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """``(rate, samples)`` with samples float64 ``(n_frames, channels)``
    normalized to [-1, 1) per the module rule."""
    p = _parse(raw)
    n, ch = p["n_frames"], p["channels"]
    if n * ch > MAX_SAMPLES:
        raise ValueError(
            f"WAV exceeds {MAX_SAMPLES}-sample decode cap")
    off = p["data_off"]
    dt, zero, div = _LAYOUTS[(p["code"], p["bits"])]
    if dt is None:  # 24-bit: widen 3-byte little-endian to i4
        b = np.frombuffer(raw, np.uint8, n * ch * 3, off)
        b = b.reshape(-1, 3)
        x = (b[:, 0].astype(np.int32)
             | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
    else:
        x = np.frombuffer(raw, dt, n * ch, off).astype(np.float64)
    x = (x - zero) / div
    return p["rate"], x.reshape(n, ch)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16,
               fmt: int = _FMT_PCM) -> bytes:
    """Deterministic writer (tests / fixtures): float samples in
    [-1, 1) -> canonical RIFF/WAVE bytes. Integer targets quantize by
    the same symmetric divisor the decoder divides by (round half away
    from zero), so ``k/divisor`` inputs round-trip exactly."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n_frames,) or (n, channels)")
    n, ch = s.shape
    if (fmt, bits) not in _LAYOUTS:
        raise ValueError(f"unsupported encode layout ({fmt}, {bits})")
    dt, zero, div = _LAYOUTS[(fmt, bits)]
    if fmt == _FMT_PCM:
        hi = div - 1
        x = s * div
        # round half away from zero: sign * floor(|x| + 0.5) — exact
        # for integer-valued x (the naive floor(x - 0.5) form would
        # drop exact negative integers by one)
        q = np.clip(np.sign(x) * np.floor(np.abs(x) + 0.5),
                    -div, hi) + zero
        if bits == 24:
            x = q.astype(np.int32).reshape(-1)
            body = np.empty((x.size, 3), np.uint8)
            u = np.where(x < 0, x + (1 << 24), x).astype(np.uint32)
            body[:, 0] = u & 0xFF
            body[:, 1] = (u >> 8) & 0xFF
            body[:, 2] = (u >> 16) & 0xFF
            data = body.tobytes()
        else:
            data = q.astype(dt).tobytes()
    else:
        data = s.astype(dt).tobytes()
    block = ch * (bits // 8)
    if not 1 <= rate <= 0x7FFFFFFF or rate * block > 0xFFFFFFFF:
        raise ValueError(
            f"sample rate {rate} (byte rate {rate * block}) does not "
            f"fit the WAV header fields")
    hdr = struct.pack("<HHIIHH", fmt, ch, rate, rate * block, block,
                      bits)
    chunks = b"".join((
        b"fmt ", struct.pack("<I", len(hdr)), hdr,
        b"data", struct.pack("<I", len(data)), data,
        b"\x00" if len(data) & 1 else b"",
    ))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
