"""gifcodec: pure-stdlib GIF container + LSB-first LZW.

Pins the GIF flavor of LZW (LSB-first bit packing, palette-depth roots,
width bump at table size 2^width with NO early change, deferred clear),
the block grammar (extensions skipped, truncation/transparency/partial
frames quarantined), interlacing, palette→luma equivalence, frame
slicing for the distributed bucket explode, Java ImageIO parity in BOTH
directions (GIF is LZW-lossless over an explicit palette, so the pins
are bit-exact), and span-sequence equality through the distributed
pipeline. The reference decodes GIFs via PIL's ``Image.open``
(``ocr_tasks.py:54-55``) like any other image.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ocr_platform_spark import gifcodec


def _structured_gray(w=200, h=120, seed=11):
    """Text-like structure + noise: pushes the LZW table across several
    width switches, the regime where a wrong bump schedule diverges."""
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    arr = ((x * 3 + y * 7) % 256).astype(np.uint8)
    mask = ((x // 17 + y // 13) % 2) == 0
    arr[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
    return arr


# --- LZW bit-level semantics ------------------------------------------------


def test_lzw_hand_assembled_lsb_first_stream():
    """Canonical bit vector: mcs=2 → clear=4, end=5, width starts 3.
    Codes [clear, 0, 1, 2, 8, end]: after code 2 the table reaches 8
    entries, so code 8 (a KwKwK reference needing the 4th bit — a
    late-bumping decoder misreads it) and End are read at width 4.
    Packs LSB-first into exactly b"\\x44\\x84\\x05" (first code in the
    LOW bits of byte 0 — the opposite of TIFF LZW)."""
    data = bytes([0x44, 0x84, 0x05])
    assert gifcodec.lzw_decode_gif(data, 2, 5) == bytes([0, 1, 2, 2, 2])


def test_lzw_round_trip_and_kwkwk():
    rng = random.Random(5)
    for mcs, alphabet in ((2, 4), (4, 16), (8, 256)):
        seqs = [
            bytes(rng.randrange(alphabet) for _ in range(3000)),
            bytes([0]) * 4000,  # maximal KwKwK chains
            bytes([i % alphabet for i in range(2000)]),
        ]
        for seq in seqs:
            enc = gifcodec.lzw_encode_gif(seq, mcs)
            assert gifcodec.lzw_decode_gif(enc, mcs, len(seq)) == seq


def test_lzw_deferred_clear():
    """A full 4096-entry table with MORE data codes and no Clear is
    legal GIF ("deferred clear"): the decoder must keep emitting
    existing codes without growing the table or the width."""
    mcs = 8
    clear = 1 << mcs
    rng = random.Random(3)
    # alternating literals grow the table by one entry per code; after
    # 4094 appends it is full, then 3000 more literals arrive code-free
    lits = [rng.randrange(256) for _ in range(4094 + 3000)]
    bits = [(clear, 9)]
    width, size = 9, clear + 2
    first = True
    for v in lits:
        bits.append((v, width))
        if first:
            first = False  # the code right after Clear adds no entry
        elif size < 4096:
            size += 1
            if size == (1 << width) and width < 12:
                width += 1
    bits.append((clear + 1, width))
    acc = nbits = 0
    out = bytearray()
    for code, cw in bits:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    got = gifcodec.lzw_decode_gif(bytes(out), mcs, len(lits))
    assert got == bytes(lits)


def test_lzw_error_contract():
    with pytest.raises(ValueError, match="ended before End"):
        gifcodec.lzw_decode_gif(b"\x04", 2, 10)  # truncated mid-stream
    enc = gifcodec.lzw_encode_gif(bytes([0, 1, 2, 3]), 2)
    with pytest.raises(ValueError, match="decoded"):
        gifcodec.lzw_decode_gif(enc, 2, 9)  # fewer indices than expected
    with pytest.raises(ValueError, match="outside LZW root"):
        gifcodec.lzw_encode_gif(bytes([7]), 2)  # index past root range


# --- container round trips ---------------------------------------------------


def test_round_trip_gray_rgb_multiframe():
    f1 = _structured_gray(53, 37, seed=1)
    f2 = _structured_gray(53, 37, seed=2)
    raw = gifcodec.encode_gif([f1, f2])
    assert gifcodec.probe_gif(raw) == (2, 53, 37)
    rgb = gifcodec.decode_gif(raw)
    for page, f in zip(rgb, (f1, f2)):
        assert np.array_equal(page, np.stack([f] * 3, axis=-1))
    luma = gifcodec.decode_gif(raw, mode="L")
    for page, f in zip(luma, (f1, f2)):
        assert np.array_equal(page, f)
    # color palette round trip (distinct colors bounded under 256)
    c = (_structured_gray(40, 30, seed=3) // 32 * 32)
    rgb_img = np.stack([c, 255 - c, c // 2], axis=-1)
    raw_c = gifcodec.encode_gif([rgb_img])
    assert np.array_equal(gifcodec.decode_gif(raw_c)[0], rgb_img)


def test_interlaced_frames_deinterlace_exactly():
    f = _structured_gray(64, 47, seed=4)
    plain = gifcodec.encode_gif([f])
    inter = gifcodec.encode_gif([f], interlace=True)
    assert inter != plain
    assert np.array_equal(gifcodec.decode_gif(inter, mode="L")[0], f)


def test_page_indices_and_slice_pages():
    frames = [_structured_gray(31, 22, seed=s) for s in range(4)]
    raw = gifcodec.encode_gif(frames)
    sel = gifcodec.decode_gif(raw, mode="L", page_indices=[3, 1])
    assert np.array_equal(sel[0], frames[3])
    assert np.array_equal(sel[1], frames[1])
    sliced = gifcodec.slice_pages(raw, [2, 0])
    assert len(sliced) < len(raw)
    assert gifcodec.probe_gif(sliced) == (2, 31, 22)
    got = gifcodec.decode_gif(sliced, mode="L")
    assert np.array_equal(got[0], frames[2])
    assert np.array_equal(got[1], frames[0])
    # verbatim contract: the sliced frame's bytes appear in the original
    gct_end = 13 + 3 * (2 << (sliced[10] & 7))
    assert sliced[gct_end:gct_end + 40] in raw
    with pytest.raises(ValueError, match="out of range"):
        gifcodec.decode_gif(raw, page_indices=[4])


def test_luma_mode_equals_rgb_to_gray_of_rgb_decode():
    """mode="L" applies the PIL-exact luma to the PALETTE; pointwise, so
    it must be bit-equal to rgb_to_gray of the expanded RGB raster."""
    from ocr_platform_spark.pdfcodec import rgb_to_gray

    c = (_structured_gray(40, 30, seed=9) // 16 * 16)
    rgb_img = np.stack([c, np.roll(c, 3, axis=1), 255 - c], axis=-1)
    raw = gifcodec.encode_gif([rgb_img])
    assert np.array_equal(
        gifcodec.decode_gif(raw, mode="L")[0],
        rgb_to_gray(gifcodec.decode_gif(raw)[0]),
    )


# --- quarantine contract ------------------------------------------------------


def _tamper(raw: bytes, pos: int, val: int) -> bytes:
    b = bytearray(raw)
    b[pos] = val
    return bytes(b)


def test_quarantine_conditions():
    f = _structured_gray(20, 15, seed=6)
    raw = gifcodec.encode_gif([f])
    with pytest.raises(ValueError, match="bad signature"):
        gifcodec.decode_gif(b"GIF90a" + raw[6:])
    with pytest.raises(ValueError, match="truncated"):
        gifcodec.decode_gif(raw[:len(raw) // 2])
    with pytest.raises(ValueError, match="no trailer"):
        gifcodec.decode_gif(raw[:-1])
    # partial frame: shrink the frame width in the image descriptor
    # (the first block introducer sits right after the GCT — searching
    # for 0x2C would false-hit a palette byte)
    desc = 13 + 3 * (2 << (raw[10] & 7))
    assert raw[desc] == 0x2C
    bad = bytearray(raw)
    bad[desc + 5] = 5
    bad[desc + 6] = 0
    with pytest.raises(ValueError, match="partial-frame"):
        gifcodec.decode_gif(bytes(bad))
    # a non-transparent GCE is fine (plain animation timing)
    gce_ok = b"\x21\xf9\x04\x00\x05\x00\x00\x00"
    ok = raw[:desc] + gce_ok + raw[desc:]
    assert np.array_equal(gifcodec.decode_gif(ok, mode="L")[0], f)
    # out-of-range LZW minimum code size is STRUCTURAL: probe must
    # quarantine it (not leave it for a silent decode-stage degrade)
    mcs_byte = desc + 10
    for bad_mcs in (0, 1, 9, 255):
        broken = _tamper(raw, mcs_byte, bad_mcs)
        with pytest.raises(ValueError, match="minimum code size"):
            gifcodec.probe_gif(broken)
    # pixel index outside the palette: 2-entry GCT, mcs=8 stream
    # carrying index 5
    lzw = gifcodec.lzw_encode_gif(bytes([0, 5]), 8)
    tiny = (b"GIF89a" + b"\x02\x00\x01\x00" + bytes([0x80]) + b"\x00\x00"
            + b"\x00\x00\x00\xff\xff\xff"
            + b"\x2c" + b"\x00\x00\x00\x00\x02\x00\x01\x00\x00"
            + b"\x08" + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b")
    with pytest.raises(ValueError, match="outside 2-entry palette"):
        gifcodec.decode_gif(tiny)
    # probe never inflates: the same corrupt-entropy payload probes
    # clean but fails decode
    mcs_pos = desc + 10
    corrupted = bytearray(raw)
    for i in range(mcs_pos + 2, min(mcs_pos + 12, len(raw) - 2)):
        corrupted[i] ^= 0xA5
    corrupted = bytes(corrupted)
    assert gifcodec.probe_gif(corrupted) == (1, 20, 15)
    with pytest.raises(ValueError):
        gifcodec.decode_gif(corrupted)


def test_mutation_fuzz_valueerror_contract():
    rng = random.Random(77)
    frames = [_structured_gray(24, 18, seed=8)]
    base = gifcodec.encode_gif(frames)
    survived = 0
    for _ in range(600):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            gifcodec.probe_gif(bytes(buf))
            gifcodec.decode_gif(bytes(buf))
            survived += 1
        except ValueError:
            pass  # the contract: ValueError, never another leak
        except MemoryError:
            pass
    assert survived < 590  # the fuzz actually bit


# --- Java ImageIO interop (external ground truth) -----------------------------


def test_imageio_decodes_our_gifs_bitexact(tifftool, tmp_path):
    from tests.test_real_codecs import _read_pnm_file

    frames = [_structured_gray(80, 60, seed=s) for s in (1, 2)]
    for name, raw, expect in (
        ("plain", gifcodec.encode_gif(frames), frames),
        ("inter", gifcodec.encode_gif(frames[:1], interlace=True),
         frames[:1]),
    ):
        (tmp_path / f"{name}.gif").write_bytes(raw)
        for page, f in enumerate(expect):
            tifftool("decodegif", tmp_path / f"{name}.gif",
                     tmp_path / "out.pnm", page)
            got = _read_pnm_file(tmp_path / "out.pnm")
            assert np.array_equal(got, np.stack([f] * 3, axis=-1)), (
                name, page)


def test_we_decode_imageio_gifs_bitexact(tifftool, tmp_path):
    from tests.test_real_codecs import _read_pnm_file, _write_pnm

    f = _structured_gray(90, 70, seed=13)
    _write_pnm(tmp_path / "in.pgm", f)
    tifftool("encodegif", tmp_path / "in.pgm", tmp_path / "j.gif")
    raw = (tmp_path / "j.gif").read_bytes()
    assert np.array_equal(gifcodec.decode_gif(raw, mode="L")[0], f)


# --- transparency (first frame composites over the background color) ----------


def _gce(transparent_idx=None, delay=0):
    packed = 0x01 if transparent_idx is not None else 0x00
    return bytes([0x21, 0xF9, 0x04, packed, delay & 0xFF, delay >> 8,
                  transparent_idx or 0, 0x00])


def test_first_frame_transparency_composites_over_background():
    """Frame 0's transparent pixels are well-defined without any prior
    canvas: they show the logical-screen background color. Built by
    hand so the background index, palette and transparent index are all
    explicit."""
    # 4-entry GCT: black, white, red, green; background index 1 (white)
    gct = bytes([0, 0, 0, 255, 255, 255, 200, 10, 10, 10, 200, 10])
    lzw = gifcodec.lzw_encode_gif(bytes([0, 2, 3, 2]), 2)
    raw = (b"GIF89a" + b"\x04\x00\x01\x00" + bytes([0x81]) + b"\x01\x00"
           + gct
           + _gce(transparent_idx=2)
           + b"\x2c\x00\x00\x00\x00\x04\x00\x01\x00\x00"
           + b"\x02" + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b")
    page = gifcodec.decode_gif(raw)[0]
    # index 2 (red) is transparent -> background white; others keep
    assert page.tolist() == [[[0, 0, 0], [255, 255, 255],
                              [10, 200, 10], [255, 255, 255]]]
    assert gifcodec.probe_gif(raw) == (1, 4, 1)


def test_transparency_on_later_frames_quarantines():
    f = _structured_gray(20, 15, seed=6)
    raw = gifcodec.encode_gif([f, f])
    desc1 = 13 + 3 * (2 << (raw[10] & 7))
    assert raw[desc1] == 0x2C
    # second frame's introducer: skip to it via the first frame's span
    from ocr_platform_spark.gifcodec import _parse

    _w, _h, frames = _parse(raw, want_data=False)
    desc2 = frames[1]["span"][0]
    trans2 = raw[:desc2] + _gce(transparent_idx=0) + raw[desc2:]
    with pytest.raises(ValueError, match="after the first"):
        gifcodec.probe_gif(trans2)
    # ... on the FIRST frame the same GCE is accepted
    trans1 = raw[:desc1] + _gce(transparent_idx=0) + raw[desc1:]
    assert gifcodec.probe_gif(trans1) == (2, 20, 15)


def test_slice_preserves_first_frame_transparency():
    """The GCE lives outside the frame's verbatim span; the slicer must
    re-emit it or transparent pixels silently repaint."""
    gct = bytes([0, 0, 0, 255, 255, 255, 200, 10, 10, 10, 200, 10])
    lzw = gifcodec.lzw_encode_gif(bytes([2, 0, 2, 1]), 2)
    raw = (b"GIF89a" + b"\x04\x00\x01\x00" + bytes([0x81]) + b"\x01\x00"
           + gct
           + _gce(transparent_idx=2)
           + b"\x2c\x00\x00\x00\x00\x04\x00\x01\x00\x00"
           + b"\x02" + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b")
    sliced = gifcodec.slice_pages(raw, [0])
    assert np.array_equal(gifcodec.decode_gif(sliced)[0],
                          gifcodec.decode_gif(raw)[0])
