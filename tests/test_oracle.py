"""Oracle-level tests: end-to-end single-node semantics + corpus determinism +
ground-truth recovery (proves the kernels genuinely read pixels)."""

import numpy as np

from ocr_platform_spark import corpus, formats, oracle
from ocr_platform_spark.formats import Band, PageDesc


def test_corpus_deterministic():
    d1, m1 = corpus.generate(20, seed=7)
    d2, m2 = corpus.generate(20, seed=7)
    assert d1 == d2
    assert {k: v["data"] for k, v in m1.items()} == {k: v["data"] for k, v in m2.items()}
    d3, _ = corpus.generate(20, seed=8)
    assert d3 != d1


def test_corpus_profile():
    docs, media = corpus.generate(200, seed=42, max_pages=50)
    kinds = [s["kind"] for d in docs for s in d["spans"]]
    assert "text" in kinds and "pdf" in kinds and "image" in kinds
    text_only = sum(1 for d in docs if all(s["kind"] == "text" for s in d["spans"]))
    media_only = sum(1 for d in docs if all(s["kind"] != "text" for s in d["spans"]))
    assert text_only > 0 and media_only > 0
    pcs = [m["page_count"] for m in media.values() if m["content_type"] == "application/pdf"]
    assert max(pcs) > 5  # heavy tail present
    assert sorted(pcs)[len(pcs) // 2] <= 2  # median small


def test_detect_document_shape():
    docs, media = corpus.generate(5, seed=1)
    ref = next(iter(media))
    pages = oracle.detect_document(media[ref]["data"])
    assert pages[0]["page_index"] == 0
    assert set(pages[0]) == {"page_index", "width", "height", "boxes"}
    for p in pages:
        for b in p["boxes"]:
            assert b["x2"] > b["x1"] and b["y2"] > b["y1"]
            assert 0 <= b["x1"] and b["x2"] <= p["width"]


def test_extract_document_order_and_passthrough():
    docs, media = corpus.generate(40, seed=3)
    media_bytes = {k: v["data"] for k, v in media.items()}
    for d in docs[:10]:
        out = oracle.extract_document(d["spans"], media_bytes)
        assert [s.order for s in out] == list(range(len(out)))
        # text spans pass through stripped, in offset order
        in_texts = [s["text"].strip() for s in d["spans"] if s["kind"] == "text"]
        out_pass = [s.text for s in out if s.media_ref is None]
        assert out_pass == in_texts
        assert all(s.kind == "text" for s in out)


def test_ground_truth_recovery_single_line_bands():
    """The recognizer genuinely reads: on single-line bands (incl. resized A4
    PDF pages), decoded text matches the generator's ground truth."""
    rng = np.random.default_rng(99)
    total = hits = 0
    for trial in range(30):
        w, h, scale = ((595, 842, formats.RENDER_DPI / 72) if trial % 2 else (1000, 750, 1.0))
        words = ["scan", "page", "key"]
        bands = [
            Band(x=20, y=30 + i * 90, lines=[words[i]], line_h=20 if scale > 1 else 42, gap=4)
            for i in range(3)
        ]
        page = PageDesc(width=w, height=h, bands=bands)
        raw = formats.encode_pdf([page]) if trial % 2 else formats.encode_image(page)
        pages = oracle.extract_media(raw)
        got = [b.text for p in pages for b in oracle.reading_order(p.blocks)]
        total += len(words)
        hits += sum(1 for a, b in zip(got, words) if a == b)
    assert hits / total >= 0.99, f"recovery {hits}/{total}"


def test_reading_order_y_then_x_tiebreak():
    page = PageDesc(
        width=1000,
        height=600,
        bands=[
            Band(x=600, y=100, lines=["cd"], line_h=40, gap=8),
            Band(x=40, y=100, lines=["ab"], line_h=40, gap=8),
            Band(x=40, y=300, lines=["ex"], line_h=40, gap=8),
        ],
    )
    raw = formats.encode_image(page)
    (p,) = oracle.extract_media(raw)
    ordered = oracle.reading_order(p.blocks)
    assert [b.text for b in ordered] == ["ab", "cd", "ex"]
    assert ordered[0].box[1] == ordered[1].box[1]  # genuine y tie


def test_empty_page_passthrough():
    page = PageDesc(width=400, height=300, bands=[])
    (p,) = oracle.extract_media(formats.encode_image(page))
    assert p.blocks == () and p.width == 400 and p.height == 300


def test_tall_band_strip_newline_output():
    page = PageDesc(
        width=1000, height=600,
        bands=[Band(x=40, y=60, lines=["ab", "cd", "ex"], line_h=34, gap=8)],
    )
    (p,) = oracle.extract_media(formats.encode_image(page))
    assert len(p.blocks) == 1
    assert "\n" in p.blocks[0].text
    assert p.blocks[0].text.startswith("ab")
