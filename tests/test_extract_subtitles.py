"""Subtitle tier (SRT/WebVTT) — cue-text semantics, pinned against the
flagship, plus unit pins for every documented rule.
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import corpus, multimodal, schemas, subtext
from ocr_platform_spark.operators import extract, extract_real
from tests.test_extract_real import _render_pages, _spans_by_doc
from tests.test_extract_text_layer import page_ocr_blocks


def _flagship_blocks(payload: bytes) -> list[str]:
    _kind, rasters = _render_pages(payload)
    blocks: list[str] = []
    for img in rasters:
        blocks.extend(t for _y1, _x1, t in page_ocr_blocks(img))
    return blocks


@pytest.fixture(scope="module")
def sub_corpus(spark):
    docs, media = corpus.generate(20, seed=5151, max_pages=5)
    docs_df = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    synth = spark.createDataFrame(
        [(ref, bytearray(m["data"])) for ref, m in media.items()],
        "media_ref string, data binary",
    )
    rows = []
    has_rolling_dup = False
    for i, (ref, m) in enumerate(sorted(media.items())):
        blocks = _flagship_blocks(m["data"])
        has_rolling_dup |= any(
            a == b for a, b in zip(blocks, blocks[1:]))
        # SRT has no valid zero-cue form; an empty media becomes a
        # header-only WebVTT (valid, extracts zero blocks)
        enc = subtext.encode_srt if (i % 2 == 0 and blocks) \
            else subtext.encode_vtt
        rows.append((ref, bytearray(enc(blocks))))
    # the corpus must exercise the rolling-duplicate collapse for the
    # pin below to cover it end-to-end
    assert has_rolling_dup
    sub = spark.createDataFrame(rows, "media_ref string, data binary")
    return docs_df, synth, sub


def _collapse_rolling(spans):
    """The tier's documented delta vs the flagship: consecutive
    media-derived spans with identical (kind, text, media_ref)
    collapse to one — auto-caption rolling duplicates — and the span
    sequence renumbers, exactly as assembly does."""
    kept = []
    for s in spans:
        if kept and s[:3] == kept[-1][:3] and s[2] is not None:
            continue
        kept.append(s)
    return [(k, t, r, i) for i, (k, t, r, _o) in enumerate(kept)]


def test_sub_pipeline_equals_flagship_modulo_collapse(sub_corpus):
    """Span-sequence equality through the probe-promoted sub tier
    (SRT and VTT alternating), exact up to the tier's documented
    rolling-duplicate collapse — which the corpus exercises."""
    docs_df, synth, sub = sub_corpus
    flagship = _spans_by_doc(extract.extract_documents(docs_df, synth))
    expected = {d: _collapse_rolling(s) for d, s in flagship.items()}
    got = _spans_by_doc(extract_real.extract_real_documents(docs_df, sub))
    assert got == expected
    assert expected != flagship  # the collapse leg genuinely ran


def test_sub_probe_promotes(sub_corpus):
    _docs, _synth, sub = sub_corpus
    for r in sub.collect():
        kind, n, _w, _h = multimodal.probe_real_media(
            bytes(r["data"]), deep=True)
        assert (kind, n) == ("sub", 1)


# ---------------------------------------------------------------------------
# unit pins
# ---------------------------------------------------------------------------


def texts(src: str) -> list[str]:
    return [b.text for b in subtext.subtitle_blocks(src)]


SRT = ("1\n00:00:00,000 --> 00:00:01,900\nfirst cue line\n\n"
       "2\n00:00:02,000 --> 00:00:03,900\nsecond <i>cue</i>\n"
       "with two lines\n")


def test_srt_cues_ids_and_timestamps_drop():
    assert texts(SRT) == ["first cue line",
                          "second cue\nwith two lines"]


def test_vtt_header_notes_settings_and_markup_drop():
    vtt = ("WEBVTT - some title\nKind: captions\n\n"
           "NOTE\na comment\nspanning lines\n\n"
           "STYLE\n::cue { color: red }\n\n"
           "intro-cue\n00:00.000 --> 00:01.900 align:start line:0\n"
           "<v Bob><c.yellow>spoken text</c>\n\n"
           "00:02.000 --> 00:03.900\n"
           "karaoke <00:00:02.500>timed<00:00:03.000> words\n")
    assert texts(vtt) == ["spoken text", "karaoke timed words"]


def test_rolling_duplicates_collapse():
    rolled = subtext.encode_srt(["same caption", "same caption",
                                 "same caption", "new caption"])
    assert texts(rolled.decode()) == ["same caption", "new caption"]


def test_ass_position_override_strips():
    srt = "1\n00:00:00,000 --> 00:00:01,000\n{\\an8}top text\n"
    assert texts(srt) == ["top text"]


def test_entities_resolve():
    srt = "1\n00:00:00,000 --> 00:00:01,000\nfish &amp; chips\n"
    assert texts(srt) == ["fish & chips"]


def test_sniff_requires_cue_shape():
    assert subtext.sniff_subtitles(SRT)
    assert subtext.sniff_subtitles("WEBVTT\n\n00:00.000 --> 00:01.000\nx")
    assert not subtext.sniff_subtitles("prose --> with an arrow")
    assert not subtext.sniff_subtitles("12:30 --> lunch time notes")
    # timestamp deep in a long file: only the first 40 lines sniff
    deep = "\n" * 60 + "00:00:00,000 --> 00:00:01,000\nx"
    assert not subtext.sniff_subtitles(deep)


def test_hours_beyond_two_digits_and_short_vtt_form():
    srt = "1\n105:00:00,000 --> 105:00:01,000\nlong recording\n"
    assert texts(srt) == ["long recording"]
    vtt = "WEBVTT\n\n00:05.000 --> 00:06.000\nshort form\n"
    assert texts(vtt) == ["short form"]
