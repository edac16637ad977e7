"""Pytest pins for the multimodal binary operators (media_metadata,
page_features, frame_sample) against pure-Python oracles recomputed from
the corpus generator — the same invariant style as test_quarantine.

Each operator must (a) reproduce the independently computed per-payload
values exactly, and (b) quarantine corrupt payloads without failing the
job (ADVICE r1: consistent with the extraction pipeline's posture).
"""

from __future__ import annotations

import math

import numpy as np

from ocr_platform_spark import corpus, formats, multimodal, schemas


def _media_df(spark, media):
    rows = [{"media_ref": k, **v} for k, v in sorted(media.items())]
    return spark.createDataFrame(rows, schema=schemas.MEDIA)


def _gen(n=16, seed=33, max_pages=6):
    docs, media = corpus.generate(n, seed=seed, max_pages=max_pages)
    return media


# --- media_metadata -----------------------------------------------------------


def _expected_metadata(media):
    exp = {}
    for ref, m in media.items():
        kind, pages = formats.decode_media(m["data"])
        exp[ref] = (
            kind,
            len(pages),
            pages[0].width if pages else 0,
            pages[0].height if pages else 0,
            sum(len(p.bands) for p in pages),
        )
    return exp


def test_media_metadata_matches_python_oracle(spark):
    media = _gen()
    got = {
        r["media_ref"]: (r["kind"], r["n_pages"], r["width"], r["height"], r["n_bands"])
        for r in multimodal.media_metadata(_media_df(spark, media)).collect()
    }
    assert got == _expected_metadata(media)


def test_media_metadata_quarantines_corrupt(spark):
    media = _gen()
    refs = sorted(media)
    media[refs[0]]["data"] = b"XXXXXgarbage"
    media[refs[1]]["data"] = media[refs[1]]["data"][:8]
    rows = multimodal.media_metadata(_media_df(spark, media)).collect()
    by_ref = {r["media_ref"]: r for r in rows}
    assert len(rows) == len(media)  # one row per payload, corrupt included
    for ref in (refs[0], refs[1]):
        r = by_ref[ref]
        assert r["kind"] == multimodal.MEDIA_KIND_ERROR
        assert (r["n_pages"], r["width"], r["height"], r["n_bands"]) == (0, 0, 0, 0)
    # the clean payloads are unaffected
    clean = {k: v for k, v in _expected_metadata(
        {k: v for k, v in media.items() if k not in (refs[0], refs[1])}
    ).items()}
    for ref, exp in clean.items():
        r = by_ref[ref]
        assert (r["kind"], r["n_pages"], r["width"], r["height"], r["n_bands"]) == exp


# --- page_features ------------------------------------------------------------


def _expected_features(media, dims=8):
    exp = {}
    for ref, m in media.items():
        _, pages = formats.decode_media(m["data"])
        for i, page in enumerate(pages):
            h = np.zeros(dims, dtype=np.float64)
            for b in page.bands:
                h[int(dims * b.x / max(1, page.width)) % dims] += 1.0
                h[int(dims * b.y / max(1, page.height)) % dims] += 0.5
            n = np.linalg.norm(h)
            feat = h / n if n > 0 else h
            for d in range(dims):
                exp[(ref, i, d)] = int(math.floor(float(feat[d]) * 1_000_000 + 0.5))
    return exp


def test_page_features_matches_python_oracle(spark):
    media = _gen()
    got = {
        (r["media_ref"], r["page_index"], r["dim"]): r["value_fxp6"]
        for r in multimodal.page_features(_media_df(spark, media)).collect()
    }
    assert got == _expected_features(media)


def test_page_features_scalar_schema_and_quarantine(spark):
    media = _gen()
    refs = sorted(media)
    media[refs[0]]["data"] = b"XXXXXgarbage"
    df = multimodal.page_features(_media_df(spark, media))
    # every output column is a hashable scalar (the r1 driver-gate failure
    # was an array<double> column)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "int", "int", "bigint"
    ]
    rows = df.collect()
    assert all(r["media_ref"] != refs[0] for r in rows)  # corrupt skipped
    expected = _expected_features(
        {k: v for k, v in media.items() if k != refs[0]}
    )
    assert len(rows) == len(expected)


# --- frame_sample ---------------------------------------------------------------


def _expected_frames(media, every=4):
    exp = {}
    for ref, m in media.items():
        _, pages = formats.decode_media(m["data"])
        for i in range(0, len(pages), every):
            p = pages[i]
            exp[(ref, i)] = (p.width, p.height, len(p.bands))
    return exp


def test_frame_sample_matches_python_oracle(spark):
    media = _gen(max_pages=12)
    got = {
        (r["media_ref"], r["frame_index"]): (r["width"], r["height"], r["n_bands"])
        for r in multimodal.frame_sample(_media_df(spark, media)).collect()
    }
    assert got == _expected_frames(media)


def test_frame_sample_quarantines_corrupt(spark):
    media = _gen(max_pages=12)
    refs = sorted(media)
    media[refs[0]]["data"] = b"\x00broken"
    got = multimodal.frame_sample(_media_df(spark, media)).collect()
    assert all(r["media_ref"] != refs[0] for r in got)
    expected = _expected_frames({k: v for k, v in media.items() if k != refs[0]})
    assert len(got) == len(expected)
