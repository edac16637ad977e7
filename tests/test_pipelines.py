"""Crawl-to-training-corpus composition: archives in, curated docs out.

Fixture corpora carry English prose (kept), a junk low-quality doc
(dropped by the quality threshold), a too-short doc (token band), a
non-marker-language doc (lang set), and an exact duplicate pair (one
survivor, smallest doc_id) — so every leg of the keep rule is pinned
through the FULL chain: WARC/tar ingestion, tier extraction,
spans_to_documents, the stat expressions, and the dedup keep rule.
"""

from __future__ import annotations

import pytest

from ocr_platform_spark import pipelines, schemas
from ocr_platform_spark.sources import tarshard, warc

# English prose with enough tokens/markers to pass every threshold
GOOD = ("the quick brown fox is one of the best known animals and it "
        "jumps over the lazy dog while the sun is high and the day is "
        "long and the story of the fox is told again and again")
GOOD2 = ("a house is a building and the people of a town live in it "
         "and the rooms of the house are warm and the garden is full "
         "of flowers and the trees of the garden are old and tall")
JUNK = "@@@@ ???? !!!! %%%% ^^^^ &&&& **** (((( )))) ####"  # no alpha
SHORT = "the end"  # under the token band
NONLANG = ("zzz qqq xxx yyy www vvv uuu ttt sss rrr kkk jjj hhh ggg "
           "fff ddd ccc bbb aaa nnn mmm lll ppp ooo iii eee")  # 'und'


def _samples() -> dict[str, dict[str, bytes]]:
    return {
        "doc-good": {"txt": GOOD.encode()},
        "doc-good2": {"txt": GOOD2.encode()},
        "doc-dup-a": {"txt": GOOD.encode()},   # exact duplicate of good
        "doc-junk": {"txt": JUNK.encode()},
        "doc-short": {"txt": SHORT.encode()},
        "doc-nonlang": {"txt": NONLANG.encode()},
    }


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe_shards")
    (d / "s0.tar").write_bytes(tarshard.tar_shard_bytes(_samples()))
    return str(d)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe_warc")
    recs = b"".join(
        warc.warc_record_bytes(f"http://x/{k}", v["txt"],
                               content_type="text/plain")
        for k, v in sorted(_samples().items())
    )
    (d / "c0.warc").write_bytes(recs)
    return str(d)


def test_tar_crawl_to_training_corpus(spark, shard_dir):
    cur = pipelines.crawl_to_training_corpus(
        spark, shard_dir, source="tar").collect()
    texts = sorted(r["text"] for r in cur)
    # junk fails quality, short fails the token band, nonlang is 'und',
    # and the duplicate pair collapses to ONE survivor
    assert texts == sorted([GOOD, GOOD2])
    for r in cur:
        assert r["pred_lang"] == "en" and r["n_tokens"] > 5


def test_warc_crawl_to_training_corpus(spark, warc_dir):
    cur = pipelines.crawl_to_training_corpus(
        spark, warc_dir, source="warc").collect()
    assert sorted(r["text"] for r in cur) == sorted([GOOD, GOOD2])


@pytest.fixture(scope="module")
def mbox_dir(tmp_path_factory):
    from ocr_platform_spark import emltext

    d = tmp_path_factory.mktemp("pipe_mbox")
    msgs = [
        # subject-less (empty Subject never emits a span) so the
        # curated text equals the body exactly, like the other legs
        emltext.encode_eml(
            [("From", f"u@example.org"), ("Message-ID", f"<{k}@x>"),
             ("Received", "relay"), ("Date", "Thu, 01 Jan 2026")],
            body=v["txt"].decode())
        for k, v in sorted(_samples().items())
    ]
    (d / "m0.mbox").write_bytes(emltext.encode_mbox(msgs))
    return str(d)


def test_mbox_crawl_to_training_corpus(spark, mbox_dir):
    """The mail leg of the estate: mbox ingestion -> MIME span walk ->
    curation keep rule, same outcome as the WARC/tar legs."""
    cur = pipelines.crawl_to_training_corpus(
        spark, mbox_dir, source="mbox").collect()
    assert sorted(r["text"] for r in cur) == sorted([GOOD, GOOD2])


def test_curate_false_returns_raw_extracted_text(spark, shard_dir):
    raw = pipelines.crawl_to_training_corpus(
        spark, shard_dir, source="tar", curate=False).collect()
    # every sample extracts (no curation): 6 documents, text intact
    assert len(raw) == len(_samples())
    assert GOOD in {r["text"] for r in raw}
    assert JUNK in {r["text"] for r in raw}


def test_dedup_keeps_smallest_doc_id(spark):
    df = spark.createDataFrame(
        [("b", "same text"), ("a", "same text"), ("c", "other")],
        "doc_id string, text string",
    )
    got = sorted(r["doc_id"]
                 for r in pipelines.dedup_exact_text(df).collect())
    assert got == ["a", "c"]


def test_spans_to_documents_blank_line_join(spark):
    docs = spark.createDataFrame(
        [{"doc_id": "d", "spans": [
            {"kind": "text", "text": "first", "media_ref": None,
             "offset": 0},
            {"kind": "text", "text": "second", "media_ref": "m",
             "offset": 1},
        ]}],
        schema=schemas.DOCUMENTS,
    )
    row = pipelines.spans_to_documents(docs).collect()[0]
    assert row["text"] == "first\n\nsecond" and row["n_spans"] == 2


def test_annotate_matches_table_operator_semantics(spark, shard_dir):
    """The frame-based stats must equal the table-bound operators'
    values for the same text (same expressions, no drift)."""
    import duckdb

    from ocr_platform_spark.functions.textstats import (LANG_ID_SQL,
                                                        QUALITY_SCORES_SQL,
                                                        TOKEN_STATS_SQL)
    raw = pipelines.crawl_to_training_corpus(
        spark, shard_dir, source="tar", curate=False)
    ann = {r["doc_id"]: r
           for r in pipelines.annotate_documents(raw).collect()}
    con = duckdb.connect()
    con.register("documents", raw.toPandas())
    q = {r[0]: r for r in con.execute(
        f"SELECT doc_id, quality_fxp4 FROM ({QUALITY_SCORES_SQL}) x"
    ).fetchall()}
    t = {r[0]: r for r in con.execute(
        f"SELECT doc_id, n_tokens FROM ({TOKEN_STATS_SQL}) x"
    ).fetchall()}
    lg = {r[0]: r for r in con.execute(
        f"SELECT doc_id, pred_lang FROM ({LANG_ID_SQL}) x"
    ).fetchall()}
    assert ann
    for doc_id, r in ann.items():
        assert r["quality_fxp4"] == q[doc_id][1], doc_id
        assert r["n_tokens"] == t[doc_id][1], doc_id
        assert r["pred_lang"] == lg[doc_id][1], doc_id


def test_dedup_normalization_matches_table_operator(spark):
    # the pipeline leg must use dedup_exact's token-normalized
    # fingerprint, not raw-byte sha: case/punctuation/whitespace
    # variants of one document collapse on BOTH paths
    df = spark.createDataFrame(
        [("b", "The quick fox."), ("a", "the  quick fox"),
         ("c", "a different document")],
        "doc_id string, text string",
    )
    got = sorted(r["doc_id"]
                 for r in pipelines.dedup_exact_text(df).collect())
    assert got == ["a", "c"]


def test_annotate_preserves_caller_t_column(spark):
    # the advertised contract is "any (doc_id, text, ...) frame" — a
    # caller's own column named like an internal scratch column must
    # survive untouched
    df = spark.createDataFrame(
        [("d1", "plain english words here", "keep-me")],
        "doc_id string, text string, t string",
    )
    [row] = pipelines.annotate_documents(df).collect()
    assert row["t"] == "keep-me"
    assert row["n_tokens"] == 4


def test_speech_corpus_pairs_transcripts_with_audio(spark, tmp_path):
    # the canonical WebDataset speech shard: NNNN.wav + NNNN.txt pairs.
    # Transcripts extract through the text tier; audio quarantines in
    # extraction (typed no-text-tier) but its header metadata joins
    # back per sample.
    import numpy as np

    from ocr_platform_spark import audiocodec
    from ocr_platform_spark.sources import tarshard

    def wav(n_frames, rate):
        return audiocodec.encode_wav(
            np.zeros((n_frames, 1)), rate, bits=16)

    samples = {
        "000001": {"txt": b"hello spoken world\n",
                   "wav": wav(8000, 16000)},      # 500 ms
        "000002": {"txt": b"second utterance here\n",
                   "wav": wav(4000, 8000)},       # 500 ms at 8 kHz
        "000003": {"txt": b"transcript with no audio\n"},
    }
    (tmp_path / "speech-000.tar").write_bytes(
        tarshard.tar_shard_bytes(samples))
    out = {r["text"]: r for r in pipelines.speech_corpus(
        spark, str(tmp_path)).collect()}
    assert set(out) == {"hello spoken world", "second utterance here",
                       "transcript with no audio"}
    r1 = out["hello spoken world"]
    assert (r1["duration_ms"], r1["sample_rate"], r1["channels"]) == \
        (500, 16000, 1)
    r2 = out["second utterance here"]
    assert (r2["duration_ms"], r2["sample_rate"]) == (500, 8000)
    r3 = out["transcript with no audio"]
    assert r3["duration_ms"] is None and r3["sample_rate"] is None


def test_federated_corpus_dedups_across_sources(spark, tmp_path):
    # the same document arriving as a tar-shard member AND a JSONL
    # line must collapse to ONE survivor when curation runs over the
    # federated union (per-source curation would keep one copy each)
    from ocr_platform_spark.sources import tarshard

    body = b"the quick fox is one of a kind and rather sly\n"
    tar_dir = tmp_path / "shards"
    tar_dir.mkdir()
    (tar_dir / "s.tar").write_bytes(
        tarshard.tar_shard_bytes({"000001": {"txt": body}}))
    jl_dir = tmp_path / "dumps"
    jl_dir.mkdir()
    (jl_dir / "d.jsonl").write_bytes(
        b'{"text": "the quick fox is one of a kind and rather sly"}\n'
        b'{"text": "and here is a different second document of the '
        b'corpus"}\n')
    out = pipelines.federated_training_corpus(
        spark, {"tar": str(tar_dir), "jsonl": str(jl_dir)},
        min_tokens=1).collect()
    texts = sorted(r["text"] for r in out)
    assert texts == [
        "and here is a different second document of the corpus",
        "the quick fox is one of a kind and rather sly",
    ]
    # the duplicate's survivor is the smallest doc_id across sources
    assert len(out) == 2


def test_speech_corpus_with_vtt_transcripts(spark, tmp_path):
    # wav + WebVTT caption pairs: the transcript extracts as CUE TEXT
    # through the subtitle tier (timestamps/markup dropped), paired
    # with the audio's duration metadata
    import numpy as np

    from ocr_platform_spark import audiocodec, subtext
    from ocr_platform_spark.sources import tarshard

    vtt = subtext.encode_vtt(["hello spoken world", "second caption"])
    samples = {"000001": {
        "vtt": vtt,
        "wav": audiocodec.encode_wav(np.zeros((16000, 1)), 16000),
    }}
    (tmp_path / "speech-vtt.tar").write_bytes(
        tarshard.tar_shard_bytes(samples))
    [row] = pipelines.speech_corpus(spark, str(tmp_path)).collect()
    assert row["text"] == "hello spoken world\n\nsecond caption"
    assert (row["duration_ms"], row["sample_rate"]) == (1000, 16000)


def test_office_crawl_to_training_corpus(spark, tmp_path):
    """The enterprise-dump leg: office ingestion -> part walks ->
    curation keep rule, same outcome as the WARC/tar/mbox legs."""
    from ocr_platform_spark import docxtext, rtftext

    d = tmp_path / "officedump"
    d.mkdir()
    (d / "good.docx").write_bytes(docxtext.encode_docx([GOOD]))
    (d / "good2.rtf").write_bytes(rtftext.encode_rtf([GOOD2]))
    (d / "dup.docx").write_bytes(docxtext.encode_docx([GOOD]))  # exact dup
    (d / "junk.docx").write_bytes(docxtext.encode_docx([JUNK]))
    cur = pipelines.crawl_to_training_corpus(
        spark, str(d), source="office").collect()
    assert sorted(r["text"] for r in cur) == sorted([GOOD, GOOD2])
