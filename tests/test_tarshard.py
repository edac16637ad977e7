"""Tar-shard (WebDataset) source: reader round trips, corpus mapping,
and the end-to-end pipeline pin.

The pin builds shards whose samples carry the flagship's own content
re-encoded through the tier ladder (plain text, markdown, real
PNG/scanned PDF), then requires ``extract_tar_shards`` to produce
EXACTLY the spans the directly-constructed corpus produces through
``extract_real_documents`` — covering the binaryFile listing, the
streaming member parse, sample grouping, span ordering by member
index, and the shared probe/extract/assembly stages.
"""

from __future__ import annotations

import io

import pytest

from ocr_platform_spark import corpus, schemas
from ocr_platform_spark.operators import extract_real
from ocr_platform_spark.sources import tarshard
from tests.test_extract_md import content_md
from tests.test_extract_real import _spans_by_doc, reencode_real
from tests.test_extract_text_plain import content_txt


def test_writer_reader_round_trip_and_key_split():
    samples = {
        "000001": {"txt": b"alpha beta\n\ngamma\n",
                   "json": b'{"label": 3}'},
        "sub/000002": {"cls.txt": b"two part ext"},
    }
    for comp in ("", "gz", "bz2", "xz"):
        shard = tarshard.tar_shard_bytes(samples, compress=comp)
        # byte-deterministic (fixtures must not carry wall clock)
        assert shard == tarshard.tar_shard_bytes(samples, compress=comp)
        rows = list(tarshard.iter_tar_members(io.BytesIO(shard)))
        assert [(r["key"], r["ext"], r["error"]) for r in rows] == [
            ("000001", "json", None), ("000001", "txt", None),
            ("sub/000002", "cls.txt", None)]
        assert rows[1]["data"] == b"alpha beta\n\ngamma\n"


def test_truncated_shard_yields_error_row_not_exception():
    shard = tarshard.tar_shard_bytes({"a": {"txt": b"x" * 5000}})
    rows = list(tarshard.iter_tar_members(io.BytesIO(shard[:600])))
    assert rows and rows[-1]["error"].startswith("tar stream:")
    assert all(r["data"] is None for r in rows if r["error"])


def test_member_size_cap(monkeypatch):
    monkeypatch.setattr(tarshard, "MAX_MEMBER", 100)
    shard = tarshard.tar_shard_bytes(
        {"big": {"bin": b"z" * 500}, "ok": {"txt": b"fits"}})
    rows = list(tarshard.iter_tar_members(io.BytesIO(shard)))
    by_key = {r["key"]: r for r in rows}
    assert "cap" in by_key["big"]["error"]
    assert by_key["big"]["data"] is None
    # the stream stays readable past the capped member
    assert by_key["ok"]["error"] is None and by_key["ok"]["data"] == b"fits"


def test_mutation_fuzz_reader_never_raises():
    """The source UDF contract (the dispatch-fuzz posture for
    ingestion): corrupt shard bytes — bit flips, truncations, garbage
    extension, across all four compressions — yield error rows, never
    an exception that would kill an executor."""
    import numpy as np

    content = {"a": {"txt": b"alpha " * 200}, "b": {"md": b"# t\nbody"}}
    rng = np.random.default_rng(7)
    for comp in ("", "gz", "bz2", "xz"):
        raw = tarshard.tar_shard_bytes(content, compress=comp)
        n = len(raw)
        muts = []
        for i in rng.integers(0, n, 60):
            m = bytearray(raw)
            m[i] ^= 0xFF
            muts.append(bytes(m))
        for i in sorted(rng.integers(1, n, 30)):
            muts.append(raw[:i])
        muts.append(raw + bytes(rng.integers(0, 256, 32,
                                             dtype=np.uint8)))
        cols = {f.name for f in tarshard.MEMBER_SCHEMA.fields}
        for mut in muts:
            # must never raise; every yielded row is schema-shaped and
            # an error row carries no payload bytes
            for row in tarshard.iter_tar_members(io.BytesIO(mut)):
                assert set(row) == cols
                if row["error"] is not None:
                    assert row["data"] is None


@pytest.fixture(scope="module")
def shard_corpus(spark, tmp_path_factory):
    """Corpus docs -> shards: each synthetic doc is one sample whose
    members are its media re-encoded through rotating tiers, plus a
    .json metadata member that must NOT become content."""
    docs, media = corpus.generate(12, seed=9393, max_pages=4)
    encs = [content_txt, content_md, reencode_real]
    samples: dict[str, dict[str, bytes]] = {}
    direct_rows = []  # (key, member ordinal within sample, payload)
    for ref, m in sorted(media.items()):
        key = ref.replace("-", "")
        i = len(samples)
        payload = encs[i % 3](m["data"])
        samples[key] = {"dat": payload,
                        "json": b'{"label": %d}' % i}
        direct_rows.append((key, payload))
    d = tmp_path_factory.mktemp("shards")
    keys = sorted(samples)
    half = len(keys) // 2
    (d / "shard-000.tar").write_bytes(
        tarshard.tar_shard_bytes({k: samples[k] for k in keys[:half]}))
    (d / "shard-001.tar.gz").write_bytes(
        tarshard.tar_shard_bytes({k: samples[k] for k in keys[half:]},
                                 compress="gz"))
    return str(d), samples, direct_rows


def test_members_frame_and_json_exclusion(spark, shard_corpus):
    d, samples, _direct = shard_corpus
    members = tarshard.read_tar_shards(spark, d)
    rows = members.collect()
    assert all(r["error"] is None for r in rows)
    # every sample contributes its .dat and .json members
    assert len(rows) == 2 * len(samples)
    docs, media = tarshard.tar_to_corpus(members)
    got_docs = docs.collect()
    assert len(got_docs) == len(samples)
    # .json metadata members are excluded: one span per document
    assert all(len(r["spans"]) == 1 for r in got_docs)
    docs_j, _ = tarshard.tar_to_corpus(members, include_json=True)
    assert all(len(r["spans"]) == 2 for r in docs_j.collect())


def test_extract_tar_equals_direct_pipeline(spark, shard_corpus):
    """END-TO-END: shards through extract_tar_shards == the equivalent
    hand-built (documents, media) through extract_real_documents,
    compared sample-by-sample on span text sequences."""
    d, _samples, direct = shard_corpus
    got = _spans_by_doc(tarshard.extract_tar_shards(spark, d))

    docs_rows = [{"doc_id": key, "spans": [
        {"kind": "media", "text": None, "media_ref": key, "offset": 0}
    ]} for key, _p in direct]
    docs_df = spark.createDataFrame(docs_rows, schema=schemas.DOCUMENTS)
    media_df = spark.createDataFrame(
        [(key, bytearray(p)) for key, p in direct],
        "media_ref string, data binary",
    )
    want = _spans_by_doc(
        extract_real.extract_real_documents(docs_df, media_df))

    # ids differ by construction (tar doc ids are shard-content shas);
    # compare the multiset of per-document span TEXT sequences
    def text_seqs(by_doc):
        return sorted(tuple(t for _k, t, _r, _o in spans)
                      for spans in by_doc.values())

    assert text_seqs(got) == text_seqs(want)
    assert len(got) == len(want)


def test_doc_ids_deterministic_across_reingest(spark, shard_corpus):
    d, _s, _direct = shard_corpus
    ids1 = sorted(r["doc_id"] for r in tarshard.tar_to_corpus(
        tarshard.read_tar_shards(spark, d))[0].collect())
    ids2 = sorted(r["doc_id"] for r in tarshard.tar_to_corpus(
        tarshard.read_tar_shards(spark, d))[0].collect())
    assert ids1 == ids2 and len(set(ids1)) == len(ids1)
    assert all(i.startswith("tar:") for i in ids1)


def test_hidden_dotfile_members_skip():
    # WebDataset's key rule: leading-dot basenames are filesystem
    # metadata (macOS ._AppleDouble sidecars, .hidden configs), never
    # samples — and their empty stem must not collapse into one key
    import tarfile as tarmod

    buf = io.BytesIO()
    with tarmod.open(fileobj=buf, mode="w") as tf:
        for name, payload in [("._000001.jpg", b"\x00\x05\x16\x07junk"),
                              (".hidden", b"secret"),
                              ("d/._000002.txt", b"sidecar"),
                              ("000001.txt", b"real content")]:
            info = tarmod.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    buf.seek(0)
    rows = list(tarshard.iter_tar_members(buf))
    assert [r["member_name"] for r in rows] == ["000001.txt"]


def test_duplicate_member_name_last_wins(spark, tmp_path):
    # tar --append/--update layering: the same member name twice in one
    # shard. ``tar -x`` keeps the last; so do we — one span, pointing
    # at the LAST payload, and the extraction join must not multiply.
    import tarfile as tarmod

    buf = io.BytesIO()
    with tarmod.open(fileobj=buf, mode="w") as tf:
        for payload in [b"old version", b"new version"]:
            info = tarmod.TarInfo(name="000001.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    (tmp_path / "dup.tar").write_bytes(buf.getvalue())
    members = tarshard.read_tar_shards(spark, str(tmp_path))
    docs, media = tarshard.tar_to_corpus(members)
    [doc] = docs.collect()
    assert len(doc["spans"]) == 1
    media_rows = {r["media_ref"]: bytes(r["data"])
                  for r in media.collect()}
    # distinct refs per occurrence; the span references the last one
    assert len(media_rows) == 2
    assert media_rows[doc["spans"][0]["media_ref"]] == b"new version"
    # end-to-end: exactly one extracted text span, from the new payload
    out = extract_real.extract_real_documents(docs, media).collect()
    texts = [s["text"] for r in out for s in r["spans"]
             if s["text"] is not None]
    assert texts == ["new version"]
