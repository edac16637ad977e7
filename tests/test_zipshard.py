"""Zip-shard source: reader round trips, per-member CRC containment,
duplicate/dotfile semantics shared with tar, and the end-to-end
pipeline pin against the directly-constructed corpus.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from ocr_platform_spark.sources import tarshard, zipshard


def _samples():
    return {
        "000001": {"txt": b"alpha beta gamma delta\n",
                   "json": b'{"label": 1}'},
        "000002": {"md": b"plain second document\n"},
        "d/000003": {"txt": b"nested sample text\n"},
    }


def test_writer_reader_round_trip():
    samples = _samples()
    for compress in (True, False):
        shard = zipshard.zip_shard_bytes(samples, compress=compress)
        # byte-deterministic
        assert shard == zipshard.zip_shard_bytes(samples,
                                                 compress=compress)
        rows = list(zipshard.iter_zip_members(io.BytesIO(shard)))
        assert all(r["error"] is None for r in rows)
        got = {(r["key"], r["ext"]): r["data"] for r in rows}
        for key, exts in samples.items():
            for ext, payload in exts.items():
                assert got[(key, ext)] == payload


def test_crc_corruption_contained_per_member():
    # zip resyncs via the central directory: one corrupt member is one
    # error row, later members still stream
    samples = {"a": {"txt": b"A" * 400}, "b": {"txt": b"B" * 400},
               "c": {"txt": b"C" * 400}}
    shard = bytearray(zipshard.zip_shard_bytes(samples, compress=False))
    # flip payload bytes of member 'b' (stored, so offset findable)
    off = bytes(shard).find(b"B" * 400)
    shard[off:off + 4] = b"XXXX"
    rows = list(zipshard.iter_zip_members(io.BytesIO(bytes(shard))))
    errs = [r for r in rows if r["error"] is not None]
    oks = [r for r in rows if r["error"] is None]
    assert len(errs) == 1 and errs[0]["key"] == "b"
    assert {r["key"] for r in oks} == {"a", "c"}


def test_unreadable_directory_yields_one_error_row():
    rows = list(zipshard.iter_zip_members(io.BytesIO(b"PK\x03\x04junk")))
    assert len(rows) == 1 and "zip directory" in rows[0]["error"]


def test_dotfiles_and_dirs_skip():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("._0001.jpg", b"\x00\x05appledouble")
        zf.writestr("d/", b"")
        zf.writestr(".hidden", b"x")
        zf.writestr("0001.txt", b"real")
    rows = list(zipshard.iter_zip_members(io.BytesIO(buf.getvalue())))
    assert [r["member_name"] for r in rows] == ["0001.txt"]


@pytest.mark.filterwarnings("ignore:Duplicate name")
def test_duplicate_member_last_wins(spark, tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for payload in (b"old version", b"new version"):
            info = zipfile.ZipInfo("000001.txt",
                                   date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, payload)
    (tmp_path / "dup.zip").write_bytes(buf.getvalue())
    members = zipshard.read_zip_shards(spark, str(tmp_path))
    docs, media = zipshard.zip_to_corpus(members)
    [doc] = docs.collect()
    assert len(doc["spans"]) == 1
    media_rows = {r["media_ref"]: bytes(r["data"])
                  for r in media.collect()}
    assert len(media_rows) == 2
    assert media_rows[doc["spans"][0]["media_ref"]] == b"new version"


def test_member_size_cap(monkeypatch, tmp_path):
    # ONE knob bounds both archive sources (zipshard references
    # tarshard.MAX_MEMBER, never a by-value copy)
    monkeypatch.setattr(tarshard, "MAX_MEMBER", 100)
    shard = zipshard.zip_shard_bytes(
        {"big": {"txt": b"x" * 500}, "ok": {"txt": b"small"}})
    rows = list(zipshard.iter_zip_members(io.BytesIO(shard)))
    by_key = {r["key"]: r for r in rows}
    assert "cap" in by_key["big"]["error"]
    assert by_key["ok"]["error"] is None


def test_extract_zip_equals_tar_for_same_samples(spark, tmp_path):
    # the two shard containers land the SAME samples as the SAME spans
    samples = {
        "000001": {"txt": b"first doc body text\n"},
        "000002": {"txt": b"second doc body text\n"},
    }
    (tmp_path / "s.zip").write_bytes(zipshard.zip_shard_bytes(samples))
    (tmp_path / "s.tar").write_bytes(tarshard.tar_shard_bytes(samples))
    zdocs = zipshard.extract_zip_shards(
        spark, str(tmp_path / "s.zip")).collect()
    tdocs = tarshard.extract_tar_shards(
        spark, str(tmp_path / "s.tar")).collect()

    def texts(rows):
        return sorted(
            tuple(s["text"] for s in r["spans"]
                  if s["text"] is not None)
            for r in rows
        )

    assert texts(zdocs) == texts(tdocs)
    assert len(zdocs) == 2
    # prefixes keep the two sources' ids disjoint
    assert all(r["doc_id"].startswith("zip:") for r in zdocs)


def test_pipeline_source_zip(spark, tmp_path):
    from ocr_platform_spark import pipelines

    samples = {f"{i:06d}": {"txt": b"some plain english words "
                                   b"repeated here\n"}
               for i in range(3)}
    (tmp_path / "p.zip").write_bytes(zipshard.zip_shard_bytes(samples))
    raw = pipelines.crawl_to_training_corpus(
        spark, str(tmp_path), source="zip", curate=False).collect()
    assert len(raw) == 3
    assert {r["text"] for r in raw} == {
        "some plain english words repeated here"}
    with pytest.raises(ValueError, match="unknown source"):
        pipelines.crawl_to_training_corpus(spark, str(tmp_path),
                                           source="7z")
