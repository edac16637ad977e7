"""Recall contracts of the banded candidate-generation paths.

Two guarantees the pair operators now state explicitly:

* ``simhash_pairs``: EXACT recall at Hamming <= HAMMING_THRESHOLD —
  7-chunk banding pigeonhole-covers radius 6, so banding must find every
  qualifying pair, verified here against a brute-force O(n^2) Python scan.
* ``embedding_near_dup_lsh``: pairs are a SUBSET of the exact tier
  (precision is exact — banding only trades recall), with recall
  measured and sanity-bounded.

Plus the exact-tier guard: ``embedding_near_dup`` must refuse inputs
larger than EXACT_NEAR_DUP_MAX_ROWS.
"""

from __future__ import annotations

import itertools

import pytest

from ocr_platform_spark.functions import dedup, similarity

SF = "/root/testdata/sf0.001"


def test_simhash_pairs_exact_recall_vs_bruteforce(spark):
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash(spark, SF).collect()}
    expected = set()
    for a, b in itertools.combinations(sorted(sims), 2):
        ham = bin(sims[a] ^ sims[b]).count("1")
        if ham <= dedup.HAMMING_THRESHOLD:
            expected.add((a, b, ham))
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in dedup.simhash_pairs(spark, SF).collect()
    }
    assert got == expected  # exact, both directions: no misses, no extras


def test_embedding_lsh_pairs_subset_of_exact_with_recall(spark):
    exact = {
        (r["a_id"], r["b_id"]): r["cos_fxp6"]
        for r in dedup.embedding_near_dup(spark, SF).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["cos_fxp6"]
        for r in similarity.embedding_near_dup_lsh(spark, SF).collect()
    }
    # precision is exact: every LSH pair is an exact pair with the same cosine
    for pair, cos in lsh.items():
        assert pair in exact and exact[pair] == cos
    # recall is a property of the banding config; measure and bound it
    recall = len(lsh) / len(exact) if exact else 1.0
    assert recall >= 0.5, f"banded recall collapsed: {recall:.2f}"


def test_minhash_lsh_pairs_subset_of_exact_jaccard_with_recall(spark):
    """The third banded path: minhash_lsh_pairs verifies candidates with
    exact Jaccard on the same shingle sets ngram_jaccard_pairs scans, so
    its pairs are a subset with identical jaccard values — banding only
    trades recall, measured here."""
    exact = {
        (r["a_id"], r["b_id"]): r["jaccard_fxp4"]
        for r in dedup.ngram_jaccard_pairs(spark, SF).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["jaccard_fxp4"]
        for r in dedup.minhash_lsh_pairs(spark, SF).collect()
    }
    for pair, jac in lsh.items():
        assert pair in exact and exact[pair] == jac, pair
    recall = len(lsh) / len(exact) if exact else 1.0
    assert recall >= 0.5, f"banded recall collapsed: {recall:.2f}"


def test_exact_near_dup_tier_is_guarded(spark, monkeypatch):
    monkeypatch.setattr(dedup, "EXACT_NEAR_DUP_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        dedup.embedding_near_dup(spark, SF)


def test_checkpoint_dir_output_identical(spark, tmp_path):
    """The optional shingle-index materialization (``checkpoint_dir``) is
    a pure execution-shape change: both pair builders must return exactly
    the same rows with and without it, and the index must actually land
    as a parquet table in the given dir."""
    import os

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    ck = str(tmp_path / "dedup_ck")
    # build BOTH lazy frames against the shared dir BEFORE collecting
    # either: the materialization is write-once, so the second builder
    # must reuse the committed table, not overwrite the files underneath
    # the first frame (an eager overwrite made p1.collect() fail with
    # FAILED_READ_FILE)
    p1 = dedup.ngram_jaccard_pairs(spark, SF, checkpoint_dir=ck)
    p2 = dedup.minhash_lsh_pairs(spark, SF, checkpoint_dir=ck)
    assert rows(dedup.ngram_jaccard_pairs(spark, SF)) == rows(p1)
    assert rows(dedup.minhash_lsh_pairs(spark, SF)) == rows(p2)
    shingle_dirs = [d for d in os.listdir(ck) if d.startswith("shingles-")]
    assert len(shingle_dirs) == 1  # one source-keyed table, shared


def test_checkpoint_rekeys_on_source_change(spark, tmp_path):
    """Regenerating the corpus in place must produce a NEW cache subdir
    (content-fingerprint key), not silently serve the stale shingles."""
    import os
    import shutil

    def write_flat(seed):
        # flat (doc_id, text) table, the shape the dedup tier reads
        rows = [(i, f"alpha beta gamma doc {seed} {i} " * 3) for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "documents.parquet")
        )

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    write_flat(1)
    dedup.ngram_jaccard_pairs(spark, src, checkpoint_dir=ck).collect()
    first = set(os.listdir(ck))
    assert len(first) == 1

    shutil.rmtree(src)
    write_flat(2)  # same path, new content
    dedup.ngram_jaccard_pairs(spark, src, checkpoint_dir=ck).collect()
    assert len(set(os.listdir(ck))) == 2  # a second, differently-keyed table
