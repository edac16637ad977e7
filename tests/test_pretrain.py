"""Semantic invariants for the pretraining-corpus tier (cross-engine
equality itself is covered per-query by tests/test_entry_oracle.py; these
pin the *meaning* of the outputs against independent Python recomputation
on the small fixture)."""

from __future__ import annotations

import os
import re

import pytest

from ocr_platform_spark.functions import pretrain

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="testdata not present",
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _docs_rows(spark):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }


def test_contamination_matches_python_oracle(spark):
    docs = _docs_rows(spark)
    n = pretrain.CONTAM_N

    def sh(text):
        t = _py_tokens(text)
        return {
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        }

    bench = set()
    for d, text in docs.items():
        if d % pretrain.BENCH_MOD == 0:
            bench |= sh(text)
    out = {
        r.doc_id: r
        for r in pretrain.contamination_check(spark, SF_DIR).collect()
    }
    assert set(out) == {
        d for d in docs if d % pretrain.BENCH_MOD != 0
    }
    for d, r in out.items():
        g = sh(docs[d])
        assert r.n_shingles == len(g)
        assert r.n_contaminated == len(g & bench)
        if g:
            expect = int(len(g & bench) / len(g) * 10**4 + 0.5)
            assert r.contamination_fxp4 == expect


def test_chunk_dedup_counts(spark):
    docs = _docs_rows(spark)
    w = pretrain.CHUNK_W
    chunks = []  # (chunk_string, doc_id, idx) in global order
    for d in sorted(docs):
        t = _py_tokens(docs[d])
        for i in range(0, (len(t) - 1) // w + 1 if t else 0):
            chunks.append((" ".join(t[i * w : (i + 1) * w]), d, i))
    seen: dict[str, tuple[int, int]] = {}
    dup = {d: 0 for d in docs}
    tot = {d: 0 for d in docs}
    for s, d, i in sorted(chunks, key=lambda c: (c[1], c[2])):
        tot[d] += 1
        if s in seen:
            dup[d] += 1
        else:
            seen[s] = (d, i)
    out = {r.doc_id: r for r in pretrain.chunk_dedup(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for d, r in out.items():
        assert (r.n_chunks, r.n_dup_chunks) == (tot[d], dup[d])


def test_length_histogram_totals(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    out = pretrain.length_histogram(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in out) == len(docs)
    assert sum(r.total_tokens for r in out) == sum(
        len(_py_tokens(r.text)) for r in docs
    )
    for r in out:
        assert r.bucket in pretrain.LEN_BUCKETS


def test_bpe_pair_counts_matches_python(spark):
    from collections import Counter

    docs = _docs_rows(spark)
    c: Counter = Counter()
    for text in docs.values():
        for tok in _py_tokens(text):
            for i in range(len(tok) - 1):
                c[tok[i : i + 2]] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    out = pretrain.bpe_pair_counts(spark, SF_DIR).collect()
    assert [(r.pair, r.cnt) for r in out] == expect[: pretrain.BPE_PAIR_TOPK]


def test_unigram_scores_matches_python(spark):
    from collections import Counter

    docs = _docs_rows(spark)
    c: Counter = Counter()
    for text in docs.values():
        c.update(_py_tokens(text))
    total = sum(c.values())
    out = {r.doc_id: r for r in pretrain.unigram_scores(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for d, r in out.items():
        t = _py_tokens(docs[d])
        s = sum(c[x] for x in t)
        assert (r.n_tokens, r.sum_freq) == (len(t), s)
        if t:
            expect = int(s / (len(t) * total) * 10**6 + 0.5)
            assert r.familiarity_fxp6 == expect


def test_semdedup_cluster_count_and_prune_rule(spark):
    clusters = pretrain.semdedup_clusters(spark, SF_DIR).collect()
    assert len({r.cluster for r in clusters}) <= pretrain.SEM_K
    assert all(-(10**6) <= r.cos_fxp6 <= 10**6 for r in clusters)

    pruned = {r.vec_id: r for r in pretrain.semdedup_prune(spark, SF_DIR).collect()}
    assert set(pruned) == {r.vec_id for r in clusters}
    # the lowest vec_id of every cluster can never be dropped (drop rule
    # requires a smaller same-cluster neighbour)
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    for c, ids in by_cluster.items():
        head = min(ids)
        assert pruned[head].keep == 1
    # at least one vector survives overall and flags are 0/1
    assert {r.keep for r in pruned.values()} <= {0, 1}
    assert any(r.keep == 1 for r in pruned.values())
