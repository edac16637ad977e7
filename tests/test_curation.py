"""Pytest pins for the corpus-curation tier (functions/curation.py).

The DuckDB oracle gate (test_entry_oracle) already cross-checks every
operator end-to-end; these tests pin the *semantics* against independent
pure-Python oracles and literal edge-case inputs, so a bug that slipped
into both engine formulas identically would still be caught.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


# --- dedup_groups vs pure-Python union-find ----------------------------------


def test_dedup_groups_matches_union_find(spark):
    from ocr_platform_spark.functions import curation, dedup

    pairs = [
        (r.a_id, r.b_id)
        for r in dedup.simhash_pairs(spark, SF_DIR).collect()
    ]
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min doc_id of the component
    root_min: dict[int, int] = {}
    for d in doc_ids:
        r = find(d)
        root_min[r] = min(root_min.get(r, d), d)
    expected = {d: root_min[find(d)] for d in doc_ids}
    sizes: dict[int, int] = {}
    for g in expected.values():
        sizes[g] = sizes.get(g, 0) + 1

    rows = curation.dedup_groups(spark, SF_DIR).collect()
    assert len(rows) == len(doc_ids)
    # the graph must actually have edges, or this test pins nothing
    assert pairs, "simhash_pairs produced no edges at sf0.001"
    for r in rows:
        assert r.group_id == expected[r.doc_id], r
        assert r.group_size == sizes[expected[r.doc_id]], r
        assert r.is_canonical == (r.doc_id == r.group_id), r


# --- pack_sequences vs pure-Python greedy ------------------------------------


def test_pack_sequences_matches_greedy(spark):
    from ocr_platform_spark.functions import curation, textstats

    toks = {
        r.doc_id: r.bpe_tokens_est
        for r in textstats.bpe_token_count(spark, SF_DIR).collect()
    }
    expected = {}
    shards: dict[int, list[int]] = {}
    for d in sorted(toks):
        shards.setdefault(d % curation.PACK_SHARDS, []).append(d)
    for shard, docs in shards.items():
        seq = pos = cum = 0
        for i, d in enumerate(docs):
            t = toks[d]
            if i == 0:
                seq, pos, cum = 0, 0, t
            elif cum + t <= curation.PACK_BUDGET:
                pos, cum = pos + 1, cum + t
            else:
                seq, pos, cum = seq + 1, 0, t
            expected[d] = (shard, seq, pos, t)

    rows = curation.pack_sequences(spark, SF_DIR).collect()
    assert len(rows) == len(toks)
    for r in rows:
        assert (r.shard, r.seq_id, r.seq_pos, r.n_tokens) == expected[
            r.doc_id
        ], r


def test_pack_sequences_budget_invariant(spark):
    """No multi-doc sequence exceeds the budget; positions are dense."""
    from ocr_platform_spark.functions import curation

    rows = curation.pack_sequences(spark, SF_DIR).collect()
    seqs: dict[tuple[int, int], list] = {}
    for r in rows:
        seqs.setdefault((r.shard, r.seq_id), []).append(r)
    for members in seqs.values():
        total = sum(r.n_tokens for r in members)
        if len(members) > 1:
            assert total <= curation.PACK_BUDGET
        assert sorted(r.seq_pos for r in members) == list(range(len(members)))


# --- pii_scrub on literal inputs ---------------------------------------------


def test_pii_scrub_literals(spark):
    from pyspark.sql import functions as F

    from ocr_platform_spark.functions import curation

    cases = [
        "contact alice.smith+spam@example.co.uk today",
        "ids 12 345 6789 and x9",
        "mixed bob@ex.io then 4111111111111111 done",
        "clean text no pii",
        "",
    ]

    def py_scrub(s: str) -> str:
        s = re.sub(curation.PII_EMAIL_RE, "<EMAIL>", s)
        return re.sub(curation.PII_NUM_RE, "<NUM>", s)

    df = spark.createDataFrame([(c,) for c in cases], "raw string").select(
        "raw", curation.scrub_expr(F.col("raw")).alias("scrubbed")
    )
    got = {r.raw: r.scrubbed for r in df.collect()}
    for c in cases:
        assert got[c] == py_scrub(c), c
    assert got[cases[0]] == "contact <EMAIL> today"
    assert got[cases[1]] == "ids <NUM> <NUM> <NUM> and x9"
    assert got[cases[2]] == "mixed <EMAIL> then <NUM> done"


def test_pii_scrub_counts_nonzero(spark):
    """The events props blobs contain digit runs — the gate query must
    exercise the redaction path, not no-op over clean text."""
    from ocr_platform_spark.functions import curation

    out = curation.pii_scrub(spark, SF_DIR)
    assert out.filter("n_nums > 0").count() > 0
    assert out.filter("scrubbed LIKE '%<NUM>%'").count() > 0
    # the counts reconcile against the scrubbed text: n_emails/n_nums equal
    # the number of <EMAIL>/<NUM> tokens actually inserted (digit runs
    # inside emails are consumed by the email pass, not double-counted)
    bad = out.filter(
        "n_nums != size(regexp_extract_all(scrubbed, '<NUM>', 0)) OR "
        "n_emails != size(regexp_extract_all(scrubbed, '<EMAIL>', 0))"
    ).count()
    assert bad == 0


# --- stratified_sample: determinism + python oracle --------------------------


def test_stratified_sample_deterministic_and_exact(spark):
    from ocr_platform_spark.functions import curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()

    def keep(doc_id: int, lang: str) -> tuple[bool, int]:
        key = f"{curation.SAMPLE_SALT}{lang}:{doc_id}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        bucket = h % 10000
        thr = curation.SAMPLE_THRESHOLDS.get(
            lang, curation.SAMPLE_DEFAULT_THRESHOLD
        )
        return bucket < thr, bucket

    expected = {
        r.doc_id: keep(r.doc_id, r.lang)[1]
        for r in docs
        if keep(r.doc_id, r.lang)[0]
    }
    got1 = {r.doc_id: r.bucket for r in
            curation.stratified_sample(spark, SF_DIR).collect()}
    got2 = {r.doc_id: r.bucket for r in
            curation.stratified_sample(spark, SF_DIR).collect()}
    assert got1 == got2 == expected
    # strata actually downsample: en keep-rate must be well below the tail's
    langs = {r.doc_id: r.lang for r in docs}
    n_en = sum(1 for d, lg in langs.items() if lg == "en")
    kept_en = sum(1 for d in got1 if langs[d] == "en")
    assert kept_en < n_en


# --- repetition_scores edge cases --------------------------------------------


def test_repetition_scores_edge_cases(spark):
    """Literal docs: empty, single-token, all-identical, distinct."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.functions import curation

    import tempfile

    rows = [
        (0, ""),
        (1, "word"),
        (2, "echo echo echo echo"),
        (3, "alpha beta gamma delta"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in curation.repetition_scores(spark, d).collect()
        }
    assert out[0].n_tokens == 0 and out[0].dup_token_frac_fxp4 == 0
    assert out[1].n_tokens == 1
    assert out[1].max_token_frac_fxp4 == 10000  # 1/1
    assert out[1].top_bigram_frac_fxp4 == 0  # <2 tokens
    assert out[2].dup_token_frac_fxp4 == 7500  # (4-1)/4
    assert out[2].max_token_frac_fxp4 == 10000  # 4/4
    assert out[2].top_bigram_frac_fxp4 == 15000  # 3*2/4 (overlapping)
    assert out[3].dup_token_frac_fxp4 == 0
    assert out[3].max_token_frac_fxp4 == 2500
    assert out[3].top_bigram_frac_fxp4 == 5000  # 1*2/4


# --- curated_corpus invariants -----------------------------------------------


def test_curated_corpus_filters(spark):
    from ocr_platform_spark.functions import curation, dedup

    out = curation.curated_corpus(spark, SF_DIR).collect()
    assert out, "curated corpus empty — thresholds degenerate"
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(out) < total, "curated corpus filtered nothing"
    winners = {
        r.doc_id for r in dedup.dedup_exact(spark, SF_DIR).collect()
    }
    for r in out:
        assert r.quality_fxp4 >= curation.CURATE_MIN_QUALITY_FXP4
        assert r.lang in curation.CURATE_LANGS
        assert (
            curation.CURATE_MIN_TOKENS
            <= r.n_tokens
            <= curation.CURATE_MAX_TOKENS
        )
        assert r.doc_id in winners


# --- vocab_topk invariants ---------------------------------------------------


def test_vocab_topk_order_and_counts(spark):
    from ocr_platform_spark.functions import curation

    rows = curation.vocab_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= curation.VOCAB_TOPK
    # returned in (cnt desc, tok asc) order
    keys = [(-r.cnt, r.tok) for r in rows]
    assert keys == sorted(keys)
    # spot-check one count against a pure-Python scan
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    tok0 = rows[0].tok
    cnt0 = sum(
        len([t for t in re.split("[^a-z0-9]+", d.text.lower()) if t == tok0])
        for d in docs
    )
    assert rows[0].cnt == cnt0


# --- source_mix_weights invariants -------------------------------------------


def test_source_mix_weights_rebalances(spark):
    from ocr_platform_spark.functions import curation

    rows = curation.source_mix_weights(spark, SF_DIR).collect()
    assert rows
    # shares and weights each sum to ~1 (fxp6 rounding slack per stratum)
    assert abs(sum(r.share_fxp6 for r in rows) - 10**6) <= len(rows)
    assert abs(sum(r.weight_fxp6 for r in rows) - 10**6) <= len(rows)
    # temperature damping: the largest stratum is down-weighted relative
    # to its share, the smallest boosted
    biggest = max(rows, key=lambda r: r.n_docs)
    smallest = min(rows, key=lambda r: r.n_docs)
    assert biggest.weight_fxp6 < biggest.share_fxp6
    assert smallest.weight_fxp6 > smallest.share_fxp6


# --- tfidf_top_terms vs pure-Python oracle -----------------------------------


def test_tfidf_top_terms_matches_python(spark):
    from ocr_platform_spark.functions import textstats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    N = len(docs)
    tf: dict[int, dict[str, int]] = {}
    for d in docs:
        toks = [t for t in re.split("[^a-z0-9]+", d.text.lower()) if t]
        m: dict[str, int] = {}
        for t in toks:
            m[t] = m.get(t, 0) + 1
        tf[d.doc_id] = m
    df: dict[str, int] = {}
    for m in tf.values():
        for t in m:
            df[t] = df.get(t, 0) + 1

    def fxp6(x: float) -> int:
        return math.floor(x * 10**6 + 0.5)

    expected: dict[int, list[tuple[int, str, int, int]]] = {}
    for doc_id, m in tf.items():
        scored = [
            (fxp6(c * ((N + 1) / (df[t] + 1))), t, c) for t, c in m.items()
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        expected[doc_id] = [
            (rank + 1, t, c, s)
            for rank, (s, t, c) in enumerate(
                scored[: textstats.TFIDF_TOP_K]
            )
        ]

    rows = textstats.tfidf_top_terms(spark, SF_DIR).collect()
    got: dict[int, list[tuple[int, str, int, int]]] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.rank, r.term, r.tf, r.score_fxp6)
        )
    for doc_id in got:
        got[doc_id].sort()
    assert got == {d: v for d, v in expected.items() if v}
