"""Corpus-curation tier: the operators that turn a raw 100 TB document
table into a training corpus — dedup-group resolution, vocabulary stats,
repetition (Gopher-style) scoring, PII scrubbing, deterministic
stratified sampling, the composite curation filter, and token-budget
sequence packing.

Each operator is a Spark DataFrame builder plus a DuckDB oracle built
from the shared formula snippets (:mod:`.common`), so the driver's
value-hash compare is exact.

Scale notes (10^12 docs):

* ``dedup_groups`` is distributed connected components: min-label
  propagation with a pointer-jumping step per round (label <- min over
  neighbour labels, then label <- label-of-label), so convergence is
  O(log diameter) shuffle rounds, each a pair of equi-joins — never an
  all-pairs step and never a driver-side graph. Per round the driver
  reads ONE scalar (changed-count) to detect the fixpoint.
* ``vocab_topk`` is explode + count (map-side partial agg) + global
  top-k, which Spark executes as per-partition TakeOrdered — no full
  sort of the vocabulary.
* ``repetition_scores`` / ``pii_scrub`` / ``stratified_sample`` are
  narrow per-row maps (the groupBys in repetition are per-doc keys,
  partial-aggregated map-side).
* ``pack_sequences`` shuffles once on the shard key, then packs each
  shard sequentially inside ``applyInPandas`` — the only genuinely
  order-dependent loop, confined to one Arrow batch per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import (
    fxp,
    hash60,
    shingles,
    sql_fxp,
    sql_hash60,
    sql_shingles,
    sql_tokens,
    tokens,
)
from . import dedup as dedup_mod
from . import textstats

VOCAB_TOPK = 100

# deterministic per-language keep thresholds out of 10_000 (head languages
# downsampled, tail kept whole — the standard rebalancing pass)
SAMPLE_THRESHOLDS = {"en": 2500, "de": 5000, "zh": 7500}
SAMPLE_DEFAULT_THRESHOLD = 10000
SAMPLE_SALT = "sample:"

# curated_corpus thresholds
CURATE_MIN_QUALITY_FXP4 = 5000
CURATE_MIN_TOKENS = 5
CURATE_MAX_TOKENS = 5000
CURATE_LANGS = ("en", "de", "es", "fr")

# pack_sequences: token budget per training sequence, shard fan-out
PACK_BUDGET = 256
PACK_SHARDS = 8

CC_MAX_ROUNDS = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- dedup_groups: connected components over near-dup pairs ------------------


def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate GROUPS: every document gets
    ``group_id`` = min doc_id of its connected component in the
    ``simhash_pairs`` graph (singletons label themselves), plus the group
    size and a canonical-survivor flag.

    This is the step the pairwise dedup operators feed at scale — pairs
    alone over-delete (A~B, B~C must keep ONE of {A,B,C}, not zero).
    Min-label propagation with pointer jumping; each round is two
    equi-joins + a min-agg, all on (doc_id, label) descriptors.
    """
    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = dedup_mod.simhash_pairs(spark, sf_dir).select("a_id", "b_id")
    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .union(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
        .persist()
    )
    # only vertices incident to an edge enter the iteration — at corpus
    # scale the overwhelming non-duplicate majority never joins the loop;
    # singletons are unioned back at the end as their own group
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("g"))
        .localCheckpoint()
    )
    try:
        for _ in range(CC_MAX_ROUNDS):
            nbr = (
                edges.join(labels, edges["u"] == labels["doc_id"])
                .select(F.col("v").alias("doc_id"), "g")
                .groupBy("doc_id")
                .agg(F.min("g").alias("ng"))
            )
            stepped = labels.join(nbr, "doc_id", "left").select(
                "doc_id",
                F.col("g").alias("g0"),
                F.least("g", F.coalesce("ng", F.col("g"))).alias("g"),
            )
            # pointer jump: g <- min(g, label(g)) — halves chain depth
            hop = stepped.select(
                F.col("doc_id").alias("h_id"), F.col("g").alias("hg")
            )
            new = (
                stepped.join(hop, stepped["g"] == hop["h_id"], "left")
                .select(
                    "doc_id",
                    "g0",
                    F.least("g", F.coalesce("hg", F.col("g"))).alias("g"),
                )
                .localCheckpoint()
            )
            changed = new.filter(F.col("g") != F.col("g0")).count()
            labels = new.select("doc_id", "g")
            if changed == 0:
                break
    finally:
        edges.unpersist()
    singletons = docs.join(labels.select("doc_id"), "doc_id", "anti").select(
        "doc_id", F.col("doc_id").alias("g")
    )
    labels = labels.union(singletons)
    sizes = labels.groupBy("g").agg(F.count("*").alias("group_size"))
    return labels.join(sizes, "g").select(
        "doc_id",
        F.col("g").alias("group_id"),
        "group_size",
        (F.col("doc_id") == F.col("g")).alias("is_canonical"),
    )


DEDUP_GROUPS_SQL = f"""
WITH RECURSIVE
pairs AS (SELECT a_id, b_id FROM ({dedup_mod.SIMHASH_PAIRS_SQL}) sp),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
),
grp AS (SELECT src AS doc_id, min(dst) AS group_id FROM reach GROUP BY src),
sz AS (SELECT group_id, count(*) AS group_size FROM grp GROUP BY group_id)
SELECT g.doc_id, g.group_id, CAST(sz.group_size AS BIGINT) AS group_size,
       g.doc_id = g.group_id AS is_canonical
FROM grp g JOIN sz USING (group_id)
"""


# --- vocab_topk: corpus-level vocabulary statistics --------------------------


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{VOCAB_TOPK} corpus tokens by frequency (ties broken by token
    text) — the vocabulary-coverage pass before tokenizer training."""
    docs = _docs(spark, sf_dir).select(tokens(F.col("text")).alias("t"))
    return (
        docs.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_TOPK)
    )


VOCAB_TOPK_SQL = f"""
WITH tok AS (SELECT {sql_tokens('text')} AS t FROM documents)
SELECT u.tok, CAST(count(*) AS BIGINT) AS cnt
FROM tok, unnest(t) AS u(tok)
GROUP BY u.tok
ORDER BY cnt DESC, u.tok
LIMIT {VOCAB_TOPK}
"""


# --- repetition_scores: Gopher-style within-doc repetition -------------------


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Gopher repetition filters):
    duplicate-token fraction, most-frequent-token fraction, and the
    fraction of tokens covered by the most frequent bigram.

    Integer-first arithmetic (``(n - n_uniq)/n`` rather than
    ``1 - n_uniq/n``) so both engines produce bit-identical doubles
    before the fixed-point rounding.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    base = docs.select("doc_id", F.size("t").cast("long").alias("n"))
    tok_counts = (
        docs.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("max_tok"),
            F.count("*").alias("n_uniq"),
        )
    )
    bg_counts = (
        docs.select("doc_id", F.explode(shingles(F.col("t"), 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bg"))
    )
    n = F.col("n")
    nd = n.cast("double")
    return (
        base.join(tok_counts, "doc_id", "left")
        .join(bg_counts, "doc_id", "left")
        .select(
            "doc_id",
            n.alias("n_tokens"),
            F.when(n > 0, fxp((n - F.col("n_uniq")).cast("double") / nd))
            .otherwise(F.lit(0).cast("long"))
            .alias("dup_token_frac_fxp4"),
            F.when(n > 0, fxp(F.col("max_tok").cast("double") / nd))
            .otherwise(F.lit(0).cast("long"))
            .alias("max_token_frac_fxp4"),
            F.when(
                n >= 2,
                fxp((F.coalesce("max_bg", F.lit(0)) * 2).cast("double") / nd),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("top_bigram_frac_fxp4"),
        )
    )


REPETITION_SCORES_SQL = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
),
base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM tok),
tc AS (
  SELECT doc_id, max(c) AS max_tok, count(*) AS n_uniq
  FROM (
    SELECT doc_id, u.x, count(*) AS c
    FROM tok, unnest(t) AS u(x) GROUP BY doc_id, u.x
  ) GROUP BY doc_id
),
bg AS (
  SELECT doc_id, max(c) AS max_bg
  FROM (
    SELECT doc_id, u.g, count(*) AS c
    FROM (SELECT doc_id, {sql_shingles('t', 2)} AS g2 FROM tok),
         unnest(g2) AS u(g)
    GROUP BY doc_id, u.g
  ) GROUP BY doc_id
)
SELECT
  base.doc_id,
  base.n AS n_tokens,
  CASE WHEN n > 0 THEN
    {sql_fxp('CAST(n - tc.n_uniq AS DOUBLE) / CAST(n AS DOUBLE)')}
  ELSE 0 END AS dup_token_frac_fxp4,
  CASE WHEN n > 0 THEN
    {sql_fxp('CAST(tc.max_tok AS DOUBLE) / CAST(n AS DOUBLE)')}
  ELSE 0 END AS max_token_frac_fxp4,
  CASE WHEN n >= 2 THEN
    {sql_fxp('CAST(coalesce(bg.max_bg, 0) * 2 AS DOUBLE) / CAST(n AS DOUBLE)')}
  ELSE 0 END AS top_bigram_frac_fxp4
FROM base
LEFT JOIN tc USING (doc_id)
LEFT JOIN bg USING (doc_id)
"""


# --- pii_scrub: regex redaction ----------------------------------------------

# patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes + bounded quantifiers only
PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_NUM_RE = "[0-9]{2,}"


def scrub_expr(col: F.Column) -> F.Column:
    """Redaction expression shared by the query and the literal-input
    pytest pin: emails first (they contain digits), then digit runs."""
    return F.regexp_replace(
        F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>"),
        PII_NUM_RE,
        "<NUM>",
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the events property blobs: replace emails and
    digit runs, count each. Narrow per-row map — no shuffle.

    ``n_nums`` counts digit runs on the EMAIL-SCRUBBED text (matching the
    redaction order in :func:`scrub_expr`), so it equals the number of
    ``<NUM>`` tokens actually inserted — counting on the raw props would
    also count digits inside emails that the email pass already consumed."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    email_scrubbed = F.regexp_replace(F.col("props"), PII_EMAIL_RE, "<EMAIL>")
    return ev.select(
        "event_id",
        scrub_expr(F.col("props")).alias("scrubbed"),
        F.size(F.regexp_extract_all("props", F.lit(PII_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(email_scrubbed, F.lit(PII_NUM_RE), 0))
        .cast("long")
        .alias("n_nums"),
    )


PII_SCRUB_SQL = f"""
SELECT
  event_id,
  regexp_replace(
    regexp_replace(props, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
    '{PII_NUM_RE}', '<NUM>', 'g') AS scrubbed,
  CAST(len(regexp_extract_all(props, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(
    regexp_replace(props, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
    '{PII_NUM_RE}')) AS BIGINT) AS n_nums
FROM events
"""


# --- stratified_sample: deterministic hash sampling --------------------------


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rebalancing sample: keep a doc iff its salted hash
    bucket (out of 10 000) falls under the language's threshold.
    Deterministic (reruns pick the same rows), seedless-cluster-safe, and
    a pure narrow map — the only way to sample 10^12 rows reproducibly.
    """
    docs = _docs(spark, sf_dir)
    key = F.concat(
        F.lit(SAMPLE_SALT), F.col("lang"), F.lit(":"),
        F.col("doc_id").cast("string"),
    )
    bucket = hash60(key) % F.lit(10000)
    thr = F.lit(SAMPLE_DEFAULT_THRESHOLD)
    for lang, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return (
        docs.select(
            "doc_id", "lang", bucket.cast("long").alias("bucket"),
            thr.alias("thr"),
        )
        .filter(F.col("bucket") < F.col("thr"))
        .select("doc_id", "lang", "bucket")
    )


_SQL_SAMPLE_KEY = (
    f"'{SAMPLE_SALT}' || lang || ':' || CAST(doc_id AS VARCHAR)"
)
_SQL_THR = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {t}" for lang, t in SAMPLE_THRESHOLDS.items()
) + f" ELSE {SAMPLE_DEFAULT_THRESHOLD} END"

STRATIFIED_SAMPLE_SQL = f"""
WITH b AS (
  SELECT doc_id, lang,
         {sql_hash60(_SQL_SAMPLE_KEY)} % 10000 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b
WHERE bucket < {_SQL_THR}
"""


# --- curated_corpus: the composite curation filter ---------------------------


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as one declarative plan: exact-dedup
    canonical survivors ∧ quality threshold ∧ language set ∧ token-length
    band. Each input is itself a registered operator; Catalyst fuses the
    narrow maps and the joins shuffle only (doc_id, small-descriptor)
    rows."""
    q = textstats.quality_scores(spark, sf_dir).select(
        "doc_id", "quality_fxp4"
    )
    t = textstats.token_stats(spark, sf_dir).select("doc_id", "n_tokens")
    winners = dedup_mod.dedup_exact(spark, sf_dir).select("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        docs.join(winners, "doc_id", "semi")
        .join(q, "doc_id")
        .join(t, "doc_id")
        .filter(
            (F.col("quality_fxp4") >= CURATE_MIN_QUALITY_FXP4)
            & F.col("lang").isin(*CURATE_LANGS)
            & F.col("n_tokens").between(CURATE_MIN_TOKENS, CURATE_MAX_TOKENS)
        )
        .select("doc_id", "lang", "n_tokens", "quality_fxp4")
    )


_SQL_CURATE_LANGS = ", ".join(f"'{lg}'" for lg in CURATE_LANGS)

CURATED_CORPUS_SQL = f"""
WITH q AS (
  SELECT doc_id, quality_fxp4 FROM ({textstats.QUALITY_SCORES_SQL}) x
),
t AS (SELECT doc_id, n_tokens FROM ({textstats.TOKEN_STATS_SQL}) x),
w AS (SELECT doc_id FROM ({dedup_mod.DEDUP_EXACT_SQL}) x)
SELECT d.doc_id, d.lang, t.n_tokens, q.quality_fxp4
FROM documents d
JOIN w USING (doc_id)
JOIN q USING (doc_id)
JOIN t USING (doc_id)
WHERE q.quality_fxp4 >= {CURATE_MIN_QUALITY_FXP4}
  AND d.lang IN ({_SQL_CURATE_LANGS})
  AND t.n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS}
"""


# --- source_mix_weights: temperature-rebalanced mixture weights --------------


def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) mixture weights for training-data sampling:
    temperature rebalancing w ∝ n^0.5 (head strata damped, tail strata
    boosted — the standard multilingual mixing rule).

    Cross-engine determinism: the raw weight sqrt(n) is fixed-point
    integerized per stratum FIRST, then summed exactly as integers — a
    double sum over strata would depend on accumulation order, which
    neither engine guarantees. The total is a 1-row broadcast join.
    """
    docs = _docs(spark, sf_dir)
    strata = docs.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    w = fxp(F.sqrt(F.col("n_docs").cast("double")), 6)
    strata = strata.select("lang", "source", "n_docs", w.alias("w_fxp6"))
    total = strata.agg(
        F.sum("w_fxp6").alias("w_total"), F.sum("n_docs").alias("n_total")
    )
    return strata.crossJoin(F.broadcast(total)).select(
        "lang",
        "source",
        "n_docs",
        fxp(F.col("n_docs").cast("double") / F.col("n_total"), 6).alias(
            "share_fxp6"
        ),
        fxp(F.col("w_fxp6").cast("double") / F.col("w_total"), 6).alias(
            "weight_fxp6"
        ),
    )


SOURCE_MIX_WEIGHTS_SQL = f"""
WITH strata AS (
  SELECT lang, source, count(*) AS n_docs,
         {sql_fxp('sqrt(CAST(count(*) AS DOUBLE))', 6)} AS w_fxp6
  FROM documents GROUP BY 1, 2
),
total AS (
  SELECT sum(w_fxp6) AS w_total, sum(n_docs) AS n_total FROM strata
)
SELECT lang, source, n_docs,
  {sql_fxp('CAST(n_docs AS DOUBLE) / n_total', 6)} AS share_fxp6,
  {sql_fxp('CAST(w_fxp6 AS DOUBLE) / w_total', 6)} AS weight_fxp6
FROM strata, total
"""


# --- pack_sequences: token-budget greedy packing -----------------------------


def _pack_shard(pdf):
    """Greedy first-fit-in-order packing of one shard (runs inside an
    Arrow batch; the ONLY sequential loop in the module)."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    seq_ids, seq_pos = [], []
    seq, pos, cum = 0, 0, 0
    for i, t in enumerate(pdf["n_tokens"]):
        t = int(t)
        if i == 0:
            seq, pos, cum = 0, 0, t
        elif cum + t <= PACK_BUDGET:
            pos += 1
            cum += t
        else:
            seq += 1
            pos = 0
            cum = t
        seq_ids.append(seq)
        seq_pos.append(pos)
    return pd.DataFrame(
        {
            "shard": pdf["shard"],
            "seq_id": seq_ids,
            "seq_pos": seq_pos,
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"],
        }
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training sequences: shard by
    ``doc_id % {PACK_SHARDS}``, then greedily fill {PACK_BUDGET}-token
    sequences in doc_id order within each shard (a doc longer than the
    budget gets its own sequence). One shuffle on the shard key; the
    greedy fill runs per-shard inside ``applyInPandas``."""
    base = textstats.bpe_token_count(spark, sf_dir).select(
        "doc_id",
        F.col("bpe_tokens_est").alias("n_tokens"),
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
    )
    return base.groupBy("shard").applyInPandas(
        _pack_shard,
        schema=(
            "shard bigint, seq_id bigint, seq_pos bigint, "
            "doc_id bigint, n_tokens bigint"
        ),
    )


PACK_SEQUENCES_SQL = f"""
WITH RECURSIVE
base AS (
  SELECT doc_id, bpe_tokens_est AS n_tokens, doc_id % {PACK_SHARDS} AS shard
  FROM ({textstats.BPE_TOKEN_COUNT_SQL}) x
),
r AS (
  SELECT shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM base
),
rec(shard, rn, doc_id, n_tokens, seq_id, seq_pos, cum) AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
         CASE WHEN rec.cum + r.n_tokens <= {PACK_BUDGET}
              THEN rec.seq_id ELSE rec.seq_id + 1 END,
         CASE WHEN rec.cum + r.n_tokens <= {PACK_BUDGET}
              THEN rec.seq_pos + 1 ELSE CAST(0 AS BIGINT) END,
         CASE WHEN rec.cum + r.n_tokens <= {PACK_BUDGET}
              THEN rec.cum + r.n_tokens ELSE r.n_tokens END
  FROM rec JOIN r ON r.shard = rec.shard AND r.rn = rec.rn + 1
)
SELECT shard, seq_id, seq_pos, doc_id, n_tokens FROM rec
"""
