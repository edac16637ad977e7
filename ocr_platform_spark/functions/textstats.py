"""Text analysis over the ``documents`` table: token stats, quality
scoring, language ID, fingerprinting.

These are the text-side operators a 100 TB training-data pipeline runs
before/alongside OCR extraction. All Spark builders are pure native
``pyspark.sql.functions`` (higher-order array functions — JVM-side, no
Python in the hot path); each has a DuckDB oracle SQL built from the same
formula snippets (:mod:`.common`), so the driver's value-hash compare is
exact.

Scale notes: most operators here are narrow per-row ``select``s that run
as a single map stage with full column pruning (only ``doc_id, text``
read from parquet). The exceptions shuffle deliberately and narrowly:
``doc_fingerprints`` exchanges ``(doc_id, md5)`` + a 64-bit partial min
(never the text), and ``tfidf_top_terms`` shuffles term counts.
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

# stopwords for the quality score: frequent function/filler words
STOPWORDS = ["the", "a", "an", "of", "and", "in", "on", "is", "to"]

# language marker words (disjoint sets; deterministic heuristic)
LANG_MARKERS = {
    "en": ["the", "a", "is", "of", "and"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "las", "y", "es"],
    "fr": ["les", "des", "et", "une", "est"],
}
_LANG_ORDER = ["en", "de", "es", "fr"]  # tie-break preference order


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- token_stats -------------------------------------------------------------


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting (whitespace/punct tokenizer)."""
    tok = tokens(F.col("text"))
    docs = _read(spark, sf_dir, "documents").select("doc_id", tok.alias("t"))
    total_len = F.aggregate(
        "t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return docs.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_uniq"),
        F.when(
            F.size("t") > 0, fxp(total_len.cast("double") / F.size("t"))
        ).otherwise(F.lit(0).cast("long")).alias("avg_token_len_fxp4"),
    )


TOKEN_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
)
SELECT
  doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
  CASE WHEN len(t) > 0 THEN
    {sql_fxp("CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS DOUBLE) / len(t)")}
  ELSE 0 END AS avg_token_len_fxp4
FROM tok
"""


# --- quality_scores ----------------------------------------------------------


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: alpha ratio, stopword ratio, length."""
    tok = tokens(F.col("text"))
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "text", tok.alias("t")
    )
    n_chars = F.length("text").cast("double")
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
    n_tok = F.size("t")
    n_stop = F.size(F.filter("t", lambda x: x.isin(*STOPWORDS)))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        fxp(alpha_ratio).alias("alpha_ratio_fxp4"),
        fxp(stop_ratio).alias("stop_ratio_fxp4"),
        fxp(score).alias("quality_fxp4"),
    )


_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)
QUALITY_SCORES_SQL = f"""
WITH tok AS (
  SELECT doc_id, text, {sql_tokens('text')} AS t FROM documents
), m AS (
  SELECT
    doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CASE WHEN length(text) > 0 THEN
      CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        / length(text)
    ELSE 0.0 END AS alpha_ratio,
    CASE WHEN len(t) > 0 THEN
      CAST(len(list_filter(t, x -> x IN ({_STOP_IN}))) AS DOUBLE) / len(t)
    ELSE 0.0 END AS stop_ratio,
    len(t) AS n_tok
  FROM tok
)
SELECT
  doc_id,
  n_chars,
  {sql_fxp('alpha_ratio')} AS alpha_ratio_fxp4,
  {sql_fxp('stop_ratio')} AS stop_ratio_fxp4,
  {sql_fxp('0.4 * alpha_ratio + 0.4 * (1.0 - stop_ratio)'
           ' + 0.2 * least(1.0, CAST(n_tok AS DOUBLE) / 100.0)')} AS quality_fxp4
FROM m
"""


# --- lang_id -----------------------------------------------------------------


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic; 'und' when no marker hits."""
    tok = tokens(F.col("text"))
    docs = _read(spark, sf_dir, "documents").select("doc_id", tok.alias("t"))
    def _score(words: list[str]) -> F.Column:
        return F.size(F.filter("t", lambda x: x.isin(*words)))

    scores = {lang: _score(words) for lang, words in LANG_MARKERS.items()}
    mx = F.greatest(*scores.values())
    pred = F.when(mx == 0, F.lit("und"))
    for lang in _LANG_ORDER:
        pred = pred.when(scores[lang] == mx, F.lit(lang))
    out = docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        mx.cast("long").alias("marker_hits"),
    )
    return out


def _sql_lang_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(t, x -> x IN ({words})))"


LANG_ID_SQL = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
), s AS (
  SELECT doc_id,
    {', '.join(f'{_sql_lang_score(lg)} AS s_{lg}' for lg in _LANG_ORDER)}
  FROM tok
)
SELECT
  doc_id,
  CASE WHEN greatest({', '.join(f's_{lg}' for lg in _LANG_ORDER)}) = 0 THEN 'und'
    {' '.join(f"WHEN s_{lg} = greatest({', '.join(f's_{l2}' for l2 in _LANG_ORDER)}) THEN '{lg}'" for lg in _LANG_ORDER)}
  END AS pred_lang,
  CAST(greatest({', '.join(f's_{lg}' for lg in _LANG_ORDER)}) AS BIGINT)
    AS marker_hits
FROM s
"""


# --- doc_fingerprints --------------------------------------------------------


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text md5 + winnowing-style min 5-gram hash.

    Explode + flat ``min`` aggregate (map-side partial) instead of a
    higher-order ``transform``+``array_min`` — interpreted per-element
    lambdas are the slow path at scale."""
    tok = tokens(F.col("text"))
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.array_join(tok, " ").alias("norm"), tok.alias("t")
    )
    sh5 = shingles(F.col("t"), 5)
    basis = F.when(F.size(sh5) > 0, sh5).otherwise(F.array(F.col("norm")))
    # group on (doc_id, md5) — the only text-derived value the output
    # needs — so the exchange and partial-agg hash map carry 32 hex chars
    # per doc instead of the full normalized corpus text
    rows = docs.select(
        "doc_id", F.md5("norm").alias("fp"), F.explode(basis).alias("s")
    )
    return (
        rows.groupBy("doc_id", "fp")
        .agg(F.min(hash60(F.col("s"))).alias("winnow_min"))
        .select("doc_id", "fp", "winnow_min")
    )


DOC_FINGERPRINTS_SQL = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
), sh AS (
  SELECT doc_id, array_to_string(t, ' ') AS norm,
         {sql_shingles('t', 5)} AS sh5
  FROM tok
)
SELECT
  doc_id,
  md5(norm) AS fp,
  CASE WHEN len(sh5) > 0 THEN
    list_aggregate(list_transform(sh5, s -> {sql_hash60('s')}), 'min')
  ELSE {sql_hash60('norm')} END AS winnow_min
FROM sh
"""


# --- bpe_token_count ---------------------------------------------------------

# GPT-2-pretokenizer-ish: alnum runs | punctuation runs (whitespace splits);
# explicit ASCII whitespace class so Java regex and RE2 agree byte-for-byte
_BPE_PRETOKEN_RE = "[a-z0-9]+|[^a-z0-9 \\t\\n\\r]+"
_BPE_CHARS_PER_TOKEN = 4.0  # the standard ~4-chars/token estimate


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-token budget estimate per document: regex pretokenize,
    then ceil(len/4) tokens per pretoken — the train-data costing pass."""
    pre = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(_BPE_PRETOKEN_RE), 0
    )
    docs = _read(spark, sf_dir, "documents").select("doc_id", pre.alias("p"))
    est = F.aggregate(
        F.transform(
            "p", lambda t: F.ceil(F.length(t) / F.lit(_BPE_CHARS_PER_TOKEN))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size("p").cast("long").alias("n_pretokens"),
        est.alias("bpe_tokens_est"),
    )


BPE_TOKEN_COUNT_SQL = f"""
WITH pre AS (
  SELECT doc_id,
    regexp_extract_all(lower(text), '{_BPE_PRETOKEN_RE}') AS p
  FROM documents
)
SELECT doc_id,
  CAST(len(p) AS BIGINT) AS n_pretokens,
  CAST(coalesce(list_sum(
    list_transform(p, t -> CAST(ceil(len(t) / {_BPE_CHARS_PER_TOKEN}) AS BIGINT))
  ), 0) AS BIGINT) AS bpe_tokens_est
FROM pre
"""


# --- doc_checksums (M13 analog: sha256 content checksum) ---------------------


def doc_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha256 checksum per document (``routes_jobs.py:66`` analog)."""
    return _read(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("checksum")
    )


DOC_CHECKSUMS_SQL = "SELECT doc_id, sha256(text) AS checksum FROM documents"


# --- tfidf_top_terms ---------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} characteristic terms per document by tf·idf,
    with the LINEAR smoothed idf ``(N+1)/(df+1)`` (no log).

    The linear variant is a deliberate cross-engine-determinism choice: a
    single IEEE division is bit-equal across engines, while ln()
    implementations differ in the last ulp between the JVM and C libm —
    which would make the fixed-point score a cross-engine lottery at tie
    boundaries. Note this is a DIFFERENT ranking from classic log-idf
    tf·idf, not a monotone rewrite of it: log only commutes with the
    per-term comparison when tf is equal, so across terms the linear
    score weights rarity more steeply (e.g. tf=100/df=99 outranks
    tf=1/df=1 linearly but not under log-idf). The output contract is
    the linear score, mirrored exactly in the DuckDB oracle. Ranking
    ties break on the integerized score, then term text.

    Shape at scale: one shuffle to (doc, term) counts, one shuffle for
    document frequencies, a key join, and a per-doc window (partitioned
    by doc_id — no global sort).
    """
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    # scalar N folded INTO the plan as a broadcast 1-row aggregate (no
    # separate driver count() job — that was one extra full scan of the
    # documents table per call, real I/O at 100 TB); (N+1) is an exact
    # integer, so the double division is bit-identical to the old literal
    n = F.broadcast(
        docs.agg((F.count("*") + F.lit(1)).alias("n_plus_1"))
    )
    tf = (
        docs.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.col("tf").cast("double") * (
        F.col("n_plus_1").cast("double") / (F.col("df") + F.lit(1)).cast("double")
    )
    scored = tf.join(df_t, "term").crossJoin(n).select(
        "doc_id", "term", "tf", fxp(score, 6).alias("score_fxp6")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_fxp6"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id", F.col("rank").cast("long").alias("rank"),
            "term", "tf", "score_fxp6",
        )
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, u.term, count(*) AS tf
  FROM tok, unnest(t) AS u(term)
  GROUP BY 1, 2
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
    {sql_fxp('CAST(tf.tf AS DOUBLE)'
             ' * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE))',
             6)} AS score_fxp6
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, score_fxp6,
    row_number() OVER (
      PARTITION BY doc_id ORDER BY score_fxp6 DESC, term
    ) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, score_fxp6
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""
