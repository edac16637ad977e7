"""Pretraining-corpus analysis tier: benchmark decontamination, chunk-level
exact dedup, token-length histograms, and SemDeDup-style embedding
clustering (relational Lloyd iterations) with within-cluster near-dup
pruning.

These are the passes a 100 TB training-data pipeline runs *after* basic
quality filtering and before tokenization:

* ``contamination_check`` — eval-set decontamination (the GPT-3/PaLM
  "remove training docs that share n-grams with the benchmark" pass).
  The benchmark shingle set is small by construction, so it is
  **broadcast**: the corpus side — the 10^12-row side — never shuffles;
  the whole operator is a narrow map + map-side join + per-doc partial
  aggregation.
* ``chunk_dedup`` — fixed-window chunk (paragraph-analog) exact dedup
  across the corpus: one shuffle on the 60-bit chunk hash, ownership by
  ``row_number`` over (doc_id, chunk_idx) inside each hash cell, then a
  per-doc count. No pair explosion anywhere.
* ``length_histogram`` — token-count distribution per source over fixed
  power-of-two buckets (a CASE ladder, engine-exact — no float log2):
  a narrow map + tiny aggregation.
* ``semdedup_clusters`` — k-means over the embedding table with
  {SEM_ITERS} unrolled Lloyd iterations, expressed relationally:
  assignment is a broadcast-centroid crossJoin + argmax, the centroid
  update sums **fixed-point int64 components** (``floor(x*1e6+0.5)``)
  so the reduction is order-independent and bit-identical between Spark
  and DuckDB regardless of partitioning — the trick that makes an
  iterative float algorithm pass an exact cross-engine value-hash gate.
  Driver never collects; the loop just extends the DAG.
* ``semdedup_prune`` — the SemDeDup rule (Abbas et al. 2023): within
  each final cluster, a vector is dropped when a same-cluster neighbour
  with cosine ≥ {SEM_DUP_THRESHOLD} and a smaller vec_id exists. The
  pair join is keyed by cluster — bounded cells, never an all-pairs
  cross join over the table.

Scale notes (10^12 rows): contamination and length_histogram are
shuffle-free on the big side; chunk_dedup shuffles once on the chunk
hash (AQE handles skew from stop-chunks); semdedup assignment cost is
rows × K with centroids broadcast (K ≪ rows), update is one partial-agg
shuffle of (cluster, dim) cells per iteration — 64·K cells total. The
int64 fixed-point centroid sums hold to ~10^12 rows × |x|≤10; beyond
that switch the sum column to decimal(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import fxp, hash60, shingles, sql_fxp, sql_hash60, sql_shingles, sql_tokens, tokens

# contamination: docs with doc_id % BENCH_MOD == 0 stand in for the
# held-out benchmark; overlap is measured over distinct word 3-grams
BENCH_MOD = 20
CONTAM_N = 3

# chunk_dedup: fixed token window (the "paragraph" unit of the corpus)
CHUNK_W = 16

# length_histogram: power-of-two bucket lower bounds (CASE ladder)
LEN_BUCKETS = (0, 4, 8, 16, 32, 64, 128, 256)

# semdedup: K clusters, Lloyd iterations, within-cluster dup threshold
SEM_K = 8
SEM_ITERS = 2
SEM_DUP_THRESHOLD = 0.35  # same scale as dedup.COSINE_DUP_THRESHOLD
SEM_FXP = 6  # fixed-point digits for the order-independent centroid sum


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- contamination_check ------------------------------------------------------


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document benchmark contamination: the fraction of a doc's
    distinct {CONTAM_N}-gram shingles that appear anywhere in the
    benchmark slice (doc_id % {BENCH_MOD} == 0).

    The benchmark shingle set is broadcast — the corpus side never
    shuffles (cf. the eval-overlap pass in GPT-3 appendix C; public
    methodology, re-expressed relationally)."""
    # tokens materialized in their own projection: inlining tokens() into
    # the shingle lambda would re-run the tokenizer per element_at call
    # (measured ~25x slower at sf0.1)
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", shingles(F.col("t"), CONTAM_N).alias("sh"))
    )
    corpus = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    doc_g = corpus.select(
        "doc_id", F.explode(F.array_distinct("sh")).alias("g")
    )
    bench_g = (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode(F.array_distinct("sh")).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    agg = (
        doc_g.join(F.broadcast(bench_g), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    n_sh = F.coalesce("n_shingles", F.lit(0)).cast("long")
    n_hit = F.coalesce("n_contaminated", F.lit(0)).cast("long")
    return (
        corpus.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_sh.alias("n_shingles"),
            n_hit.alias("n_contaminated"),
            F.when(
                n_sh > 0, fxp(n_hit.cast("double") / n_sh.cast("double"))
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("contamination_fxp4"),
        )
    )


CONTAMINATION_CHECK_SQL = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
sh AS (SELECT doc_id, {sql_shingles('t', CONTAM_N)} AS g{CONTAM_N} FROM tok),
doc_g AS (
  SELECT DISTINCT doc_id, u.g FROM sh, unnest(g{CONTAM_N}) AS u(g)
  WHERE doc_id % {BENCH_MOD} <> 0
),
bench_g AS (
  SELECT DISTINCT u.g FROM sh, unnest(g{CONTAM_N}) AS u(g)
  WHERE doc_id % {BENCH_MOD} = 0
),
agg AS (
  SELECT d.doc_id,
    count(*) AS n_shingles,
    sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
  FROM doc_g d LEFT JOIN bench_g b ON d.g = b.g
  GROUP BY d.doc_id
)
SELECT t.doc_id,
  CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
  CAST(coalesce(a.n_contaminated, 0) AS BIGINT) AS n_contaminated,
  CASE WHEN coalesce(a.n_shingles, 0) > 0 THEN
    {sql_fxp('CAST(a.n_contaminated AS DOUBLE) / CAST(a.n_shingles AS DOUBLE)')}
  ELSE 0 END AS contamination_fxp4
FROM tok t LEFT JOIN agg a ON t.doc_id = a.doc_id
WHERE t.doc_id % {BENCH_MOD} <> 0
"""


# --- chunk_dedup --------------------------------------------------------------


def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact dedup of fixed {CHUNK_W}-token chunks (the
    paragraph/line-dedup analog of C4/RefinedWeb, over whitespace-free
    synthetic text). A chunk is a duplicate when another chunk with the
    same 60-bit hash exists at a lexicographically smaller
    (doc_id, chunk_idx); per doc we report chunk counts and the dup
    fraction. One shuffle, keyed on the chunk hash."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    n = F.size("t")
    idx = F.sequence(F.lit(0), F.floor((n - 1) / CHUNK_W).cast("int"))
    chunk = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(F.col("t"), i * CHUNK_W + 1, CHUNK_W)
    )
    ch = (
        docs.filter(n > 0)
        .select(
            "doc_id",
            F.posexplode(F.transform(idx, chunk)).alias("chunk_idx", "chunk"),
        )
        .select("doc_id", "chunk_idx", hash60(F.col("chunk")).alias("k"))
    )
    w = Window.partitionBy("k").orderBy("doc_id", "chunk_idx")
    marked = ch.withColumn("rn", F.row_number().over(w))
    agg = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
    )
    n_c = F.coalesce("n_chunks", F.lit(0)).cast("long")
    n_d = F.coalesce("n_dup_chunks", F.lit(0)).cast("long")
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_c.alias("n_chunks"),
            n_d.alias("n_dup_chunks"),
            F.when(n_c > 0, fxp(n_d.cast("double") / n_c.cast("double")))
            .otherwise(F.lit(0).cast("long"))
            .alias("dup_frac_fxp4"),
        )
    )


CHUNK_DEDUP_SQL = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
ch AS (
  SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
    {sql_hash60(f"array_to_string(list_slice(t, u.i * {CHUNK_W} + 1, (u.i + 1) * {CHUNK_W}), ' ')")} AS k
  FROM tok, unnest(range(0, CAST(floor((len(t) - 1) / {CHUNK_W}) AS BIGINT) + 1)) AS u(i)
  WHERE len(t) > 0
),
marked AS (
  SELECT doc_id, chunk_idx,
    row_number() OVER (PARTITION BY k ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
),
agg AS (
  SELECT doc_id, count(*) AS n_chunks,
    sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup_chunks
  FROM marked GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
  CAST(coalesce(a.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
  CASE WHEN coalesce(a.n_chunks, 0) > 0 THEN
    {sql_fxp('CAST(a.n_dup_chunks AS DOUBLE) / CAST(a.n_chunks AS DOUBLE)')}
  ELSE 0 END AS dup_frac_fxp4
FROM tok t LEFT JOIN agg a ON t.doc_id = a.doc_id
"""


# --- length_histogram ---------------------------------------------------------


def _bucket_spark(n: F.Column) -> F.Column:
    expr = F.lit(LEN_BUCKETS[-1])
    for lo, hi in zip(LEN_BUCKETS[:-1], LEN_BUCKETS[1:]):
        expr = F.when((n >= lo) & (n < hi), F.lit(lo)).otherwise(expr)
    return expr.cast("long")


def _bucket_sql(n: str) -> str:
    clauses = " ".join(
        f"WHEN {n} >= {lo} AND {n} < {hi} THEN {lo}"
        for lo, hi in zip(LEN_BUCKETS[:-1], LEN_BUCKETS[1:])
    )
    return f"CAST(CASE {clauses} ELSE {LEN_BUCKETS[-1]} END AS BIGINT)"


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per source over fixed power-of-two
    buckets (bucket id = lower bound). CASE ladder, not float log2 —
    engine-exact at bucket boundaries."""
    docs = _docs(spark, sf_dir).select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("n")
    )
    return (
        docs.select("source", "n", _bucket_spark(F.col("n")).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
        )
    )


LENGTH_HISTOGRAM_SQL = f"""
WITH d AS (
  SELECT source, CAST(len({sql_tokens('text')}) AS BIGINT) AS n FROM documents
)
SELECT source, {_bucket_sql('n')} AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS total_tokens
FROM d GROUP BY source, bucket
"""


# --- bpe_pair_counts ----------------------------------------------------------

BPE_PAIR_TOPK = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge iteration, relationally: corpus-wide counts of
    adjacent character pairs inside tokens, top-{BPE_PAIR_TOPK} by count
    (ties by pair text). explode + count = map-side partial agg + one
    shuffle of (pair, count) cells; top-k is TakeOrdered, never a full
    sort. This is the inner loop of tokenizer training — each merge
    round is this same query over a re-segmented corpus."""
    docs = _docs(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("tok") - 1),
        lambda i: F.col("tok").substr(i, F.lit(2)),
    )
    return (
        docs.filter(F.length("tok") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(BPE_PAIR_TOPK)
    )


BPE_PAIR_COUNTS_SQL = f"""
WITH tok AS (
  SELECT u.tok FROM (SELECT {sql_tokens('text')} AS t FROM documents),
       unnest(t) AS u(tok)
),
pairs AS (
  SELECT p.pair
  FROM (SELECT tok FROM tok WHERE len(tok) >= 2),
       unnest(list_transform(range(1, len(tok)), i -> substr(tok, i, 2))) AS p(pair)
)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair ASC
LIMIT {BPE_PAIR_TOPK}
"""


# --- unigram_scores -----------------------------------------------------------


def unigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean corpus unigram frequency — the rational (no-log)
    analog of mean word log-probability used for fluency filtering.
    ``sum_freq`` = Σ over token occurrences of the corpus count of that
    token (int64, order-independent); ``familiarity_fxp6`` =
    sum_freq / (n_tokens · corpus_total). The count table is broadcast —
    the corpus side shuffles only for its own per-doc aggregate."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    occ = docs.select("doc_id", F.explode("t").alias("tok"))
    counts = occ.groupBy("tok").agg(F.count("*").alias("c"))
    total = occ.agg(F.count("*").alias("tt"))
    agg = (
        occ.join(F.broadcast(counts), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum("c").alias("s"))
    )
    n = F.coalesce("n", F.lit(0)).cast("long")
    s = F.coalesce("s", F.lit(0)).cast("long")
    score = F.col("s").cast("double") / (
        F.col("n").cast("double") * F.col("tt").cast("double")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            n.alias("n_tokens"),
            s.alias("sum_freq"),
            F.when(n > 0, fxp(score, 6))
            .otherwise(F.lit(0).cast("long"))
            .alias("familiarity_fxp6"),
        )
    )


UNIGRAM_SCORES_SQL = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
occ AS (SELECT doc_id, u.tok FROM tok, unnest(t) AS u(tok)),
counts AS (SELECT tok, count(*) AS c FROM occ GROUP BY tok),
total AS (SELECT count(*) AS tt FROM occ),
agg AS (
  SELECT o.doc_id, count(*) AS n, sum(c.c) AS s
  FROM occ o JOIN counts c ON o.tok = c.tok
  GROUP BY o.doc_id
)
SELECT t.doc_id,
  CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(a.s, 0) AS BIGINT) AS sum_freq,
  CASE WHEN coalesce(a.n, 0) > 0 THEN
    {sql_fxp('CAST(a.s AS DOUBLE) / (CAST(a.n AS DOUBLE) * CAST(total.tt AS DOUBLE))', 6)}
  ELSE 0 END AS familiarity_fxp6
FROM tok t LEFT JOIN agg a ON t.doc_id = a.doc_id, total
"""


# --- semdedup: relational k-means + within-cluster pruning -------------------


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, e double[], nrm) with zero-norm rows dropped — identical
    filter on both engines."""
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("e", lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return v.select("vec_id", "e", nrm.alias("nrm")).filter(F.col("nrm") > 0)


def _cos_cols(qe: str, qn: str, ce: str, cn: str) -> F.Column:
    dot = F.aggregate(
        F.zip_with(qe, ce, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return dot / (F.col(qn) * F.col(cn))


def _assign(v: DataFrame, cent: DataFrame, keep_cos: bool = False) -> DataFrame:
    """Nearest-centroid assignment: broadcast centroids, argmax by
    (cos desc, cluster asc). Returns (vec_id, e, nrm, cluster[, cos]) —
    the single implementation of the assignment step, shared by the Lloyd
    iterations and the final labelled assignment so a tie-break or cosine
    change can never diverge between them."""
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cluster"))
    out = (
        v.crossJoin(F.broadcast(cent))
        .withColumn("cos", _cos_cols("e", "nrm", "ce", "cn"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    cols = ["vec_id", "e", "nrm", "cluster"] + (["cos"] if keep_cos else [])
    return out.select(*cols)


def _update(assigned: DataFrame) -> DataFrame:
    """Centroid update with order-independent fixed-point component sums:
    sum int64 ``floor(x*10^{SEM_FXP}+0.5)`` per (cluster, dim), divide
    once at the end — bit-identical across partitionings and engines."""
    comps = assigned.select(
        "cluster", F.posexplode("e").alias("pos", "x")
    ).select(
        "cluster", (F.col("pos") + 1).alias("dim"), fxp(F.col("x"), SEM_FXP).alias("xf")
    )
    cell = comps.groupBy("cluster", "dim").agg(
        F.sum("xf").alias("s"), F.count("*").alias("cnt")
    )
    comp = (
        F.col("s").cast("double")
        / (F.col("cnt").cast("double") * float(10**SEM_FXP))
    ).alias("comp")
    cent = (
        cell.select("cluster", "dim", comp)
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda st: st.comp,
            ).alias("ce")
        )
    )
    cn = F.sqrt(
        F.aggregate(
            F.transform("ce", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return cent.select("cluster", "ce", cn.alias("cn")).filter(F.col("cn") > 0)


def _final_assignment(spark: SparkSession, sf_dir: str,
                      k: int = SEM_K, iters: int = SEM_ITERS) -> DataFrame:
    """K-means with ``iters`` Lloyd iterations; init = vec_id < ``k``.
    Pure DAG construction — the driver never collects. Defaults
    ({SEM_K}, {SEM_ITERS}) reproduce the gate oracle; each extra
    iteration appends one broadcast-argmax assignment + one
    fixed-point update to the plan (cost linear in ``iters``; the
    recall/convergence exhibit in BENCH/IVF_RECALL.json measures where
    extra passes stop paying on this corpus)."""
    v = _vectors(spark, sf_dir)
    cent = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("long").alias("cluster"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    for _ in range(iters):
        cent = _update(_assign(v, cent))
    return _assign(v, cent, keep_cos=True)


def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final (vec_id, cluster, cos_fxp6) after {SEM_ITERS} relational
    Lloyd iterations (see module docstring for the exactness design)."""
    return _final_assignment(spark, sf_dir).select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        fxp(F.col("cos"), 6).alias("cos_fxp6"),
    )


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop flags: drop a vector when a same-cluster
    neighbour with pairwise cosine ≥ {SEM_DUP_THRESHOLD} and a smaller
    vec_id exists. Pair join keyed by cluster — bounded cells."""
    # lazy localCheckpoint, NOT persist(): the assignment is referenced
    # three times below (both pair sides + the final keep-join), so without
    # materialization Spark would re-execute the full SEM_ITERS Lloyd DAG
    # once per reference. A persist() would pin the blocks in the session's
    # CacheManager forever (no caller ever unpersists a registry query);
    # the checkpointed RDD is held only by this DataFrame's plan, so the
    # ContextCleaner frees its blocks once the result is unreachable.
    a = _final_assignment(spark, sf_dir).localCheckpoint(eager=False)
    left = a.select(
        "cluster",
        F.col("vec_id").alias("b_id"),
        F.col("e").alias("be"),
        F.col("nrm").alias("bn"),
    )
    right = a.select(
        "cluster",
        F.col("vec_id").alias("a_id"),
        F.col("e").alias("ae"),
        F.col("nrm").alias("an"),
    )
    dropped = (
        left.join(right, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(_cos_cols("ae", "an", "be", "bn") >= SEM_DUP_THRESHOLD)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("drop", F.lit(1))
    )
    return (
        a.select("vec_id", F.col("cluster").cast("long").alias("cluster"))
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("drop").isNotNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("keep"),
        )
    )


# --- semdedup SQL oracles (unrolled Lloyd iterations) -------------------------

_SQL_NRM = "sqrt(list_reduce(list_transform(e, x -> x * x), (a, x) -> a + x))"

_SQL_V_CTE = f"""
nn AS (
  SELECT vec_id, e, {_SQL_NRM} AS nrm
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
  WHERE {_SQL_NRM} > 0
)
"""


def _sql_cos(q: str, c: str, qe: str = "e", ce: str = "ce") -> str:
    return (
        f"list_reduce(list_transform(range(1, len({q}.{qe}) + 1),"
        f" i -> {q}.{qe}[i] * {c}.{ce}[i]), (x, y) -> x + y)"
        f" / ({q}.nrm * {c}.cn)"
    )


def _sql_assign(name: str, cent: str) -> str:
    return f"""
{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {_sql_cos('q', 'c')} DESC, c.cluster ASC) AS rn
    FROM nn q, {cent} c
  ) WHERE rn = 1
)"""


def _sql_update(name: str, assign: str) -> str:
    scale = float(10**SEM_FXP)
    return f"""
{name}_cell AS (
  SELECT a.cluster, d.i AS dim,
    CAST(sum({sql_fxp('q.e[d.i]', SEM_FXP)}) AS BIGINT) AS s,
    count(*) AS cnt
  FROM {assign} a
  JOIN nn q USING (vec_id), unnest(range(1, len(q.e) + 1)) AS d(i)
  GROUP BY a.cluster, d.i
),
{name}_raw AS (
  SELECT cluster,
    list(CAST(s AS DOUBLE) / (CAST(cnt AS DOUBLE) * {scale}) ORDER BY dim) AS ce
  FROM {name}_cell GROUP BY cluster
),
{name} AS (
  SELECT cluster, ce,
    sqrt(list_reduce(list_transform(ce, x -> x * x), (a, x) -> a + x)) AS cn
  FROM {name}_raw
  WHERE sqrt(list_reduce(list_transform(ce, x -> x * x), (a, x) -> a + x)) > 0
)"""


def _sql_kmeans_ctes() -> str:
    parts = [
        _SQL_V_CTE,
        f"""
c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cluster, e AS ce, nrm AS cn
  FROM nn WHERE vec_id < {SEM_K}
)""",
    ]
    cent = "c0"
    for it in range(SEM_ITERS):
        parts.append(_sql_assign(f"a{it}", cent))
        parts.append(_sql_update(f"c{it + 1}", f"a{it}"))
        cent = f"c{it + 1}"
    parts.append(
        f"""
final AS (
  SELECT vec_id, cluster, cos FROM (
    SELECT q.vec_id, c.cluster, {_sql_cos('q', 'c')} AS cos,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {_sql_cos('q', 'c')} DESC, c.cluster ASC) AS rn
    FROM nn q, {cent} c
  ) WHERE rn = 1
)"""
    )
    return ",".join(parts)


SEMDEDUP_CLUSTERS_SQL = f"""
WITH {_sql_kmeans_ctes()}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
  {sql_fxp('cos', 6)} AS cos_fxp6
FROM final
"""

SEMDEDUP_PRUNE_SQL = f"""
WITH {_sql_kmeans_ctes()},
fv AS (
  SELECT f.vec_id, f.cluster, q.e, q.nrm
  FROM final f JOIN nn q USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM fv a JOIN fv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_sql_cos('a', 'b', qe='e', ce='e').replace('b.cn', 'b.nrm')} >= {SEM_DUP_THRESHOLD}
)
SELECT f.vec_id, CAST(f.cluster AS BIGINT) AS cluster,
  CAST(CASE WHEN d.vec_id IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS keep
FROM final f LEFT JOIN dropped d ON f.vec_id = d.vec_id
"""
