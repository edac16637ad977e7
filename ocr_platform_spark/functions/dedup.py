"""Deduplication over the ``documents`` / ``embeddings`` tables.

Five dedup families a web-scale training-data pipeline needs, each as a
Spark DataFrame builder + DuckDB oracle:

* exact (hash-groupBy),
* n-gram Jaccard (shingle inverted index → candidate pairs → exact verify),
* MinHash signatures + LSH banding,
* SimHash (60-bit) + banded Hamming pairs,
* embedding-cosine near-dup.

Scale design (10^12 docs): the pairwise steps never materialize the full
cross product — candidates come from equi-joins on shingle/band/chunk keys
(shuffle-hash joins on high-cardinality keys, AQE handles residual skew).
Hot shingles (stop-shingles shared by millions of docs) are the classic
blow-up; ``ngram_jaccard_pairs`` drops shingles above a document-frequency
cap — the standard "stop-shingle" filter — keeping candidate lists bounded.
Signature computation itself is a narrow map (no shuffle).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import fxp, hash60, shingles, sql_fxp, sql_hash60, sql_shingles, sql_tokens, tokens

MINHASH_K = 16          # permutations
LSH_BANDS = 4           # bands of MINHASH_K // LSH_BANDS rows
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 60       # fits signed int64
# Banding must pigeonhole-cover the pair radius: with HAMMING_THRESHOLD=6,
# 7 chunks guarantee any qualifying pair shares at least one unchanged
# chunk (6 differing bits can touch at most 6 of 7 chunks) — the output
# contract is therefore EXACT recall at radius 6, not best-effort.
# 60 bits / 7 chunks -> 9-bit chunks (the 7th covers bits 54-59).
SIMHASH_CHUNKS = 7
SIMHASH_CHUNK_BITS = 9
SIMHASH_CHUNK_MASK = (1 << SIMHASH_CHUNK_BITS) - 1
HAMMING_THRESHOLD = 6
# sf testdata vectors are near-orthogonal (max pairwise cos ≈ 0.51);
# 0.35 keeps the check non-trivial (~top 0.1% of pairs) while the operator
# semantics are threshold-independent
COSINE_DUP_THRESHOLD = 0.35
SHINGLE_DF_CAP = 100    # stop-shingle document-frequency cap (sf0.01 scale)


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", tokens(F.col("text")).alias("t"))
    )


_TOK_CTE = f"SELECT doc_id, {sql_tokens('text')} AS t FROM documents"


# --- exact dedup -------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical doc per normalized-text hash: min doc_id survives."""
    docs = _docs_tokens(spark, sf_dir)
    return (
        docs.select(F.md5(F.array_join("t", " ")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fp")
    )


DEDUP_EXACT_SQL = f"""
WITH tok AS ({_TOK_CTE})
SELECT min(doc_id) AS doc_id, md5(array_to_string(t, ' ')) AS fp
FROM tok GROUP BY 2
"""


# --- n-gram Jaccard ----------------------------------------------------------


def _materialized(
    df: DataFrame, checkpoint_dir: str | None, name: str, source_key: str
) -> DataFrame:
    """Optional write-once parquet materialization of an index frame.

    ``checkpoint_dir=None`` keeps the pure-DAG behavior (each consumer
    recomputes the frame — right for one-shot gate/bench sessions where a
    cache would pin executor memory for the session lifetime). At real
    scale pass a durable dir: the index is computed ONCE, lands as a
    partitioned parquet table, and every consumer (sizes, intersections,
    band joins) scans the materialized table instead of re-running
    tokenize + shingle + stop-filter per reference — this is the
    "checkpointed table at real scale" story, executable.

    The path is keyed by a fingerprint of the SOURCE — the corpus dir
    plus, for local paths, the (name, size, mtime) of its parquet parts —
    and the write is WRITE-ONCE (skipped when a committed table already
    exists): a second builder sharing the dir must not overwrite the
    files underneath a DataFrame the first builder already returned (an
    eager re-overwrite was reproduced to fail later reads with
    FAILED_READ_FILE), two corpora sharing one dir must not serve each
    other's shingles, and an in-place regenerated corpus gets a NEW key
    instead of silently serving stale shingles. The _SUCCESS probe goes
    through the Hadoop FileSystem API, so durable dirs (hdfs://, s3a://)
    resolve correctly — a driver-local os.path probe would always miss
    there and re-overwrite every call. Delete the subdir to force a
    recompute; concurrent first-writes to one new path are not
    coordinated (single-driver usage)."""
    if checkpoint_dir is None:
        return df
    key = hashlib.md5(source_key.encode()).hexdigest()[:10]
    path = os.path.join(checkpoint_dir, f"{name}-{key}")
    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "_SUCCESS"))
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _source_fingerprint(sf_dir: str) -> str:
    """Cache key for a corpus dir: path + (relname, size, mtime_ns) of the
    local parquet parts of the documents table when statable (remote URIs
    fall back to the path alone — content changes there should use a new
    path or delete the cache subdir)."""
    parts = [sf_dir]
    doc = os.path.join(sf_dir, "documents.parquet")
    if os.path.isfile(doc):
        st = os.stat(doc)
        parts.append(f"documents.parquet:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.isdir(doc):
        for root, _dirs, files in sorted(os.walk(doc)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(root, f))
                    rel = os.path.relpath(os.path.join(root, f), doc)
                    parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    return "\x00".join(parts)


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct rows, stop-shingles dropped."""
    docs = _docs_tokens(spark, sf_dir)
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("t"), 3))).alias("s")
    )
    # stop-shingle filter: drop shingles present in > SHINGLE_DF_CAP docs.
    # At 10^12 docs this is the step that keeps the inverted index joinable;
    # window-count per shingle key (one shuffle on s).
    df_per_shingle = sh.groupBy("s").agg(F.count("*").alias("df"))
    return sh.join(
        F.broadcast(df_per_shingle.filter(F.col("df") > SHINGLE_DF_CAP)),
        "s",
        "left_anti",
    )


# assumes a CTE named ``tok`` (doc_id, t) is already in scope
_SHINGLE_CTE_BODY = f"""
sh0 AS (
  SELECT doc_id, unnest(list_distinct({sql_shingles('t', 3)})) AS s FROM tok
),
hot AS (
  SELECT s FROM sh0 GROUP BY s HAVING count(*) > {SHINGLE_DF_CAP}
),
sh AS (
  SELECT doc_id, s FROM sh0 WHERE s NOT IN (SELECT s FROM hot)
)
"""


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= threshold.

    The shingle index is recomputed per consumer by default (these
    builders run in long-lived sessions — bench, driver gate — where a
    cache would pin executor memory for the session's lifetime); pass
    ``checkpoint_dir`` to materialize it once as a parquet table (the
    real-scale shape; see :func:`_materialized`).
    """
    sh = _materialized(
        _shingle_rows(spark, sf_dir), checkpoint_dir, "shingles",
        _source_fingerprint(sf_dir),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    j = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        inter.join(na, "a_id")
        .join(nb, "b_id")
        .filter(j >= F.lit(JACCARD_THRESHOLD))
        .select("a_id", "b_id", fxp(j).alias("jaccard_fxp4"))
    )


NGRAM_JACCARD_SQL = f"""
WITH tok AS ({_TOK_CTE}),
{_SHINGLE_CTE_BODY},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
  {sql_fxp('CAST(inter AS DOUBLE) / (na.n + nb.n - inter)')} AS jaccard_fxp4
FROM inter
JOIN sizes na ON na.doc_id = a_id
JOIN sizes nb ON nb.doc_id = b_id
WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH -----------------------------------------------------------
#
# One md5 per shingle; the K=16 permutation values are derived from it by
# Kirsch–Mitzenmacher double hashing, h_k = (h1 + k*h2) mod 2^60, with h1
# the first 60 digest bits and h2 split into two 30-bit halves so every
# intermediate fits a signed 64-bit integer in both engines (no ANSI
# overflow):  h_k = (v1 + ((k*vh) % 2^30)*2^30 + k*vl) % 2^60.
# This cuts hashing cost ~16x vs the former one-md5-per-(k, shingle)
# scheme, and the derivation is mirrored exactly in DuckDB SQL.

_M30 = 1 << 30
_MASK30 = _M30 - 1
_M60 = 1 << 60


def _sql_hk(d: str, k: str) -> str:
    """DuckDB mirror of the double-hash derivation over hex digest ``d``."""
    v1 = f"CAST(CAST('0x' || substr({d}, 1, 15) AS UBIGINT) AS BIGINT)"
    vh = f"(CAST(CAST('0x' || substr({d}, 16, 8) AS UBIGINT) AS BIGINT) & {_MASK30})"
    vl = f"(CAST(CAST('0x' || substr({d}, 24, 8) AS UBIGINT) AS BIGINT) & {_MASK30})"
    return f"(({v1} + (({k} * {vh}) % {_M30}) * {_M30} + {k} * {vl}) % {_M60})"


_SQL_DS = f"""
list_transform(
  CASE WHEN len(list_distinct({sql_shingles('t', 3)})) > 0
       THEN list_distinct({sql_shingles('t', 3)})
       ELSE [array_to_string(t, ' ')] END,
  s -> md5(s))
"""

# expects a column ``ds`` (list of per-shingle md5 hex digests) in scope
_SQL_SIG = f"""
list_transform(range(0, {MINHASH_K}), k ->
  list_aggregate(list_transform(ds, d -> {_sql_hk('d', 'k')}), 'min'))
"""

_SIG_CTE = f"dsig AS (SELECT doc_id, {_SQL_DS} AS ds FROM tok)"


def _signature_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig: array<long>) via explode + {MINHASH_K} flat min-aggs.

    One shuffle on doc_id with map-side partial mins; the basis explode
    (distinct shingles, or the normalized text for <3-token docs) never
    leaves a doc without rows, so no re-attach join is needed. The md5 is
    evaluated once per shingle row; the K mins run over cheap codegen'd
    integer arithmetic on its 120 digest bits.
    """
    docs = _docs_tokens(spark, sf_dir)
    sh = F.array_distinct(shingles(F.col("t"), 3))
    basis = F.when(F.size(sh) > 0, sh).otherwise(
        F.array(F.array_join("t", " "))
    )
    rows = docs.select("doc_id", F.explode(basis).alias("s"))
    d = F.md5("s")
    pre = rows.select(
        "doc_id",
        F.conv(F.substring(d, 1, 15), 16, 10).cast("long").alias("v1"),
        F.conv(F.substring(d, 16, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(_MASK30))
        .alias("vh"),
        F.conv(F.substring(d, 24, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(_MASK30))
        .alias("vl"),
    )
    agg = pre.groupBy("doc_id").agg(
        *[
            F.min(
                (
                    F.col("v1")
                    + ((F.lit(k) * F.col("vh")) % F.lit(_M30)) * F.lit(_M30)
                    + F.lit(k) * F.col("vl")
                )
                % F.lit(_M60)
            ).alias(f"m{k}")
            for k in range(MINHASH_K)
        ]
    )
    return agg.select(
        "doc_id", F.array(*[f"m{k}" for k in range(MINHASH_K)]).alias("sig")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature, emitted as a canonical string."""
    return _signature_cols(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.transform("sig", lambda v: v.cast("string")), "-"
        ).alias("sig"),
    )


MINHASH_SIGNATURES_SQL = f"""
WITH tok AS ({_TOK_CTE}),
{_SIG_CTE}
SELECT doc_id,
  array_to_string(list_transform({_SQL_SIG}, v -> CAST(v AS VARCHAR)), '-')
    AS sig
FROM dsig
"""


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """LSH candidate pairs (band-hash equi-join) verified by exact Jaccard.

    Banding: {LSH_BANDS} bands x {MINHASH_K // LSH_BANDS} rows; candidates
    share at least one full band. Verification recomputes exact Jaccard on
    the distinct-shingle sets (same CTE as :func:`ngram_jaccard_pairs`), so
    LSH only controls recall — precision is exact.

    ``checkpoint_dir``: materialize the shingle index once (consumed by
    both the sizes aggregate and the intersection join) instead of
    recomputing tokenize+shingle+stop-filter per consumer — the
    real-scale shape (see :func:`_materialized`).
    """
    docs = _signature_cols(spark, sf_dir)
    rows_per_band = MINHASH_K // LSH_BANDS
    bands = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ":",
                    )
                ),
            )
        ).alias("band", "bh"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sh = _materialized(
        _shingle_rows(spark, sf_dir), checkpoint_dir, "shingles",
        _source_fingerprint(sf_dir),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), "s"), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), "s"), ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    j = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb")), "b_id")
        .filter(j >= F.lit(JACCARD_THRESHOLD))
        .select("a_id", "b_id", fxp(j).alias("jaccard_fxp4"))
    )


_RPB = MINHASH_K // LSH_BANDS
MINHASH_LSH_PAIRS_SQL = f"""
WITH tok AS ({_TOK_CTE}),
{_SIG_CTE},
sig AS (SELECT doc_id, {_SQL_SIG} AS sig FROM dsig),
bands AS (
  SELECT doc_id, b AS band,
    md5(array_to_string(
      list_transform(range(0, {_RPB}),
                     i -> CAST(sig[b * {_RPB} + i + 1] AS VARCHAR)), ':')) AS bh
  FROM sig, unnest(range(0, {LSH_BANDS})) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
{_SHINGLE_CTE_BODY.strip()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.a_id
  JOIN sh b ON b.doc_id = c.b_id AND b.s = a.s
  GROUP BY 1, 2
)
SELECT a_id, b_id,
  {sql_fxp('CAST(inter AS DOUBLE) / (na.n + nb.n - inter)')} AS jaccard_fxp4
FROM inter
JOIN sizes na ON na.doc_id = a_id
JOIN sizes nb ON nb.doc_id = b_id
WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= {JACCARD_THRESHOLD}
"""


# --- SimHash -----------------------------------------------------------------
# 60-bit simhash: per token, a 60-bit md5-derived value; bit b of the
# signature is set iff sum over tokens of (+1 if bit set else -1) >= 0.
# Empty token list => simhash 0 (both engines; Spark's explode drops the
# doc, re-attached with coalesce(0); DuckDB's list_sum of [] is NULL).
#
# Spark shape: explode tokens -> one shuffle-free partial-agg groupBy with
# 60 flat codegen'd sum expressions (higher-order array lambdas are
# interpreted per element — ~10x slower at scale).


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document over token multiset."""
    docs = _docs_tokens(spark, sf_dir)
    tv = docs.select(
        "doc_id", F.explode("t").alias("tok")
    ).select("doc_id", hash60(F.col("tok")).alias("v"))
    sums = tv.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.expr(f"(shiftright(v, {b}) & 1) = 1"), F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = sums.select(
        "doc_id",
        sum(
            F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(SIMHASH_BITS)
        ).cast("long").alias("simhash"),
    )
    return (
        docs.select("doc_id")
        .join(sim, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"),
        )
    )


SIMHASH_SQL = f"""
WITH tok AS ({_TOK_CTE}),
tv AS (
  SELECT doc_id, list_transform(t, x -> {sql_hash60('x')}) AS tv FROM tok
)
SELECT doc_id,
  CAST(list_sum(
    list_transform(range(0, {SIMHASH_BITS}), b ->
      CASE WHEN CAST(list_sum(
          list_transform(tv, v ->
            CASE WHEN ((v >> b) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) >= 0
      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
  AS simhash
FROM tv
"""


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL pairs with Hamming(simhash) <= {HAMMING_THRESHOLD}, found via
    {SIMHASH_CHUNKS}-chunk banding — exact recall by pigeonhole (see the
    SIMHASH_CHUNKS comment), never a cross join. Narrower chunks mean more
    candidates to verify; the verify step (bit_count) is cheap."""
    sims = simhash(spark, sf_dir)
    chunks = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_CHUNKS - 1}), "
                f"c -> (shiftright(simhash, c * {SIMHASH_CHUNK_BITS})"
                f" & {SIMHASH_CHUNK_MASK}))"
            )
        ).alias("chunk", "cv"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(
        F.col("a_sim").bitwiseXOR(F.col("b_sim"))
    )
    return (
        a.join(b, ["chunk", "cv"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("a_sim"),
            F.col("b.simhash").alias("b_sim"),
        )
        .distinct()
        .filter(ham <= F.lit(HAMMING_THRESHOLD))
        .select("a_id", "b_id", ham.cast("long").alias("hamming"))
    )


SIMHASH_PAIRS_SQL = f"""
WITH tok AS ({_TOK_CTE}),
tv AS (
  SELECT doc_id, list_transform(t, x -> {sql_hash60('x')}) AS tv FROM tok
),
sims AS (
  SELECT doc_id,
    CAST(list_sum(
      list_transform(range(0, {SIMHASH_BITS}), b ->
        CASE WHEN CAST(list_sum(
            list_transform(tv, v ->
              CASE WHEN ((v >> b) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) >= 0
        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
    AS simhash
  FROM tv
),
chunks AS (
  SELECT doc_id, simhash, c AS chunk,
         (simhash >> (c * {SIMHASH_CHUNK_BITS})) & {SIMHASH_CHUNK_MASK} AS cv
  FROM sims, unnest(range(0, {SIMHASH_CHUNKS})) AS u(c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                  a.simhash AS a_sim, b.simhash AS b_sim
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cv = b.cv
  WHERE a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(a_sim, b_sim)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(a_sim, b_sim)) <= {HAMMING_THRESHOLD}
"""


# --- embedding cosine near-dup ----------------------------------------------


# hard ceiling for the exact O(n^2) tier: beyond this, the crossJoin is a
# mistake by construction — use embedding_near_dup_lsh (the banded path)
EXACT_NEAR_DUP_MAX_ROWS = 100_000


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector pairs with cosine >= {COSINE_DUP_THRESHOLD} — the EXACT
    verify tier, deliberately O(n^2).

    Guarded: refuses inputs above EXACT_NEAR_DUP_MAX_ROWS rows so the
    cross join can't be pointed at a big table by accident — the scale
    path is :func:`ocr_platform_spark.functions.similarity.
    embedding_near_dup_lsh` (band-keyed candidates, exact verify;
    tests/test_dedup_recall.py measures its recall against this tier).
    Vector loading and the sequential cosine fold are shared with the
    similarity module (one bit-exactness-critical implementation)."""
    from . import similarity

    emb = similarity._vectors(spark, sf_dir)
    # bounded guard scan: limit(N+1).count() decides over-limit without
    # scanning the whole table the guard exists to protect against
    n = emb.limit(EXACT_NEAR_DUP_MAX_ROWS + 1).count()
    if n > EXACT_NEAR_DUP_MAX_ROWS:
        raise ValueError(
            f"embedding_near_dup is the exact O(n^2) verify tier and got "
            f"> {EXACT_NEAR_DUP_MAX_ROWS} rows; use "
            f"similarity.embedding_near_dup_lsh for large inputs"
        )
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = similarity._cos("ea", "na", "eb", "nb")
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= F.lit(COSINE_DUP_THRESHOLD))
        .select("a_id", "b_id", fxp(F.col("cos"), 6).alias("cos_fxp6"))
    )


EMBEDDING_NEAR_DUP_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
n AS (
  SELECT vec_id, e,
    sqrt(list_reduce(list_transform(e, x -> x * x), (a, x) -> a + x)) AS nrm
  FROM e
),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
    list_reduce(
      list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]),
      (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
  FROM n a, n b
  WHERE a.vec_id < b.vec_id AND a.nrm > 0 AND b.nrm > 0
)
SELECT a_id, b_id, {sql_fxp('cos', 6)} AS cos_fxp6
FROM p WHERE cos >= {COSINE_DUP_THRESHOLD}
"""
