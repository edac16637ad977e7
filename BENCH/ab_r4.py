"""Round-4 adjudication of the four r2->r3 bench regressions (VERDICT r3
next-round #1): interleaved same-JVM A/Bs for the two queries whose PLANS
changed in round 3, plus repeated in-window timings for the two whose
plans did not.

Arms (ABBA on one warm JVM, bare-kernel ceiling probes before/after):

* ``tfidf``: OLD = round-2 driver-side ``docs.count()`` scalar N folded
  as a literal; NEW = round-3 in-plan broadcast 1-row aggregate
  (textstats.py tfidf_top_terms). Semantically identical output.
* ``semdedup_prune``: OLD = round-2 ``persist()`` of the final Lloyd
  assignment (unpersisted after each rep so the arms stay symmetric —
  the shipped r2 code never unpersisted, which is WHY it was replaced);
  NEW = round-3 GC-cleanable ``localCheckpoint(eager=False)``.
* ``minhash_signatures`` / ``semdedup_clusters`` / ``repetition_scores``:
  no plan change r2->r3 — repeated timings under a recorded ceiling, to
  compare against BENCH_r02 (minhash 1.264s, semdedup_clusters 1.204s,
  repetition 0.909s) and BENCH_r03's degraded-window draws.

Usage: python BENCH/ab_r4.py [--reps 6] [--sf /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ocr_platform_spark.functions import pretrain, textstats  # noqa: E402
from ocr_platform_spark.functions.common import fxp, tokens  # noqa: E402
from ocr_platform_spark.queries import REGISTRY  # noqa: E402
from ocr_platform_spark.session import get_spark  # noqa: E402


def tfidf_old(spark, sf_dir):
    """Round-2 shape: N via a separate driver count() job (one extra full
    scan), then folded as a literal. Everything else identical."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    n_plus_1 = docs.count() + 1  # the old driver-side scalar
    tf = (
        docs.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.col("tf").cast("double") * (
        F.lit(float(n_plus_1)) / (F.col("df") + F.lit(1)).cast("double")
    )
    scored = tf.join(df_t, "term").select(
        "doc_id", "term", "tf", fxp(score, 6).alias("score_fxp6")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_fxp6"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= textstats.TFIDF_TOP_K)
        .select(
            "doc_id", F.col("rank").cast("long").alias("rank"),
            "term", "tf", "score_fxp6",
        )
    )


def semdedup_prune_old(spark, sf_dir):
    """Round-2 shape: persist() the final assignment (caller unpersists
    after the rep). Same joins/filters as pretrain.semdedup_prune."""
    a = pretrain._final_assignment(spark, sf_dir).persist()
    left = a.select(
        "cluster", F.col("vec_id").alias("b_id"),
        F.col("e").alias("be"), F.col("nrm").alias("bn"),
    )
    right = a.select(
        "cluster", F.col("vec_id").alias("a_id"),
        F.col("e").alias("ae"), F.col("nrm").alias("an"),
    )
    dropped = (
        left.join(right, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            pretrain._cos_cols("ae", "an", "be", "bn")
            >= pretrain.SEM_DUP_THRESHOLD
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("drop", F.lit(1))
    )
    out = (
        a.select("vec_id", F.col("cluster").cast("long").alias("cluster"))
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id", "cluster",
            F.when(F.col("drop").isNotNull(), F.lit(0))
            .otherwise(F.lit(1)).cast("long").alias("keep"),
        )
    )
    return out, a  # caller unpersists a


def run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def ceiling_probe() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "hardware_ceiling.py"),
         "--n", "8", "--pages", "400"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["pages_per_sec_small"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    probe_before = ceiling_probe()
    spark = get_spark("ab_r4")

    def time_tfidf_old():
        return run_noop(tfidf_old(spark, args.sf))

    def time_tfidf_new():
        return run_noop(textstats.tfidf_top_terms(spark, args.sf))

    def time_prune_old():
        df, cached = semdedup_prune_old(spark, args.sf)
        t = run_noop(df)
        cached.unpersist()
        return t

    def time_prune_new():
        return run_noop(pretrain.semdedup_prune(spark, args.sf))

    # warm-up (codegen/class-load), excluded
    for fn in (time_tfidf_old, time_tfidf_new, time_prune_old, time_prune_new):
        fn()

    results: dict[str, list[float]] = {
        "tfidf_old": [], "tfidf_new": [],
        "prune_old": [], "prune_new": [],
    }
    for i in range(args.reps):
        order = (
            [("tfidf_old", time_tfidf_old), ("tfidf_new", time_tfidf_new),
             ("prune_old", time_prune_old), ("prune_new", time_prune_new)]
            if i % 2 == 0 else
            [("tfidf_new", time_tfidf_new), ("tfidf_old", time_tfidf_old),
             ("prune_new", time_prune_new), ("prune_old", time_prune_old)]
        )
        for name, fn in order:
            results[name].append(fn())

    # unchanged-plan queries: repeated timings under the same ceiling
    steady: dict[str, list[float]] = {}
    for name in ("minhash_signatures", "semdedup_clusters", "repetition_scores"):
        fn, _sql = REGISTRY[name]
        run_noop(fn(spark, args.sf))  # warm
        steady[name] = [round(run_noop(fn(spark, args.sf)), 2)
                        for _ in range(args.reps)]
    spark.stop()
    probe_after = ceiling_probe()

    out = {
        "sf": args.sf, "reps": args.reps,
        "ceiling_before_pps": round(probe_before, 1),
        "ceiling_after_pps": round(probe_after, 1),
    }
    for name, ts in results.items():
        out[name + "_sec"] = [round(t, 2) for t in ts]
        out[name + "_median"] = round(statistics.median(ts), 3)
    out["tfidf_speedup_median_old_over_new"] = round(
        out["tfidf_old_median"] / out["tfidf_new_median"], 3)
    out["prune_speedup_median_old_over_new"] = round(
        out["prune_old_median"] / out["prune_new_median"], 3)
    for name, ts in steady.items():
        out[name + "_sec"] = ts
        out[name + "_median"] = round(statistics.median(ts), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
