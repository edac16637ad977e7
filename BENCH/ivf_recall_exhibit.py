"""IVF ANN operating-point exhibit (VERDICT r4 #7): recall@k vs nprobe
at two centroid counts, candidate-scan fractions, and the
trained-vs-deterministic quantizer comparison across Lloyd iteration
budgets — measured with the SAME parameterized operators the gate
grades (functions/similarity.py).

Usage: python BENCH/ivf_recall_exhibit.py [--sf DIR]
Prints one JSON line (also the source of the SCALE.md table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ocr_platform_spark.functions import similarity  # noqa: E402
from ocr_platform_spark.session import get_spark  # noqa: E402


def mean_recall(spark, sf, ncent, nprobe, centroids=None) -> float:
    df = similarity.ann_recall(spark, sf, n_centroids=ncent,
                               nprobe=nprobe, centroids=centroids)
    row = df.agg(F.avg(F.col("recall_fxp4") / 1e4).alias("r")).first()
    return round(float(row["r"]), 4)


def scan_fraction(spark, sf, ncent, nprobe, centroids=None) -> float:
    """Mean fraction of the corpus scored per query = the IVF speedup
    lever (probed cells' population / corpus size)."""
    v = similarity._vectors(spark, sf)
    n_total = v.count()
    cent = centroids if centroids is not None else v.filter(
        F.col("vec_id") < ncent
    ).select(F.col("vec_id").alias("c_id"), F.col("e").alias("ce"),
             F.col("nrm").alias("cn"))
    from pyspark.sql import Window

    wa = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("c_id"))
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .withColumn("ccos", similarity._cos("e", "nrm", "ce", "cn"))
        .withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") == 1)
        .groupBy(F.col("c_id").alias("cell"))
        .agg(F.count("*").alias("pop"))
    )
    q = v.filter(F.col("vec_id") < similarity.N_QUERIES)
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("ccos", similarity._cos("e", "nrm", "ce", "cn"))
        .withColumn("r", F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                                 F.asc("c_id"))))
        .filter(F.col("r") <= nprobe)
        .select(F.col("vec_id").alias("q_id"), F.col("c_id").alias("cell"))
    )
    per_q = probes.join(assigned, "cell").groupBy("q_id").agg(
        F.sum("pop").alias("scanned"))
    row = per_q.agg(F.avg(F.col("scanned") / float(n_total)).alias("f")).first()
    return round(float(row["f"]), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark("ivf_recall")

    out: dict = {"sf": args.sf, "top_k": similarity.TOP_K,
                 "n_queries": similarity.N_QUERIES, "sweep": []}
    for ncent in (16, 64):
        for nprobe in (1, 2, 4, 8, 16):
            if nprobe > ncent:
                continue
            out["sweep"].append({
                "centroids": ncent, "nprobe": nprobe,
                "recall_at_10": mean_recall(spark, args.sf, ncent, nprobe),
                "scan_fraction": scan_fraction(spark, args.sf, ncent,
                                               nprobe),
            })

    # trained quantizer: Lloyd budgets at the mid operating point —
    # where does another pass stop paying?
    out["trained"] = []
    for ncent in (16, 64):
        for iters in (0, 1, 2, 4):
            cent = (None if iters == 0 else
                    similarity.ivf_train_centroids(spark, args.sf,
                                                   ncent, iters))
            out["trained"].append({
                "centroids": ncent, "lloyd_iters": iters, "nprobe": 4,
                "recall_at_10": mean_recall(spark, args.sf, ncent, 4,
                                            centroids=cent),
                "scan_fraction": scan_fraction(spark, args.sf, ncent, 4,
                                               centroids=cent),
            })
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
