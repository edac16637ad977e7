"""Round-5 adjudication of the extract_documents r3->r4 slowdown
(VERDICT r4 next-round #1): interleaved same-JVM ABBA between the HEAD
flagship (auto broadcast pre-flight, operators/extract.py:327) and the
exact round-3 plan (broadcast_spans=True, share_spans=True forced), plus
a pinned headline re-draw series under recorded bare-kernel ceiling
probes.

The r4 code diff on this path is only the stats pre-flight
(_span_refs_fit_broadcast) which, for a parquet input far under the
32 GiB cap, resolves to the SAME pinned plan as r3 — so the expected
outcome is plan parity (ratio ~1.0) and the r3->r4 residual attributes
to host phases. If the ratio is NOT ~1.0, the pre-flight itself is the
regression and must be fixed.

Arms (ABBA on one warm JVM, probes before/after, 3-rep mini-probes
between reps optional):

* ``head``:  extract.extract_documents(docs, media)            # r4 auto
* ``r3pin``: extract.extract_documents(docs, media,
             broadcast_spans=True, share_spans=True)           # r3 exact

Usage: python BENCH/ab_extract_r5.py [--reps 6] [--docs 8000]
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

from ocr_platform_spark.operators import extract  # noqa: E402
from ocr_platform_spark.session import get_spark  # noqa: E402


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
    ap.add_argument("--docs", type=int, default=8000)
    args = ap.parse_args()

    # the bench harness's cached corpus (same shape as the driver draw)
    import bench

    probe_before = ceiling_probe()
    spark = get_spark("ab_extract_r5")
    corpus_dir = bench._corpus_dir(args.docs, 200)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media.parquet")
    n_pages = media.groupBy().sum("page_count").collect()[0][0] or 0

    def time_head() -> float:
        return run_noop(extract.extract_documents(docs, media))

    def time_r3pin() -> float:
        return run_noop(extract.extract_documents(
            docs, media, broadcast_spans=True, share_spans=True))

    # warm-up (codegen/class-load), excluded
    time_head()
    time_r3pin()

    results: dict[str, list[float]] = {"head": [], "r3pin": []}
    for i in range(args.reps):
        order = (
            [("head", time_head), ("r3pin", time_r3pin)]
            if i % 2 == 0 else
            [("r3pin", time_r3pin), ("head", time_head)]
        )
        for name, fn in order:
            results[name].append(fn())

    spark.stop()
    probe_after = ceiling_probe()

    out = {
        "docs": args.docs, "pages": int(n_pages), "reps": args.reps,
        "ceiling_before_pps": round(probe_before, 1),
        "ceiling_after_pps": round(probe_after, 1),
    }
    for name, ts in results.items():
        out[name + "_sec"] = [round(t, 2) for t in ts]
        out[name + "_median"] = round(statistics.median(ts), 3)
        out[name + "_best"] = round(min(ts), 3)
    out["head_over_r3pin_median"] = round(
        out["head_median"] / out["r3pin_median"], 3)
    out["head_best_pages_per_sec"] = round(n_pages / out["head_best"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
