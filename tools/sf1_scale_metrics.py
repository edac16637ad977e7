"""Spark-side scale metrics for the candidate-generating family at a
larger scale point (VERDICT r4 #6): per-query wall, SHUFFLE bytes
(read+write, from the Spark UI REST API), and output/candidate row
counts — the numbers that say whether the bucketed candidate shapes
hold as the corpus grows.

Usage: python tools/sf1_scale_metrics.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_platform_spark.queries import REGISTRY
from ocr_platform_spark.session import get_spark

FAMILY = [
    "dedup_exact", "minhash_signatures", "minhash_lsh_pairs", "simhash",
    "simhash_pairs", "ngram_jaccard_pairs", "lsh_buckets",
    "embedding_near_dup_lsh", "dedup_groups", "semdedup_clusters",
    "semdedup_prune", "ann_bruteforce_topk", "ann_ivf_topk", "ann_recall",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def _shuffle_totals(base: str, app_id: str) -> tuple[int, int]:
    total_r = total_w = 0
    for st in _api(base, f"/api/v1/applications/{app_id}/stages?status=complete"):
        total_r += st.get("shuffleReadBytes", 0)
        total_w += st.get("shuffleWriteBytes", 0)
    return total_r, total_w


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else ".testdata_synth/sf1"
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    # the engine default disables the UI; this tool needs the REST
    # metrics endpoint, so re-enable it for this session only
    spark = get_spark("sf1_scale",
                      extra_conf={"spark.ui.enabled": "true"})
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if base is None:
        raise SystemExit("Spark UI unavailable (another session holds "
                         "the conf?) — rerun in a fresh process")

    rows = []
    for name in FAMILY:
        fn, _sql = REGISTRY[name]
        r0, w0 = _shuffle_totals(base, app_id)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        # completed-stage metrics can lag the job end slightly
        time.sleep(0.5)
        r1, w1 = _shuffle_totals(base, app_id)
        rows.append({
            "query": name, "rows": int(n), "wall_s": round(wall, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
        })
        print(rows[-1], flush=True)
    spark.stop()
    result = {"sf_dir": sf_dir, "queries": rows}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
