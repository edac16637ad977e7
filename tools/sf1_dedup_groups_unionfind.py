"""Independent exact oracle for ``dedup_groups`` at scale points where
the DuckDB recursive-CTE oracle stops being viable (sf1: >2h
single-threaded over the 3.57M-edge simhash_pairs graph, vs 99s for
the distributed operator itself).

Method: collect the IDENTICAL edge set the operator consumes
(``dedup.simhash_pairs``), run a plain path-compressed union-find,
derive (group_id = min member, group_size, is_canonical) per document,
and compare ALL output columns against the Spark result.

Usage: python tools/sf1_dedup_groups_unionfind.py [sf_dir]
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_platform_spark.functions import curation, dedup
from ocr_platform_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else ".testdata_synth/sf1"
    spark = get_spark("uf_oracle")
    t0 = time.time()
    got = {r["doc_id"]: (r["group_id"], r["group_size"], r["is_canonical"])
           for r in curation.dedup_groups(spark, sf).collect()}
    pairs = dedup.simhash_pairs(spark, sf).select("a_id", "b_id").collect()
    all_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id").collect()
    ]

    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in pairs:
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members = defaultdict(list)
    for d in all_ids:
        members[find(d)].append(d)
    want: dict = {}
    for ms in members.values():
        g, n = min(ms), len(ms)
        for d in ms:
            want[d] = (g, n, d == g)

    mismatches = sum(1 for d in all_ids if got.get(d) != want[d])
    print({
        "docs": len(all_ids), "edges": len(pairs),
        "groups_spark": len({v[0] for v in got.values()}),
        "groups_unionfind": len({v[0] for v in want.values()}),
        "mismatches": mismatches,
        "wall_s": round(time.time() - t0, 1),
    })
    spark.stop()
    if mismatches:
        sys.exit(1)
    print("dedup_groups: EXACT MATCH vs union-find "
          "(group_id, group_size, is_canonical)")


if __name__ == "__main__":
    main()
