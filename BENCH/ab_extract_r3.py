"""Interleaved A/B for the round-3 extract_documents plan change
(VERDICT r2 next-round #1): OLD 4-scan plan vs NEW shared-localCheckpoint
plan, alternating reps on the SAME warm JVM so host phases hit both arms,
with a bare-kernel multiprocessing ceiling probe before and after the
suite to adjudicate host drift.

OLD arm = the 4-scan plan reconstructed from the same building blocks
(``decode_pages(..., spans=None)`` + ``assemble_spans(..., spans=None)``),
re-deriving ``exploded_spans(documents)`` per consumer. NOTE on
attribution: BOTH arms carry the round-3 pinned ``F.broadcast`` hint
(decode_pages applies it regardless of the spans source), so this A/B
isolates the SCAN-SHARING change alone — it does not measure the
broadcast-pinning component of the r2->r3 delta, which is justified
separately as estimate-robustness (ADVICE r2 #3), not as a speedup.

Usage: python BENCH/ab_extract_r3.py [--reps 4] [--docs 8000]
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

from ocr_platform_spark import corpus as corpus_mod  # noqa: E402
from ocr_platform_spark.operators import extract  # noqa: E402
from ocr_platform_spark.session import get_spark  # noqa: E402


def old_plan(docs, media, num_partitions=None):
    pages = extract.decode_pages(docs, media)  # spans=None: re-explodes
    blocks = extract.ocr_blocks(pages, num_partitions=num_partitions)
    return extract.assemble_spans(docs, blocks)  # spans=None: re-explodes


def new_plan(docs, media, num_partitions=None):
    return extract.extract_documents(docs, media, num_partitions=num_partitions)


def run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def ceiling_probe() -> float:
    """pages/sec of the bare kernels at n=8 procs (fresh processes, no
    Spark) — the in-window host-health number."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "hardware_ceiling.py"),
         "--n", "8", "--pages", "400"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["pages_per_sec_small"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--docs", type=int, default=8000)
    args = ap.parse_args()

    d = os.path.join(REPO, ".bench_corpus", f"d{args.docs}_p200_f32")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        corpus_mod.write_parquet(d, args.docs, max_pages=200, n_files=32)

    probe_before = ceiling_probe()

    spark = get_spark("ab_extract_r3")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    media = spark.read.parquet(f"{d}/media.parquet")

    # warm-up both arms (codegen/class-load), excluded
    run_noop(old_plan(docs.limit(8), media))
    run_noop(new_plan(docs.limit(8), media))

    old_t: list[float] = []
    new_t: list[float] = []
    for i in range(args.reps):
        # ABBA ordering so slow host phases hit both arms symmetrically
        if i % 2 == 0:
            old_t.append(run_noop(old_plan(docs, media)))
            new_t.append(run_noop(new_plan(docs, media)))
        else:
            new_t.append(run_noop(new_plan(docs, media)))
            old_t.append(run_noop(old_plan(docs, media)))
    spark.stop()

    probe_after = ceiling_probe()

    print(json.dumps({
        "docs": args.docs,
        "reps": args.reps,
        "old_sec": [round(t, 2) for t in old_t],
        "new_sec": [round(t, 2) for t in new_t],
        "old_median": round(statistics.median(old_t), 2),
        "new_median": round(statistics.median(new_t), 2),
        "old_best": round(min(old_t), 2),
        "new_best": round(min(new_t), 2),
        "speedup_median": round(statistics.median(old_t) / statistics.median(new_t), 3),
        "ceiling_pages_per_sec_before": round(probe_before, 1),
        "ceiling_pages_per_sec_after": round(probe_after, 1),
    }))


if __name__ == "__main__":
    main()
