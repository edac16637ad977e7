"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the flagship OCR-extraction job (docs/sec + pages/sec, the
BASELINE.json metric) over a deterministic heavy-tail corpus sized by sf,
plus representative operators from each family. Queries execute via the
``noop`` sink so the full plan runs without a driver collect.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default: all cores)
  BENCH_CORPUS_DOCS    override extraction corpus size
  BENCH_SKIP_WARMUP    set to skip the JVM warm-up pass
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_platform_spark import corpus as corpus_mod
from ocr_platform_spark.operators import extract
from ocr_platform_spark.queries import REGISTRY
from ocr_platform_spark.session import get_spark

# representative, scale-stable subset of REGISTRY for the per-round bench
# (pairwise-explosion queries like embedding_near_dup are correctness-only)
BENCH_QUERIES = [
    "pricing_summary",
    "orders_per_nation",
    "nation_parttype_profit",
    "topk_recent_orders",
    "reading_order_events",
    "session_spans",
    "value_range_bins",
    "session_json",
    "zip_align_events",
    "coord_convert",
    "token_stats",
    "quality_scores",
    "lang_id",
    "doc_fingerprints",
    "tfidf_top_terms",
    "dedup_exact",
    "minhash_signatures",
    "simhash",
    "lsh_buckets",
    "repetition_scores",
    "pii_scrub",
    "stratified_sample",
    "curated_corpus",
    "source_mix_weights",
    "pack_sequences",
    "contamination_check",
    "chunk_dedup",
    "length_histogram",
    "semdedup_clusters",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "payload_stats",
    # audio/video multimodal tier (synth -> real encode/decode/feature
    # inside the plan; deterministic doc subset, so scale-stable)
    "audio_features",
    "video_frame_luma",
    # office embedded-media interleave (round 5): in-plan DOCX synthesis
    # -> zip refinement -> part walk -> real PNG decode -> OCR -> span
    # assembly; fixed 100-doc subset, scale-stable
    "docx_embedded",
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _corpus_dir(n_docs: int, max_pages: int, n_files: int = 32) -> str:
    """Deterministic cached corpus parquet (generate once, reuse).

    Multi-file tables so the scan parallelizes (a single parquet file
    serializes the head of every job)."""
    d = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_corpus",
        f"d{n_docs}_p{max_pages}_f{n_files}",
    )
    if not (
        os.path.exists(os.path.join(d, "documents.parquet"))
        and os.path.exists(os.path.join(d, "media.parquet"))
    ):
        corpus_mod.write_parquet(d, n_docs, max_pages=max_pages, n_files=n_files)
    return d


def _run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _ceiling_probe(procs: int = 8, pages: int = 240) -> float:
    """~1 s bare-kernel multiprocessing probe (no Spark): aggregate
    pages/sec of the extraction kernels on ``procs`` pinned cores.

    Taken before AND after the timed suite so round-over-round per-query
    comparisons are self-adjudicating — the sandbox host swings 1.5-2x in
    multi-minute phases (BENCH/BASELINE.md), and without an in-window
    hardware number a bench regression is indistinguishable from a host
    phase (the r1→r2 extract_documents confusion)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"))
    from hardware_ceiling import level

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    level(procs, 10)  # pool warm-up (import + corpus gen), excluded
    return round(level(procs, pages), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    # big enough that the extraction job is work-bound, not
    # stage-overhead-bound, at 32 cores (~20 s at sf0.1)
    n_docs = int(
        os.environ.get("BENCH_CORPUS_DOCS", max(100, int(8000 * sf / 0.1)))
    )
    probe_before = _ceiling_probe()
    spark = get_spark("bench")
    corpus_dir = _corpus_dir(n_docs, 200)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media.parquet")
    n_pages = (
        media.groupBy().sum("page_count").collect()[0][0] or 0
    )

    if not os.environ.get("BENCH_SKIP_WARMUP"):
        # JVM/codegen warm-up, excluded from timings: the extraction path
        # AND one decimal-aggregate relational query, so the first timed
        # relational rep doesn't pay whole-stage-codegen/class-load costs
        # (measured ~5 s once per JVM) that belong to no plan
        _run_noop(extract.extract_documents(docs.limit(8), media))
        fn, _sql = REGISTRY["pricing_summary"]
        _run_noop(fn(spark, sf_dir).limit(1))

    # best-of-N per query: the sandbox host stalls in multi-second phases
    # (BENCH/BASELINE.md documents identical jobs swinging 2x minutes
    # apart), and a single draw records the lottery, not the plan
    reps = int(os.environ.get("BENCH_REPEATS", "2"))
    # the headline gets one extra draw: it is the round-graded number and
    # a single stall phase costs a full round of misdiagnosis; the
    # sub-second relational queries stay at best-of-reps
    reps_ex = int(os.environ.get("BENCH_REPEATS_EXTRACT", str(max(reps, 3))))

    cpus = spark.sparkContext.defaultParallelism
    timings: dict[str, float] = {}
    t_ex = min(
        _run_noop(extract.extract_documents(docs, media)) for _ in range(reps_ex)
    )
    timings["extract_documents"] = round(t_ex, 3)

    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        timings[name] = round(
            min(_run_noop(fn(spark, sf_dir)) for _ in range(reps)), 3
        )

    total = round(sum(timings.values()), 3)
    spark.stop()  # before the closing probe so the probe sees bare cores
    probe_after = _ceiling_probe()
    print(
        json.dumps(
            {
                "metric": "bench_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extract_docs": n_docs,
                "extract_pages": int(n_pages),
                "docs_per_sec": round(n_docs / t_ex, 2),
                "pages_per_sec": round(n_pages / t_ex, 2),
                "cpus": cpus,
                # bare-kernel mp throughput (8 pinned cores, no Spark)
                # before/after the suite: the host-normalization metadata
                # for round-over-round comparisons
                "ceiling_probe_before_pps": probe_before,
                "ceiling_probe_after_pps": probe_after,
            }
        )
    )


if __name__ == "__main__":
    main()
