"""Host scaling ceiling: the extraction kernels (render → detect →
recognize) under plain multiprocessing, no Spark.

This measures what the sandbox VM itself can deliver when the exact
per-page work of the heavy UDF stage is run on N independent processes —
the upper bound any Spark configuration can reach. On a
memory-bandwidth-limited VM the ceiling itself drops below 1.0 well
before 32 cores; BENCH/BASELINE.md reports Spark's N→4N efficiency next
to this number.

Usage: python BENCH/hardware_ceiling.py [--n 8] [--pages 500]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def work(args: tuple[int, int]) -> tuple[int, float]:
    seed, n = args
    from ocr_platform_spark import corpus, formats, kernels, raster

    # size the corpus to the requested page count (~2.8 pages/doc at
    # max_pages=30) so pages[:n] never silently truncates the workload
    n_docs = max(60, int(n / 2.0))
    _docs, media = corpus.generate(n_docs, seed=seed, max_pages=30)
    pages = []
    for _ref, m in media.items():
        kind, ps = formats.decode_media(m["data"])
        scale = raster.PDF_UNIT_SCALE if kind == "pdf" else 1.0
        pages.extend((p, scale) for p in ps)
    if len(pages) < n:
        raise RuntimeError(f"corpus yielded {len(pages)} pages < requested {n}")
    pages = pages[:n]
    t0 = time.time()
    for p, scale in pages:
        img = raster.render_page(p, scale)
        boxes = kernels.detect_text_boxes(img)
        if boxes:
            prep = raster.PrepView(img)
            w_prep, h_prep = prep.size
            h0, w0 = img.shape[:2]
            sx, sy = w_prep / w0, h_prep / h0
            bc = [
                (int(x1 * sx), int(y1 * sy), int(x2 * sx), int(y2 * sy))
                for x1, y1, x2, y2 in boxes
            ]
            crops = [prep.crop(b) for b in bc]
            kernels.predict_batch(
                crops, original_heights=[y2 - y1 for _, y1, _, y2 in boxes]
            )
    return len(pages), time.time() - t0


def level(nproc: int, pages_per_proc: int, pin: bool = True) -> float:
    """Aggregate pages/sec with ``nproc`` busy workers; with ``pin`` the
    process (and its forked pool) is confined to exactly ``nproc`` cores,
    mirroring run_scaling.py's taskset protocol — an N-core 'cluster'
    must not borrow spare cores for anything."""
    prev = os.sched_getaffinity(0)
    if pin:
        # cap at the CPUs that exist so a small host degrades to all-cores
        # instead of OSError (mirrors run_scaling.run_once's taskset cap)
        os.sched_setaffinity(0, set(range(min(nproc, os.cpu_count() or 1))))
    try:
        with mp.get_context("fork").Pool(nproc) as pool:
            res = pool.map(
                work, [(100 + i, pages_per_proc) for i in range(nproc)]
            )
    finally:
        os.sched_setaffinity(0, prev)
    total = sum(r[0] for r in res)
    mean_task = sum(r[1] for r in res) / nproc
    return total / mean_task  # aggregate pages/sec while all procs busy


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--pages", type=int, default=500)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

    small, big = args.n, 4 * args.n
    pin = not args.no_pin
    # warm both pools once (import + corpus gen), then measure
    level(small, 20, pin=pin)
    thr_small = level(small, args.pages, pin=pin)
    level(big, 20, pin=pin)
    thr_big = level(big, args.pages, pin=pin)
    print(
        json.dumps(
            {
                "n_small": small,
                "n_big": big,
                "pages_per_sec_small": round(thr_small, 1),
                "pages_per_sec_big": round(thr_big, 1),
                "hardware_ceiling_efficiency": round(
                    thr_big / (4 * thr_small), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
