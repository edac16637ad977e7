"""Data-volume (weak) scaling evidence: the same extraction job at a
FIXED parallelism level over corpora growing 16x, reporting wall time
and throughput per size.

The north-rule scaling run (BENCH/run_scaling.py) evidences the
CLUSTER-SIZE axis (N -> 4N cores, fixed data). This exhibit evidences
the DATA axis the 100 TB posture actually rides on: at fixed cores,
wall time must grow ~linearly with corpus size (equivalently,
throughput must be ~flat once fixed job overhead amortizes). A plan
with a hidden super-linear stage — a driver collect that grows with the
corpus, a shuffle whose partition count doesn't scale, a broadcast that
crosses a size cliff — shows up here as throughput decaying with size,
which no fixed-size benchmark can see.

Protocol (same hygiene as run_scaling.py):

* fresh JVM per timed run; Python workers pre-warmed (one task per core,
  round-robin repartition so AQE can't coalesce the warm-up) plus a
  full-pipeline warm-up on 256 docs, both excluded from timing;
* sizes are interleaved across cycles (ascending, then descending) so
  multi-minute host phases hit small and large corpora equally; the
  per-size MEDIAN is the headline, all runs reported;
* a ~1 s bare-kernel ceiling probe (BENCH/hardware_ceiling.py `level`)
  runs between cycles so a throughput dip can be adjudicated against
  the host's own phase (the sandbox swings 1.5-2x; BENCH/BASELINE.md).

Corpora come from bench._corpus_dir (deterministic heavy-tail page
counts, multi-file parquet) — identical generator at every size, so the
per-doc work distribution is size-invariant by construction.

Usage: python BENCH/weak_scaling.py [--sizes 8000,16000,32000,64000,128000]
                                    [--cpus 32] [--cycles 2]
Writes BENCH/WEAK_SCALING_R4.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ocr_platform_spark.operators import extract
from ocr_platform_spark.session import get_spark

cpus = {cpus}
spark = get_spark("weak-scaling-%d" % {n_docs}, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
docs = spark.read.parquet("{corpus}/documents.parquet")
media = spark.read.parquet("{corpus}/media.parquet")

def _idle(batches):
    for b in batches:
        yield b

spark.range(cpus * 8, numPartitions=cpus * 8).repartition(cpus) \
    .mapInPandas(_idle, schema="id long").write.format("noop") \
    .mode("overwrite").save()
extract.extract_documents(docs.limit(256), media).write.format("noop") \
    .mode("overwrite").save()

t0 = time.time()
extract.extract_documents(docs, media).write.format("noop") \
    .mode("overwrite").save()
dt = time.time() - t0
print("RESULT " + json.dumps({{"wall_s": dt}}))
spark.stop()
"""


def run_once(n_docs: int, cpus: int, corpus: str) -> float:
    code = _CHILD.format(repo=REPO, cpus=cpus, corpus=corpus, n_docs=n_docs)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["wall_s"]
    raise RuntimeError(f"no RESULT line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def ceiling_probe() -> float:
    sys.path.insert(0, os.path.join(REPO, "BENCH"))
    from hardware_ceiling import level

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    level(8, 10)  # pool warm-up, excluded
    return round(level(8, 240), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8000,16000,32000,64000,128000")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--cycles", type=int, default=2)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    sys.path.insert(0, REPO)
    from bench import _corpus_dir
    import pyarrow.parquet as pq

    corpora: dict[int, tuple[str, int]] = {}
    for n in sizes:
        d = _corpus_dir(n, 200)
        pages = int(
            pq.read_table(f"{d}/media.parquet", columns=["page_count"])
            .column("page_count").to_pandas().sum()
        )
        corpora[n] = (d, pages)
        print(f"corpus {n} docs -> {pages} pages at {d}", flush=True)

    probes = [ceiling_probe()]
    print(f"ceiling probe (pages/s, 8 procs): {probes[-1]}", flush=True)
    walls: dict[int, list[float]] = {n: [] for n in sizes}
    for cycle in range(args.cycles):
        order = sizes if cycle % 2 == 0 else list(reversed(sizes))
        for n in order:
            dt = run_once(n, args.cpus, corpora[n][0])
            walls[n].append(dt)
            print(f"cycle {cycle} docs={n}: {dt:.2f}s "
                  f"({corpora[n][1] / dt:.0f} pages/s)", flush=True)
        probes.append(ceiling_probe())
        print(f"ceiling probe: {probes[-1]}", flush=True)

    rows = []
    for n in sizes:
        w = median(walls[n])
        rows.append({
            "docs": n,
            "pages": corpora[n][1],
            "runs_s": [round(t, 2) for t in walls[n]],
            "wall_s": round(w, 2),
            "docs_per_sec": round(n / w, 1),
            "pages_per_sec": round(corpora[n][1] / w, 1),
        })
    # linearity: wall vs pages least-squares through the measured points;
    # the intercept IS the fixed job overhead, the residual of the largest
    # point from the fit is the headline deviation.
    xs = [r["pages"] for r in rows]
    ys = [r["wall_s"] for r in rows]
    k = len(xs)
    mx, my = sum(xs) / k, sum(ys) / k
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    intercept = my - slope * mx
    fit_dev = max(
        abs(y - (slope * x + intercept)) / y for x, y in zip(xs, ys)
    )
    result = {
        "cpus": args.cpus,
        "cycles": args.cycles,
        "stat": "median",
        "sizes": rows,
        "fit_sec_per_page": round(slope, 6),
        "fit_fixed_overhead_s": round(intercept, 2),
        "fit_max_relative_deviation": round(fit_dev, 3),
        "marginal_pages_per_sec": round(1.0 / slope, 1),
        "ceiling_probes_pages_per_sec": probes,
    }
    with open(os.path.join(REPO, "BENCH", "WEAK_SCALING_R4.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
