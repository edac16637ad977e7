"""Real-codec extraction throughput exhibit: synthetic flagship vs
extract_real_documents over the SAME corpus re-encoded as real media
(PNG files + scanned PDFs, a CCITT-G4 multi-page TIFF arm, a rotating
wild-compression mix arm, a born-digital text-layer arm, and an
HTML/DOM arm), plus a bucket_pages sweep. The text/html arms measure
the same CONTENT at equivalent-pages throughput (n_pages is the
synthetic corpus page count throughout).

What this pins: the page-bucket pipeline is not a correctness-only toy —
its throughput is within small-integer range of the descriptor pipeline
even though every page must be inflated from real container bytes in
Python (stdlib zlib/numpy codecs; a PIL/pdfium fast path would slot into
the same plan). Run:

    python BENCH/real_codec_bench.py [n_docs]

Writes one JSON line + appends a row to BENCH/REAL_CODEC.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from ocr_platform_spark import corpus as corpus_mod
from ocr_platform_spark.operators import extract, extract_real
from ocr_platform_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
MAX_PAGES = 200
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".real_corpus", f"d{N_DOCS}_p{MAX_PAGES}")


def _ensure_corpus() -> str:
    """Synthetic corpus + its real-codec re-encoding, cached as parquet."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_extract_real import (reencode_gif_mixed, reencode_real,
                                   reencode_tiff, reencode_wild)
    from test_extract_docx import content_docx
    from test_extract_html import content_html
    from test_extract_office_paged import content_pptx, content_xlsx
    from test_extract_text_layer import reencode_text_layer
    from test_extract_text_plain import content_txt
    from test_extract_epub import content_epub
    from test_extract_odt_rtf import content_odt, content_rtf
    from test_extract_md import content_md
    from test_extract_csv import content_dsv
    from test_extract_xml import content_xml
    from test_extract_json import content_jsonl
    from test_extract_latex import content_tex
    from test_extract_eml import content_eml, content_mbox

    import bz2
    import gzip
    import itertools
    import lzma

    # each target owns its counters: fixture bytes must be a function
    # of (N_DOCS, target) alone, never of WHICH cached parquets were
    # missing at generation time — a shared counter would give a cold
    # cache different crawl payloads than an incremental one
    wild_idx = itertools.count()
    crawl_wild_idx = itertools.count()
    office_idx = itertools.count()
    crawl_idx = itertools.count()
    _OFFICE = (content_docx, content_pptx, content_xlsx, content_txt)
    _CRAWL = (reencode_real, reencode_tiff,
              lambda d: reencode_wild(d, next(crawl_wild_idx)),
              lambda d: reencode_text_layer(d)[0],
              content_html, content_docx, content_pptx, content_xlsx,
              content_epub, content_odt, content_rtf, content_txt,
              content_md, content_dsv, content_xml, content_jsonl,
              content_tex, content_eml, content_mbox)
    _WRAP = (gzip.compress, bz2.compress, lzma.compress)

    def reencode_office(data: bytes) -> bytes:
        return _OFFICE[next(office_idx) % 4](data)

    def reencode_crawl(data: bytes) -> bytes:
        # the realistic interleaved crawl: all 19 tiers rotating
        # (round-4 full set incl. LaTeX, EML, mbox), every 5th payload
        # arriving transport-compressed
        i = next(crawl_idx)
        out = _CRAWL[i % 19](data)
        if i % 5 == 4:
            out = _WRAP[i % 3](out)
        return out
    targets = {"media_real.parquet": reencode_real,
               "media_tiff.parquet": reencode_tiff,
               # rotating wild-compression mix (G3-2D / LZW / PackBits /
               # MH TIFFs + CCITT-G3+LZW PDFs) — the long-tail corpus
               "media_wild.parquet":
                   lambda data: reencode_wild(data, next(wild_idx)),
               # born-digital: PDFs carry their text layer (one Tj per
               # OCR-block line), images stay PNG — the OCR-bypass arm
               "media_text.parquet":
                   lambda data: reencode_text_layer(data)[0],
               # web documents: every media as an HTML page (content
               # blocks + boilerplate) — the DOM-heuristic arm, no
               # raster work at all
               "media_html.parquet": content_html,
               # GIF where page sizes allow multi-frame streams, real
               # PDFs elsewhere — the legacy-web image arm
               "media_gif.parquet": reencode_gif_mixed,
               # office/plain-text rotation (DOCX / PPTX / XLSX / txt)
               # — the zip-container + no-magic OCR-bypass arm
               "media_office.parquet": reencode_office,
               # the 19-tier interleaved crawl mix with transport
               # wrappers — the realistic corpus shape end-to-end
               # (filename versions with the tier set: a new tier
               # regenerates this arm, never a stale cache)
               "media_crawl19.parquet": reencode_crawl}
    missing = {f: fn for f, fn in targets.items()
               if not os.path.exists(os.path.join(CACHE, f))}
    if not missing:
        return CACHE
    if not os.path.exists(os.path.join(CACHE, "documents.parquet")):
        corpus_mod.write_parquet(CACHE, N_DOCS, max_pages=MAX_PAGES,
                                 n_files=32)
    _docs, media = corpus_mod.generate(N_DOCS, max_pages=MAX_PAGES)
    rows = sorted(media.items())
    for fname, fn in missing.items():
        t0 = time.time()
        refs, payloads = [], []
        for ref, m in rows:
            refs.append(ref)
            payloads.append(fn(m["data"]))
        os.makedirs(os.path.join(CACHE, fname), exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(
                {"media_ref": refs, "data": payloads})),
            os.path.join(CACHE, fname, "part-0.parquet"),
        )
        print(f"{fname}: re-encoded {len(rows)} media in "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
    return CACHE


def _run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    d = _ensure_corpus()
    spark = get_spark("real-codec-bench")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    media_synth = spark.read.parquet(f"{d}/media.parquet")
    media_real = spark.read.parquet(f"{d}/media_real.parquet")
    media_tiff = spark.read.parquet(f"{d}/media_tiff.parquet")
    media_wild = spark.read.parquet(f"{d}/media_wild.parquet")
    media_text = spark.read.parquet(f"{d}/media_text.parquet")
    media_html = spark.read.parquet(f"{d}/media_html.parquet")
    media_gif = spark.read.parquet(f"{d}/media_gif.parquet")
    media_office = spark.read.parquet(f"{d}/media_office.parquet")
    media_crawl = spark.read.parquet(f"{d}/media_crawl19.parquet")
    n_pages = media_synth.groupBy().sum("page_count").collect()[0][0] or 0

    # warm-up (JVM + codegen), excluded
    _run_noop(extract.extract_documents(docs.limit(8), media_synth))

    def best2(make):
        return min(_run_noop(make()) for _ in range(2))

    results = {
        "synthetic_flagship": best2(
            lambda: extract.extract_documents(docs, media_synth)),
        "real_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_real, bucket_pages=8)),
        "real_bucket32": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_real, bucket_pages=32)),
        "real_unbucketed": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_real, bucket_pages=None)),
        "tiff_g4_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_tiff, bucket_pages=8)),
        "wild_mix_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_wild, bucket_pages=8)),
        # the OCR bypass: text-layer PDF pages parse instead of
        # raster+detect+recognize (PNG images still OCR)
        "text_layer_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_text, bucket_pages=8)),
        # the DOM tier: every media an HTML document — pure string
        # parsing, zero raster work anywhere in the job
        "html_dom_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_html, bucket_pages=8)),
        # legacy-web palettized images: GIF LZW + palette lookup
        "gif_mixed_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_gif, bucket_pages=8)),
        # office + plain-text rotation: zipfile/XML/string parsing
        # only, zero raster work — PPTX/XLSX decks exercise sub-zip
        # bucket slicing
        "office_mix_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_office, bucket_pages=8)),
        # the realistic interleaved crawl: all 19 media tiers rotating
        # in ONE job, 20% of payloads transport-compressed
        "crawl_mix_bucket8": best2(
            lambda: extract_real.extract_real_documents(
                docs, media_crawl, bucket_pages=8)),
    }
    out = {
        "n_docs": N_DOCS,
        "n_pages": int(n_pages),
        "sec": {k: round(v, 3) for k, v in results.items()},
        "pages_per_sec": {k: round(n_pages / v, 1)
                          for k, v in results.items()},
        "real_vs_synthetic_ratio": round(
            results["real_bucket8"] / results["synthetic_flagship"], 3),
        "text_layer_speedup_vs_scanned": round(
            results["real_bucket8"] / results["text_layer_bucket8"], 3),
        "html_dom_speedup_vs_scanned": round(
            results["real_bucket8"] / results["html_dom_bucket8"], 3),
        "office_mix_speedup_vs_scanned": round(
            results["real_bucket8"] / results["office_mix_bucket8"], 3),
        "crawl_mix_vs_scanned": round(
            results["real_bucket8"] / results["crawl_mix_bucket8"], 3),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "REAL_CODEC.json")
    hist = []
    if os.path.exists(path):
        hist = json.load(open(path))
    hist.append(out)
    json.dump(hist, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
