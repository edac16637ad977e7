"""The extraction pipeline as a Spark DataFrame job (SURVEY.md §3.4).

Replaces the reference's HTTP/Redis/Postgres/S3 process hops
(``apps/worker/app/tasks/ocr_tasks.py``) with Spark's own exchange points:

    documents ─ explode(spans) ─┬─ text spans ── unicode-trim passthrough ──┐
                                └─ media spans ⋈ media payloads             │
                                    │ mapInPandas DECODE (cheap):           │
                                    │   container parse → 1 row per page    │
                                    │   (compact descriptor; no raster      │
                                    │    crosses a shuffle)                 │
                                    │ repartition(page key)  ← skew spread  │
                                    │ mapInPandas OCR (heavy):              │
                                    │   render@150dpi → detect → lazy       │
                                    │   preprocess crops → strips →         │
                                    │   recognize → trim → blocks           │
                                    │ window rank (y1, x1, emission)        │
                                    └──────────────┬─────────────────────────┘
                                                   union (+1 sentinel/doc)
                                    window order (offset, page, rank)
                                    groupBy(doc_id) → sort_array(collect_list)
                                    drop sentinel tail (no re-join needed)

Scale rationale (100 TB / 10^12 docs):

* **Page-level explode before the heavy stage** is the skew fix — one
  200-page PDF becomes 200 independent rows spread by hash repartition, so a
  single executor never owns a whole giant document (SURVEY.md §4; AQE alone
  cannot split one huge row).
* **The decode stage is cheap and narrow** (container header parse); the
  expensive raster exists only *inside* the heavy UDF — the shuffle between
  the stages carries ~200-byte descriptors, never pixels.
* **Joins**: spans⋈media is a key-to-key shuffle hash join (AQE handles
  residual skew); the final doc_id re-join is an equi-join on the already
  grouped side.
* **All relational glue is stock Catalyst** (window, collect_list, union,
  joins) — predicate pushdown and column pruning reach the parquet scans.

Per-row reference semantics are inherited from :mod:`ocr_platform_spark.oracle`
kernels — the heavy UDF is the fused detect+recognize of
``run_job`` (``ocr_tasks.py:108-118``) + ``run_ocr_with_boxes``
(``libs/ocr_core/ocr_core/pipeline/orchestrator.py:116-174``): batch mode has
no human box-editing step, so ``detect_result`` flows through unchanged and
fusing the two phases is semantics-preserving (the optional persisted
detect-boxes boundary is exposed separately via :func:`detect_boxes_table`).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

from .. import formats, kernels, raster
from ..schemas import BLOCK, PAGE_TASK, SPAN


# --- stage 1: decode (cheap page explode) ------------------------------------

MEDIA_KIND_ERROR = formats.MEDIA_KIND_ERROR  # quarantined payloads (shared sentinel)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Container parse -> one output row per page (S4/S5 in SURVEY.md §2.1).

    Mirrors ``_raw_to_pages`` dispatch (``ocr_tasks.py:34-55``) without
    rasterizing: emits per-page JSON descriptors so the page-level explode
    happens *before* any pixel work.
    """
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in PAGE_TASK.fields}
        for doc_id, offset, ref, data in zip(
            pdf["doc_id"], pdf["offset"], pdf["media_ref"], pdf["data"]
        ):
            try:
                kind, pages = formats.decode_media(bytes(data))
            except Exception as exc:  # corrupt payload -> quarantine row
                # At 10^12 docs a malformed blob must not fail the job
                # (reference analog: per-job FAILED status + error column,
                # ``ocr_tasks.py:125-128``). One row with media_kind=
                # "error"; downstream OCR skips it and the doc still
                # re-emits its surviving spans.
                out["doc_id"].append(doc_id)
                out["offset"].append(offset)
                out["media_ref"].append(ref)
                out["media_kind"].append(MEDIA_KIND_ERROR)
                out["page_index"].append(-1)
                out["page_desc"].append(str(exc)[:200])
                continue
            for i, page in enumerate(pages):
                out["doc_id"].append(doc_id)
                out["offset"].append(offset)
                out["media_ref"].append(ref)
                out["media_kind"].append(kind)
                out["page_index"].append(i)
                out["page_desc"].append(formats.dumps_page(page))
        res = pd.DataFrame(out)
        res["offset"] = res["offset"].astype("int32")
        res["page_index"] = res["page_index"].astype("int32")
        yield res


# --- stage 2: heavy OCR (render -> detect -> recognize) ----------------------


def _ocr_page(doc_id: str, offset: int, ref: str, kind: str,
              page_index: int, desc: str, out: dict[str, list]) -> None:
    page = formats.loads_page(desc)
    unit_scale = raster.PDF_UNIT_SCALE if kind == "pdf" else 1.0
    img = raster.render_page(page, unit_scale)
    ocr_rendered_page(doc_id, offset, ref, page_index, img, out)


def ocr_rendered_page(doc_id: str, offset: int, ref: str,
                      page_index: int, img: np.ndarray,
                      out: dict[str, list]) -> None:
    """Detect + recognize one already-rendered grayscale page raster.

    The OCR core shared by the synthetic descriptor path above and the
    real-codec bucket path (:mod:`..operators.extract_real`), so the two
    pipelines cannot drift: identical detect-on-raw-page, PrepView crop
    scaling, strip recognition, unicode strip, length-align truncation.
    """
    h_orig, w_orig = img.shape[:2]
    # detect phase: on the raw rendered page (run_job does NOT preprocess
    # before detect — ocr_tasks.py:110-111)
    boxes = kernels.detect_text_boxes(img)
    if not boxes:
        return  # empty-page passthrough: zero block rows (orchestrator.py:133-137)
    # recognize phase: run_ocr_with_boxes (orchestrator.py:139-172)
    prep = raster.PrepView(img)
    w_prep, h_prep = prep.size
    scale_x = w_prep / w_orig if w_orig else 1.0
    scale_y = h_prep / h_orig if h_orig else 1.0
    boxes_for_crop = []
    original_heights = []
    for (x1, y1, x2, y2) in boxes:
        boxes_for_crop.append(
            (int(x1 * scale_x), int(y1 * scale_y), int(x2 * scale_x), int(y2 * scale_y))
        )
        original_heights.append(y2 - y1)
    crops = [prep.crop(b) for b in boxes_for_crop]
    rec = kernels.predict_batch(crops, original_heights=original_heights)
    texts = [t.strip() for t, _ in rec]  # postprocess.py:4-6 (unicode strip)
    n = min(len(boxes), len(rec), len(texts))  # orchestrator.py:158
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]  # ORIGINAL coords kept (orchestrator.py:163)
        out["doc_id"].append(doc_id)
        out["offset"].append(offset)
        out["media_ref"].append(ref)
        out["page_index"].append(page_index)
        out["block_index"].append(i)
        out["x1"].append(x1)
        out["y1"].append(y1)
        out["x2"].append(x2)
        out["y2"].append(y2)
        out["text"].append(texts[i])
        out["conf"].append(rec[i][1])
        out["page_width"].append(w_orig)
        out["page_height"].append(h_orig)


_INT_BLOCK_COLS = [
    "offset", "page_index", "block_index",
    "x1", "y1", "x2", "y2", "page_width", "page_height",
]


def _ocr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Iterator-form mapInPandas: one-time per-worker init would live here
    (the ``lru_cache`` model-singleton analog, detect.py:68 /
    vietocr_engine.py:47 — our kernels are stateless numpy, so nothing to
    load; the hook is kept so real weights drop in without a plan change)."""
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in BLOCK.fields}
        for row in zip(
            pdf["doc_id"], pdf["offset"], pdf["media_ref"],
            pdf["media_kind"], pdf["page_index"], pdf["page_desc"],
        ):
            _ocr_page(*row, out)
        res = pd.DataFrame(out)
        for c in _INT_BLOCK_COLS:
            res[c] = res[c].astype("int32")
        res["conf"] = res["conf"].astype("float64")
        yield res


# --- relational glue ----------------------------------------------------------


@pandas_udf(StringType())  # DataType instance: module must import on executors
def unicode_strip(s: pd.Series) -> pd.Series:
    """Exact ``str.strip()`` parity (``postprocess.py:6``): strips *all*
    unicode whitespace, unlike ``F.trim`` which only strips ASCII spaces
    (SURVEY.md §2.3 M11)."""
    return s.fillna("").str.strip()


def exploded_spans(documents: DataFrame) -> DataFrame:
    """posexplode-style span flatten; ``offset`` is carried by the data."""
    return documents.select(
        "doc_id", F.explode("spans").alias("span")
    ).select("doc_id", "span.kind", "span.text", "span.media_ref", "span.offset")


def shared_exploded_spans(
    documents: DataFrame, replicated: bool = False
) -> DataFrame:
    """Explode once, lazily ``localCheckpoint`` the narrow exploded frame.

    The extraction pipeline has three consumers of the exploded spans —
    media-span refs, the missing-payload anti-join, and the text-span
    passthrough. Without sharing, each consumer re-scans the ``documents``
    table and re-explodes the ``spans`` column (the bulk of the table):
    4 full input scans per run, ~4x the input I/O at 100 TB. The lazy
    checkpoint materializes the exploded frame exactly once (on the first
    stage that touches it, inside the same job) and every consumer reads
    the executor-local blocks; the only other ``documents`` access left is
    the sentinel build, which column-prunes to ``doc_id`` alone.

    Storage trade-off at scale: the frame is the corpus' span content, so
    it lands in executor memory-and-disk. That is the price of replacing
    three full re-reads of the same bytes with one — on a real cluster
    with instance-local SSD this is strictly cheaper than 3x remote-store
    I/O; for lineage-durable restarts use the per-partition resume path in
    :mod:`ocr_platform_spark.lineage` instead of RDD lineage replay.

    ``replicated=True`` (the ``share_spans="replicated"`` middle path,
    VERDICT r4 #5): persist at ``MEMORY_AND_DISK_2`` instead of the lazy
    ``localCheckpoint``. The checkpoint TRUNCATES lineage with
    non-replicated executor-local blocks — losing one executor mid-job
    on a preemptible cluster makes the job fail unrecoverably — while
    the replicated persist keeps BOTH recovery paths: a lost block is
    first served from its replica (no recompute), and if both replicas
    die, plain RDD lineage recomputes just those partitions from the
    one documents scan. Cost: 2x the frame's storage footprint and one
    extra network copy at materialization; the single-scan plan shape
    is unchanged (every consumer still reads the cached frame). Spark
    cannot GC-clean an explicit persist when the DataFrame goes
    unreferenced (unlike the eager=False checkpoint), so long-lived
    drivers looping over many corpora should unpersist between runs.
    """
    if replicated:
        from pyspark import StorageLevel

        return exploded_spans(documents).persist(
            StorageLevel.MEMORY_AND_DISK_2
        )
    return exploded_spans(documents).localCheckpoint(eager=False)


#: Catalyst-stats cap (bytes of the *documents input relation*) above which
#: the auto mode of :func:`decode_pages` refuses the spans-side broadcast
#: pin. The broadcast side is only the 3 narrow ref columns (doc_id,
#: offset, media_ref — ~50 B/span vs the table's full span text +
#: descriptors), so a 32 GiB input estimate keeps the build side
#: comfortably under Spark's 8 GB broadcast hard limit.
SPAN_BROADCAST_STATS_CAP = 32 << 30

def _span_refs_fit_broadcast(documents: DataFrame) -> bool:
    """Cheap pre-flight for the pinned spans-side broadcast (no job runs).

    The decision is made from the optimized plan's LEAF relations, not the
    root estimate: Catalyst's size-only stats arithmetic inflates a join
    root to the PRODUCT of its children and scales a projection by column
    widths, so the root number can read "huge" for a small input (or
    scale an unknown sentinel below any floor) — leaf stats are the only
    numbers that still mean bytes. Rules:

    * a leaf whose estimate is the ``spark.sql.defaultSizeInBytes``
      sentinel (RDD-backed / checkpointed scans) means UNKNOWN, i.e.
      driver-materialized and bounded by construction — it neither
      blocks nor grants the pin on its own (a genuinely 100 TB corpus
      arrives as a parquet/Iceberg scan whose leaf stats ARE known file
      bytes), so it is SKIPPED, not short-circuited: a known-huge leaf
      elsewhere in the same plan (e.g. an RDD-backed dim joined against
      a whole-corpus scan) must still refuse the pin regardless of leaf
      order;
    * pin iff the summed KNOWN leaf bytes fit
      :data:`SPAN_BROADCAST_STATS_CAP` (all-unknown plans sum to 0 and
      keep the pin);
    * any JVM/py4j failure refuses the pin (fail closed: the unhinted
      plan is at worst slower; a wrongly pinned multi-TB broadcast is a
      hard job failure)."""
    try:
        spark = documents.sparkSession
        sentinel = int(spark.conf.get(
            "spark.sql.defaultSizeInBytes", str((1 << 63) - 1)
        ))
        leaves = documents._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            size = int(str(leaves.apply(i).stats().sizeInBytes()))
            if size >= sentinel:
                continue  # unknown-stats leaf: bounded by construction
            total += size
    except Exception:
        return False
    return total <= SPAN_BROADCAST_STATS_CAP


def decode_pages(
    documents: DataFrame,
    media: DataFrame,
    spans: DataFrame | None = None,
    broadcast_spans: bool | None = None,
) -> DataFrame:
    """Media spans ⋈ payloads -> per-page descriptor rows (stage 1).

    Join first, repartition after: the spans side is 3 narrow columns and
    is pinned as the broadcast build side (``broadcast_spans=True``), so
    the payload bytes never move for the join itself — they cross the
    wire exactly once, in the explicit repartition on ``(doc_id,
    offset)`` that spreads the decode work. The hint is pinned rather
    than left to size estimates because the spans side may arrive as a
    checkpointed RDD scan (see :func:`shared_exploded_spans`) whose
    statistics are unknown — an unhinted plan would degrade to sort-merge
    and re-introduce the payload sort. ``broadcast_spans=None`` (the
    default) resolves that tension with a pre-flight on the *documents*
    relation's Catalyst stats (:func:`_span_refs_fit_broadcast`): the pin
    is released only on a KNOWN estimate past
    :data:`SPAN_BROADCAST_STATS_CAP` — i.e. a whole-corpus parquet/Iceberg
    caller at the 10^12-doc posture degrades to AQE's runtime choice
    automatically instead of hard-failing on Spark's 8 GB broadcast limit
    — while unknown-stats inputs (in-memory, RDD-backed, checkpointed)
    keep the measured-best pinned plan. That repartition matters: the
    joined payload rows are only a few MB, so AQE's byte-based coalescing
    would squash them into ~1 partition and serialize the container
    parsing — like the OCR stage, decode cost is per-*row* CPU (zlib +
    JSON), not bytes (see :func:`ocr_blocks`). An alternative
    "pre-partition both sides on media_ref + shuffle-hash join" shape was
    measured WORSE (median 9.5s vs 6.2s at the 8k-doc bench corpus, with
    2-4x straggler outliers): it trades the broadcast for a payload
    shuffle keyed on media_ref, whose heavy-tail key distribution leaves
    unbalanced decode partitions. At true 10^12 scale, where the spans
    side outgrows executor memory, pass ``broadcast_spans=False`` so the
    join strategy is AQE's to pick per stage from runtime sizes.

    ``spans``: optional pre-exploded (doc_id, kind, text, media_ref,
    offset) frame — pass :func:`shared_exploded_spans` output to share
    one materialization across the pipeline's consumers.
    """
    if spans is None:
        spans = exploded_spans(documents)
    if broadcast_spans is None:
        broadcast_spans = _span_refs_fit_broadcast(documents)
    span_refs = (
        spans
        .filter(F.col("kind") != "text")
        .select("doc_id", "offset", "media_ref")
    )
    build = F.broadcast(span_refs) if broadcast_spans else span_refs
    media_spans = build.join(media.select("media_ref", "data"), "media_ref")
    n = 2 * documents.sparkSession.sparkContext.defaultParallelism
    decoded = media_spans.repartition(n, "doc_id", "offset").mapInPandas(
        _decode_batches, schema=PAGE_TASK
    )
    # A span whose media_ref has NO payload row must surface as a
    # quarantine row, not vanish: the inner join above would silently drop
    # it (and a left join would force the payload onto the build side,
    # breaking the measured-best broadcast plan). The anti-join is narrow
    # — only (doc_id, offset, media_ref) keys move — and feeds the same
    # media_kind=error contract media_errors() reads.
    missing = span_refs.join(
        media.select("media_ref"), "media_ref", "left_anti"
    ).select(
        "doc_id",
        "offset",
        "media_ref",
        F.lit(MEDIA_KIND_ERROR).alias("media_kind"),
        F.lit(-1).cast("int").alias("page_index"),
        F.lit("missing media payload").alias("page_desc"),
    )
    return decoded.unionByName(missing)


def ocr_blocks(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Stage 2 over page rows, preceded by the explicit skew-spreading
    repartition on the page key (SURVEY.md §4: AQE can't split one huge doc;
    hashing (doc_id, offset, page_index) can).

    The partition count is explicit (defaults to 3x cluster parallelism): the
    page descriptors are only ~200 bytes, so AQE's byte-based coalescing would
    otherwise squash this shuffle into one partition and serialize the heavy
    CPU-bound stage — partition cost here is per-*row* CPU, not bytes.
    """
    if num_partitions is None:
        num_partitions = 3 * pages.sparkSession.sparkContext.defaultParallelism
    pages = pages.filter(F.col("media_kind") != MEDIA_KIND_ERROR)
    pages = pages.repartition(num_partitions, "doc_id", "offset", "page_index")
    return pages.mapInPandas(_ocr_batches, schema=BLOCK)


def media_errors(pages: DataFrame) -> DataFrame:
    """Quarantine table: media whose container parse failed (the FAILED
    status + ``error`` column analog, ``apps/worker/app/tasks/
    ocr_tasks.py:125-128``); write alongside lineage for triage/re-run."""
    return pages.filter(F.col("media_kind") == MEDIA_KIND_ERROR).select(
        "doc_id", "offset", "media_ref", F.col("page_desc").alias("error")
    )


def reading_ordered_blocks(blocks: DataFrame) -> DataFrame:
    """Reading-order rank per page: ``y1`` asc, ``x1`` asc
    (``json-editor.component.ts:157-161``), emission index as total-order
    tie-break (SURVEY.md §7.3 item 2)."""
    w = Window.partitionBy("doc_id", "offset", "page_index").orderBy(
        "y1", "x1", "block_index"
    )
    return blocks.withColumn("rank", F.row_number().over(w))


def assemble_spans(
    documents: DataFrame, blocks: DataFrame, spans: DataFrame | None = None
) -> DataFrame:
    """Union text-span passthrough with OCR spans, assign the document-global
    emission order, re-aggregate to the input schema (O4/A5 in SURVEY.md §2).

    The per-page reading-order rank (y1, x1, emission index — O1) is fused
    into the single document-global window: within one page the sort key
    ``(offset, page_index, y1, x1, block_index)`` induces exactly the
    per-page rank order, so ranking separately first would only add a
    second full shuffle+sort of the block rows for the same total order
    (:func:`reading_ordered_blocks` stays available as the standalone
    operator / checkpoint boundary).

    ``spans``: optional pre-exploded frame (see
    :func:`shared_exploded_spans`); the sentinel build below stays on
    ``documents`` on purpose — it needs one row per *document* (empty-span
    docs included, which the exploded frame cannot supply without an
    outer explode + distinct shuffle) and column-prunes to ``doc_id``
    alone, so its scan reads a single string column.
    """
    if spans is None:
        spans = exploded_spans(documents)
    text_spans = (
        spans
        .filter(F.col("kind") == "text")
        .select(
            "doc_id",
            "offset",
            F.lit(-1).cast("int").alias("page_index"),
            F.lit(0).cast("int").alias("y1"),
            F.lit(0).cast("int").alias("x1"),
            F.lit(0).cast("int").alias("block_index"),
            unicode_strip("text").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )
    )
    ocr_spans = blocks.select(
        "doc_id", "offset", "page_index", "y1", "x1", "block_index",
        "text", "media_ref",
    )
    # One SENTINEL row per input document (offset = int32 max sorts
    # strictly after every real span) rides through the same window +
    # groupBy and is dropped from the tail of the assembled array. This
    # keeps media-only docs with zero blocks (and fully empty docs) in
    # the output WITHOUT a final documents⋈grouped join — the join cost
    # an extra exchange + sort of the documents side at every corpus
    # size, pure fixed overhead on the critical tail (doc_ids are unique
    # per the input contract, so one sentinel == one group member).
    _imax = 2**31 - 1
    sentinel = documents.select(
        "doc_id",
        F.lit(_imax).cast("int").alias("offset"),
        F.lit(_imax).cast("int").alias("page_index"),
        F.lit(_imax).cast("int").alias("y1"),
        F.lit(_imax).cast("int").alias("x1"),
        F.lit(_imax).cast("int").alias("block_index"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    all_spans = text_spans.unionByName(ocr_spans).unionByName(sentinel)
    # The document-global emission order is computed WITHOUT a window:
    # collect each doc's spans with their full sort key, sort_array once
    # (the key prefix (offset, page_index, y1, x1, block_index) is a
    # strict total order per doc, so the trailing text/media_ref fields
    # are never consulted), and let the indexed ``transform`` lambda
    # assign ord = array position. A row_number window would first sort
    # every shuffle partition whole (WindowExec, breaking whole-stage
    # codegen) and then sort_array would re-sort per doc anyway — one
    # full sort pass of pure fixed overhead on the critical tail.
    grouped = all_spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "offset", "page_index", "y1", "x1", "block_index",
                    "text", "media_ref",
                )
            )
        ).alias("spans_all")
    )
    spans = F.transform(
        F.expr("slice(spans_all, 1, size(spans_all) - 1)"),  # drop sentinel
        lambda s, i: F.struct(
            F.lit("text").alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return grouped.select(
        "doc_id",
        spans.cast(f"array<{SPAN.simpleString()}>").alias("spans"),
    )


def extract_documents(
    documents: DataFrame,
    media: DataFrame,
    num_partitions: int | None = None,
    broadcast_spans: bool | None = None,
    share_spans: "bool | str" = True,
) -> DataFrame:
    """End-to-end: documents + media -> documents_out with extracted spans.

    The ``documents`` table is read ONCE for span content (shared lazy
    localCheckpoint of the exploded frame, :func:`shared_exploded_spans`)
    plus one doc_id-only pruned scan for the sentinel — down from 4 full
    scans (VERDICT r2 #1). ``broadcast_spans`` defaults to the stats-guarded
    auto mode: the spans-side broadcast hint in the payload join is
    released to AQE only when the input relation's Catalyst estimate is
    KNOWN to exceed :data:`SPAN_BROADCAST_STATS_CAP` (unknown stats keep
    the pin — see :func:`decode_pages`); pass True/False to force either
    plan.

    Executor-loss caveat (``share_spans``): the lazy ``localCheckpoint``
    truncates RDD lineage with NON-replicated executor-local blocks — on a
    cluster with preemptible/spot executors, losing one executor mid-job
    makes this one Spark job fail UNRECOVERABLY (no recompute path) instead
    of recomputing the lost partitions. Inside
    :func:`ocr_platform_spark.lineage.run_extract_job` that is absorbed by
    per-chunk resume; a direct caller without a resume wrapper on a
    preemptible cluster has two options: ``share_spans=False`` trades the
    single-scan plan for plain recomputable lineage (the pre-r3 4-scan
    shape), and ``share_spans="replicated"`` keeps the single-scan plan
    on a ``MEMORY_AND_DISK_2`` persist — replicated AND recomputable
    (see :func:`shared_exploded_spans`; docs/SCALE.md "share_spans
    modes" for when each wins)."""
    sp = (
        shared_exploded_spans(documents, replicated=share_spans == "replicated")
        if share_spans else exploded_spans(documents)
    )
    pages = decode_pages(documents, media, spans=sp, broadcast_spans=broadcast_spans)
    blocks = ocr_blocks(pages, num_partitions=num_partitions)
    return assemble_spans(documents, blocks, spans=sp)


def _ocr_page_fused(doc_id: str, offset: int, ref: str, kind: str,
                    page_index: int, desc: str, out: dict[str, list]) -> None:
    """One page under the one-shot fused semantics (``orchestrator.py:34-113``,
    exact port pinned by :func:`ocr_platform_spark.oracle.run_ocr_fused`):
    preprocess BEFORE detect, boxes emitted in preprocessed coords (no
    scale-back), recognize without original heights (strip split keys off
    crop height only). Detection scans the whole page, so the preprocessed
    raster is materialized eagerly — the lazy ``PrepView`` window trick only
    pays when downstream reads are sparse crops of an un-detected page."""
    page = formats.loads_page(desc)
    unit_scale = raster.PDF_UNIT_SCALE if kind == "pdf" else 1.0
    img = raster.preprocess_image(raster.render_page(page, unit_scale))
    h_prep, w_prep = img.shape[:2]
    boxes = kernels.detect_text_boxes(img)
    if not boxes:
        return
    crops = [raster.crop(img, b) for b in boxes]
    rec = kernels.predict_batch(crops)  # original_heights=None
    texts = [t.strip() for t, _ in rec]
    n = min(len(boxes), len(rec), len(texts))  # orchestrator.py:75
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]  # PREPROCESSED coords, verbatim
        out["doc_id"].append(doc_id)
        out["offset"].append(offset)
        out["media_ref"].append(ref)
        out["page_index"].append(page_index)
        out["block_index"].append(i)
        out["x1"].append(x1)
        out["y1"].append(y1)
        out["x2"].append(x2)
        out["y2"].append(y2)
        out["text"].append(texts[i])
        out["conf"].append(rec[i][1])
        out["page_width"].append(w_prep)
        out["page_height"].append(h_prep)


def _ocr_batches_fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in BLOCK.fields}
        for row in zip(
            pdf["doc_id"], pdf["offset"], pdf["media_ref"],
            pdf["media_kind"], pdf["page_index"], pdf["page_desc"],
        ):
            _ocr_page_fused(*row, out)
        res = pd.DataFrame(out)
        for c in _INT_BLOCK_COLS:
            res[c] = res[c].astype("int32")
        res["conf"] = res["conf"].astype("float64")
        yield res


def ocr_blocks_fused(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Fused-semantics twin of :func:`ocr_blocks`: same skew-spreading page
    repartition, different per-page kernel (one-shot ``run_ocr`` coordinate
    convention — VERDICT round 1 "What's missing" #4)."""
    if num_partitions is None:
        num_partitions = 3 * pages.sparkSession.sparkContext.defaultParallelism
    pages = pages.filter(F.col("media_kind") != MEDIA_KIND_ERROR)
    pages = pages.repartition(num_partitions, "doc_id", "offset", "page_index")
    return pages.mapInPandas(_ocr_batches_fused, schema=BLOCK)


def extract_documents_fused(
    documents: DataFrame,
    media: DataFrame,
    num_partitions: int | None = None,
    broadcast_spans: bool | None = None,
) -> DataFrame:
    """End-to-end extraction under the one-shot fused ``run_ocr`` semantics:
    blocks carry preprocessed-image coordinates and crop-height-keyed strip
    splits. The relational plan (decode explode, page repartition, sentinel
    assembly) is shared with :func:`extract_documents` — only the in-UDF
    per-page kernel differs, so every 100-TB posture argument (incl. the
    localCheckpoint executor-loss caveat documented there) carries over."""
    sp = shared_exploded_spans(documents)
    pages = decode_pages(documents, media, spans=sp, broadcast_spans=broadcast_spans)
    blocks = ocr_blocks_fused(pages, num_partitions=num_partitions)
    return assemble_spans(documents, blocks, spans=sp)


def detect_boxes_table(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """The persisted detect/recognize boundary (FIXTURES.md §3) — the
    ``detect_result`` column analog (``apps/worker/app/db/models.py:26``),
    for workflows that checkpoint detect output before recognition."""
    pages = pages.filter(F.col("media_kind") != MEDIA_KIND_ERROR)
    # same default page-key skew spread as ocr_blocks/recognize_with_boxes:
    # without it the stage inherits decode's (doc_id, offset) partitioning
    # and one heavy-tail PDF's render+detect serializes on a single task
    if num_partitions is None:
        num_partitions = 3 * pages.sparkSession.sparkContext.defaultParallelism
    pages = pages.repartition(num_partitions, "doc_id", "offset", "page_index")

    def _detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in [
                    "doc_id", "offset", "media_ref", "page_index", "width",
                    "height", "block_index", "x1", "y1", "x2", "y2",
                ]
            }
            for doc_id, offset, ref, kind, page_index, desc in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_ref"],
                pdf["media_kind"], pdf["page_index"], pdf["page_desc"],
            ):
                page = formats.loads_page(desc)
                scale = raster.PDF_UNIT_SCALE if kind == "pdf" else 1.0
                img = raster.render_page(page, scale)
                for i, (x1, y1, x2, y2) in enumerate(kernels.detect_text_boxes(img)):
                    out["doc_id"].append(doc_id)
                    out["offset"].append(offset)
                    out["media_ref"].append(ref)
                    out["page_index"].append(page_index)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["block_index"].append(i)
                    out["x1"].append(x1)
                    out["y1"].append(y1)
                    out["x2"].append(x2)
                    out["y2"].append(y2)
            res = pd.DataFrame(out)
            for c in res.columns:
                if c not in ("doc_id", "media_ref"):
                    res[c] = res[c].astype("int32")
            yield res

    # offset is part of the key: the same media_ref may be referenced by
    # several spans of one document; detect/recognize state is per span
    return pages.mapInPandas(
        _detect,
        schema=(
            "doc_id string, offset int, media_ref string, page_index int, "
            "width int, height int, block_index int, x1 int, y1 int, "
            "x2 int, y2 int"
        ),
    )


# --- two-phase path: recognize from (possibly human-edited) boxes ------------


def _recognize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """run_ocr_with_boxes semantics (``orchestrator.py:116-174``): boxes
    arrive in detect_result original-page coordinates; scale to the
    preprocessed raster for cropping, keep original coords + heights."""
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in BLOCK.fields}
        for (doc_id, offset, ref, kind, page_index, desc,
             xs1, ys1, xs2, ys2, w_orig, h_orig) in zip(
            pdf["doc_id"], pdf["offset"], pdf["media_ref"],
            pdf["media_kind"], pdf["page_index"], pdf["page_desc"],
            pdf["xs1"], pdf["ys1"], pdf["xs2"], pdf["ys2"],
            pdf["width"], pdf["height"],
        ):
            boxes = list(zip(map(int, xs1), map(int, ys1),
                             map(int, xs2), map(int, ys2)))
            if not boxes:
                continue  # empty-page passthrough (orchestrator.py:133-137)
            page = formats.loads_page(desc)
            unit_scale = raster.PDF_UNIT_SCALE if kind == "pdf" else 1.0
            img = raster.render_page(page, unit_scale)
            prep = raster.PrepView(img)
            w_prep, h_prep = prep.size
            w_orig = int(w_orig) or img.shape[1]
            h_orig = int(h_orig) or img.shape[0]
            sx = w_prep / w_orig if w_orig else 1.0
            sy = h_prep / h_orig if h_orig else 1.0
            crops = [
                prep.crop((int(x1 * sx), int(y1 * sy), int(x2 * sx), int(y2 * sy)))
                for (x1, y1, x2, y2) in boxes
            ]
            heights = [y2 - y1 for (_x1, y1, _x2, y2) in boxes]
            rec = kernels.predict_batch(crops, original_heights=heights)
            texts = [t.strip() for t, _ in rec]
            n = min(len(boxes), len(rec), len(texts))  # orchestrator.py:158
            for i in range(n):
                x1, y1, x2, y2 = boxes[i]
                out["doc_id"].append(doc_id)
                out["offset"].append(offset)
                out["media_ref"].append(ref)
                out["page_index"].append(page_index)
                out["block_index"].append(i)
                out["x1"].append(x1)
                out["y1"].append(y1)
                out["x2"].append(x2)
                out["y2"].append(y2)
                out["text"].append(texts[i])
                out["conf"].append(rec[i][1])
                out["page_width"].append(w_orig)
                out["page_height"].append(h_orig)
        res = pd.DataFrame(out)
        for c in _INT_BLOCK_COLS:
            res[c] = res[c].astype("int32")
        res["conf"] = res["conf"].astype("float64")
        yield res


def recognize_with_boxes(
    pages: DataFrame, boxes: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Recognition phase driven by a (possibly human-edited) boxes table —
    the ``run_ocr_job`` path (``ocr_tasks.py:192-254``): detect output is
    persisted/edited, recognition re-runs from it.

    ``boxes``: output shape of :func:`detect_boxes_table` (block_index
    gives the detector/editor emission order; ``width``/``height`` are the
    detect-time original page dims that the crop scaling must use).
    """
    if num_partitions is None:
        num_partitions = 3 * pages.sparkSession.sparkContext.defaultParallelism
    per_page = boxes.groupBy("doc_id", "offset", "media_ref", "page_index").agg(
        F.sort_array(
            F.collect_list(F.struct("block_index", "x1", "y1", "x2", "y2"))
        ).alias("bs"),
        F.first("width").alias("width"),
        F.first("height").alias("height"),
    ).select(
        "doc_id", "offset", "media_ref", "page_index", "width", "height",
        F.transform("bs", lambda b: b["x1"]).alias("xs1"),
        F.transform("bs", lambda b: b["y1"]).alias("ys1"),
        F.transform("bs", lambda b: b["x2"]).alias("xs2"),
        F.transform("bs", lambda b: b["y2"]).alias("ys2"),
    )
    joined = (
        pages.filter(F.col("media_kind") != MEDIA_KIND_ERROR)
        .join(per_page, ["doc_id", "offset", "media_ref", "page_index"], "inner")
        .repartition(num_partitions, "doc_id", "offset", "page_index")
    )
    return joined.mapInPandas(_recognize_batches, schema=BLOCK)


def extract_documents_two_phase(
    documents: DataFrame,
    media: DataFrame,
    edited_boxes: DataFrame | None = None,
    num_partitions: int | None = None,
    broadcast_spans: bool | None = None,
) -> DataFrame:
    """The reference's two-phase workflow (detect → [human edit] →
    recognize), end-to-end: with ``edited_boxes=None`` the detect phase
    runs inline and the result equals :func:`extract_documents` exactly;
    passing an edited boxes table replays recognition from the edits.

    ``pages`` is lazily localCheckpoint-ed: the detect and recognize
    phases both consume it, and without the share each re-runs the full
    payload join + container decode (same executor-loss caveat as
    :func:`extract_documents` — checkpoint blocks are not replicated, so
    on preemptible clusters wrap with the lineage resume path)."""
    sp = shared_exploded_spans(documents)
    pages = decode_pages(documents, media, spans=sp, broadcast_spans=broadcast_spans)
    if edited_boxes is None:
        pages = pages.localCheckpoint(eager=False)
        boxes = detect_boxes_table(pages, num_partitions=num_partitions)
    else:
        boxes = edited_boxes
    blocks = recognize_with_boxes(pages, boxes, num_partitions=num_partitions)
    return assemble_spans(documents, blocks, spans=sp)
