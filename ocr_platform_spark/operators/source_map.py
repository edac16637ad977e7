"""Structure-node → OCR-block auto-mapping (the reference FE's source map).

The reference maps every OCR block whose page falls inside a structure
node's anchor range into the node's ``source_map.mapped_blocks``, each
entry ``{page, block_idx, bbox, text, match: 1}``
(``frontend-angular/src/app/components/json-editor/json-editor.component.ts:486-531``
— ``autoMapBlocksForSelectedNode``).  Engine-side this is a range join of
the blocks table against a nodes table on
``page BETWEEN start_page AND end_page`` (the true J5 of SURVEY.md §2.6):
an equi-join on ``media_ref`` with a residual BETWEEN predicate, so Spark
plans a hash join keyed on the media id — never a cross product — and the
(small) nodes side broadcasts.

Pages are 1-based here, matching the FE (``pageStart = ... || 1``); the
blocks table's ``page_index`` is 0-based, so ``page = page_index + 1``.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Deterministic per-payload structure-node template (1-based, inclusive
# page ranges — the anchors_full_range shape). The last node's open tail
# mirrors the FE default "pageEnd = ... || pageStart" degenerating to a
# catch-all when anchors are absent.
NODE_TEMPLATE: list[tuple[int, int, int]] = [
    (0, 1, 1),
    (1, 2, 3),
    (2, 4, 8),
    (3, 9, 1_000_000),
]

NODES_SCHEMA = "media_ref string, node_id int, start_page int, end_page int"


def source_map_blocks(blocks: DataFrame, nodes: DataFrame) -> DataFrame:
    """Map blocks into node page ranges → ``mapped_blocks`` rows.

    ``blocks``: the recognized-blocks shape of
    :func:`ocr_platform_spark.operators.extract.ocr_blocks`
    (media_ref, page_index, block_index, x1..y2, text).
    ``nodes``: (media_ref, node_id, start_page, end_page), 1-based
    inclusive ranges.
    """
    b = blocks.select(
        "media_ref",
        (F.col("page_index") + 1).alias("page"),
        F.col("block_index").alias("block_idx"),
        "x1", "y1", "x2", "y2",
        F.coalesce("text", F.lit("")).alias("text"),  # b.text || '' (FE)
    )
    return (
        b.join(
            F.broadcast(nodes),
            on=[
                b.media_ref == nodes.media_ref,
                b.page >= nodes.start_page,
                b.page <= nodes.end_page,
            ],
        )
        .select(
            b.media_ref.alias("media_ref"),
            "node_id",
            "page",
            "block_idx",
            "x1", "y1", "x2", "y2",
            "text",
            F.lit(1).alias("match"),
        )
    )


def nodes_for_media(spark: SparkSession, media_refs: list[str]) -> DataFrame:
    """Apply NODE_TEMPLATE to every payload (the deterministic stand-in
    for human-authored structure anchors)."""
    rows = [
        (ref, nid, s, e)
        for ref in sorted(media_refs)
        for (nid, s, e) in NODE_TEMPLATE
    ]
    return spark.createDataFrame(rows, NODES_SCHEMA)


# --- gate query + independently derived DuckDB oracle -------------------------


def source_map_blocks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: blocks from the real Spark detect+recognize
    pipeline over the deterministic corpus, mapped through NODE_TEMPLATE
    nodes. The DuckDB oracle recomputes the SAME blocks with the
    single-node Python oracle (ocr_platform_spark.oracle) — so the gate
    cross-checks both the range join and the extraction pipeline."""
    from ..queries import _corpus_dfs  # late import: avoids a cycle
    from . import extract

    docs_df, media_df = _corpus_dfs(spark)
    pages = extract.decode_pages(docs_df, media_df)
    blocks = extract.ocr_blocks(pages)
    refs = [r["media_ref"] for r in media_df.select("media_ref").collect()]
    return source_map_blocks(blocks, nodes_for_media(spark, refs))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@lru_cache(maxsize=1)
def source_map_blocks_oracle_sql() -> str:
    """Build the oracle lazily (it runs the single-node OCR oracle over
    the corpus once): blocks as a VALUES CTE + the same range join in SQL."""
    from .. import oracle
    from ..corpus import generate
    from ..queries import _CORPUS_DOCS, _CORPUS_MAX_PAGES

    _docs, media = generate(_CORPUS_DOCS, max_pages=_CORPUS_MAX_PAGES)
    block_rows: list[str] = []
    for ref in sorted(media):
        for page in oracle.extract_media(media[ref]["data"]):
            for idx, blk in enumerate(page.blocks):
                x1, y1, x2, y2 = blk.box
                block_rows.append(
                    f"({_sql_quote(ref)}, {page.page_index + 1}, {idx}, "
                    f"{x1}, {y1}, {x2}, {y2}, {_sql_quote(blk.text)})"
                )
    node_rows = [
        f"({_sql_quote(ref)}, {nid}, {s}, {e})"
        for ref in sorted(media)
        for (nid, s, e) in NODE_TEMPLATE
    ]
    return f"""
WITH blocks(media_ref, page, block_idx, x1, y1, x2, y2, text) AS (
  VALUES {", ".join(block_rows)}
),
nodes(media_ref, node_id, start_page, end_page) AS (
  VALUES {", ".join(node_rows)}
)
SELECT n.media_ref, n.node_id,
       CAST(b.page AS INT) AS page, CAST(b.block_idx AS INT) AS block_idx,
       CAST(b.x1 AS INT) AS x1, CAST(b.y1 AS INT) AS y1,
       CAST(b.x2 AS INT) AS x2, CAST(b.y2 AS INT) AS y2,
       b.text, CAST(1 AS INT) AS "match"
FROM nodes n
JOIN blocks b
  ON b.media_ref = n.media_ref
 AND b.page BETWEEN n.start_page AND n.end_page
"""
