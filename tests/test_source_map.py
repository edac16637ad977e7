"""source_map_blocks: the FE auto-map semantics
(json-editor.component.ts:486-531) as a range join."""

from __future__ import annotations

from ocr_platform_spark.operators import source_map

BLOCKS_SCHEMA = (
    "doc_id string, offset int, media_ref string, page_index int, "
    "block_index int, x1 int, y1 int, x2 int, y2 int, text string, "
    "conf double, page_width int, page_height int"
)


def _blocks(spark, rows):
    full = [
        ("d", 0, ref, pi, bi, 1, 2, 3, 4, text, 0.9, 100, 100)
        for (ref, pi, bi, text) in rows
    ]
    return spark.createDataFrame(full, BLOCKS_SCHEMA)


def test_range_boundaries_inclusive_and_keyed_by_media(spark):
    blocks = _blocks(
        spark,
        [
            ("m1", 0, 0, "a"),   # page 1
            ("m1", 1, 0, "b"),   # page 2
            ("m1", 2, 0, "c"),   # page 3
            ("m2", 0, 0, "z"),   # page 1, other payload
        ],
    )
    nodes = spark.createDataFrame(
        [("m1", 7, 2, 3)], source_map.NODES_SCHEMA
    )
    got = {
        (r["media_ref"], r["node_id"], r["page"], r["text"], r["match"])
        for r in source_map.source_map_blocks(blocks, nodes).collect()
    }
    # inclusive on both ends; m2's page-1 block is outside the keyed join
    assert got == {("m1", 7, 2, "b", 1), ("m1", 7, 3, "c", 1)}


def test_null_text_maps_to_empty_string(spark):
    blocks = _blocks(spark, [("m1", 0, 0, None)])
    nodes = spark.createDataFrame([("m1", 0, 1, 1)], source_map.NODES_SCHEMA)
    rows = source_map.source_map_blocks(blocks, nodes).collect()
    assert len(rows) == 1 and rows[0]["text"] == ""  # b.text || '' (FE)


def test_overlapping_nodes_each_get_the_block(spark):
    blocks = _blocks(spark, [("m1", 1, 0, "x")])  # page 2
    nodes = spark.createDataFrame(
        [("m1", 0, 1, 2), ("m1", 1, 2, 5)], source_map.NODES_SCHEMA
    )
    rows = source_map.source_map_blocks(blocks, nodes).collect()
    assert {r["node_id"] for r in rows} == {0, 1}
