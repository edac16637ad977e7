"""HTML main-content extraction: tag-strip correctness and the DOM
density heuristic vs its Python oracle; boilerplate must drop out."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.functions import html_extract

SF_DIR = "/root/testdata/sf0.001"


def test_extract_main_content_drops_boilerplate():
    html = (
        "<html><head><style>.x{}</style><script>var a=1;</script></head>"
        '<body><nav><a href="/">home</a> <a href="/a">about</a></nav>'
        '<div class="sidebar"><a href="/l1">one</a> <a href="/l2">two</a> more</div>'
        "<p>the actual article text with many words goes here and continues</p>"
        '<footer><a href="/t">terms</a> copyright</footer></body></html>'
    )
    out = html_extract.extract_main_content(html)
    assert "actual article text" in out
    assert "home" not in out
    assert "copyright" not in out
    assert "one" not in out


def test_extract_main_content_recurses_into_containers():
    """Regression: a <p> nested inside a container div must be visited.
    finditer consumes the container match whole, so without recursion the
    nested article text was silently dropped and only the footer survived
    (caught by the analytic DuckDB oracle MAIN_CONTENT_SQL)."""
    html = (
        '<body><nav><a href="/">home</a> <a href="/a">about</a></nav>'
        '<div class="content"><p>the nested article text with many words '
        "goes here and keeps going for a while</p></div>"
        '<footer><a href="/t">terms</a> copyright</footer></body>'
    )
    out = html_extract.extract_main_content(html)
    assert "nested article text" in out
    assert "copyright" not in out
    # deeper nesting too, and document order across siblings
    html2 = (
        '<div><section><p>first piece of the story text here</p></section>'
        "<div><p>second piece of the story text here</p></div></div>"
    )
    out2 = html_extract.extract_main_content(html2)
    assert out2.index("first piece") < out2.index("second piece")


def test_extract_main_content_empty_and_plain():
    assert html_extract.extract_main_content("") == ""
    assert html_extract.extract_main_content("no blocks at all") == ""
    assert (
        html_extract.extract_main_content("<p>solo</p>") == "solo"
    )


def test_spark_main_content_matches_python_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    html_df = docs.select(
        "doc_id",
        html_extract.synthesize_html(F.col("doc_id"), F.col("text")).alias(
            "html"
        ),
    )
    expected = {
        r["doc_id"]: html_extract.extract_main_content(r["html"])
        for r in html_df.collect()
    }
    got = {
        r["doc_id"]: r["main_text"]
        for r in html_extract.main_content(spark, SF_DIR).collect()
        if r["doc_id"] in expected
    }
    assert got == expected
    # content survived, boilerplate didn't
    some = next(iter(expected.values()))
    assert len(some) > 0
    assert "home about contact" not in some


def test_visible_text_contains_document_text(spark):
    out = html_extract.html_text(spark, SF_DIR).limit(20).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(20)
        .collect()
    }
    for r in out:
        if r["doc_id"] in docs:
            assert docs[r["doc_id"]].strip()[:40] in r["visible_text"]
            assert "<" not in r["visible_text"]
            assert "var t = 1" not in r["visible_text"]  # script dropped
