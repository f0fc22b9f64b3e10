"""Semantic tests for the round-9 [EXT] additions: HTML boilerplate
removal, the fused IVF-PQ serving index, the stream-stream left-outer
join, the Python UDTF surface, BM25 ranking, label propagation, the
interval-overlap join, and histogram drift.
"""

from __future__ import annotations

import pytest

from xml_to_parquet_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# text_html_extract (operators/text.py)
# ---------------------------------------------------------------------------


def _extract(spark, html: str):
    """Run the extraction expressions over one handwritten page."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.text import _html_extract_exprs

    ex = _html_extract_exprs("spark")
    df = spark.createDataFrame([(html,)], "html string").select(
        F.expr(ex["txts"]).alias("txts")
    )
    return df.collect()[0]["txts"]


def test_html_extract_keeps_main_drops_boilerplate(spark):
    txts = _extract(
        spark,
        '<div><a href="/">home</a> <a href="/x">about</a></div>'
        "<script>var t = 1; track(t);</script>"
        "<p>this paragraph carries the long-form main content of the "
        "page and must survive extraction</p>"
        '<div>(c) corp <a href="/t">terms</a> <a href="/p">privacy</a></div>',
    )
    assert txts == [
        "this paragraph carries the long-form main content of the "
        "page and must survive extraction"
    ]


def test_html_extract_link_density_boundary(spark):
    # text_len 27 >= 25; anchor text "123456789" = 9 chars; 3*9 = 27
    # <= 27 -> kept at EXACTLY a third, dropped one char over.
    at_third = "<p>ab defgh jklmnopq <a href='#'>123456789</a></p>"
    assert len(_extract(spark, at_third)) == 1
    over_third = "<p>ab defgh jklmnop <a href='#'>123456789x</a></p>"
    assert _extract(spark, over_third) == []


def test_html_extract_min_length_gate(spark):
    assert _extract(spark, "<p>short text only here</p>") == []
    assert len(_extract(spark, "<p>twenty-five chars here: ok</p>")) == 1


def test_html_extract_script_content_never_leaks(spark):
    txts = _extract(
        spark,
        "<script>var leak = 'this script body is plenty long enough to "
        "pass the length gate';</script>"
        "<p>legitimate article text long enough to pass the gate</p>",
    )
    assert txts == ["legitimate article text long enough to pass the gate"]


def test_html_extract_boilerplate_only_page_yields_zero_blocks(reg, spark, sf_dir):
    """End-to-end: every document produces a row; kept_blocks counts only
    content blocks and main_text is their space-joined concatenation."""
    out = reg["text_html_extract"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["kept_blocks"] >= 0
        assert r["main_len"] == len(r["main_text"]) - (
            r["kept_blocks"] - 1 if r["kept_blocks"] > 1 else 0
        )
