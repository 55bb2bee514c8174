"""HTML envelope ↔ extracted text: the input_hint's per-row invariant
(byte-identical extracted text per url) through the binary html column."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from opentelemetry_collector_spark.fixtures import synthesize_pages
from opentelemetry_collector_spark.operators.htmltext import (
    extract_pages,
    extract_text,
    wrap_html,
)


def _roundtrip(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    out = (
        df.select(
            "id",
            "text",
            extract_text(wrap_html(F.col("text"), F.concat(F.lit("u"), F.col("id")))).alias("rt"),
        )
        .orderBy("id")
        .collect()
    )
    return [(r["text"], r["rt"]) for r in out]


ADVERSARIAL = [
    "",
    "plain line",
    "embedded </pre> terminator",
    "<pre>nested open",
    "already &amp; escaped & raw",
    'quotes " and \' mixed',
    "multi\nline\n\nbody with trailing newline\n",
    "ünïcödé — 多字节 ✓",
    "&lt;looks-escaped&gt;",
    "<script>alert('x')</script>",
    "&#39;&quot;&amp;&lt;&gt;",  # a body that IS entity text must survive
]


def test_adversarial_roundtrip(spark):
    for text, rt in _roundtrip(spark, ADVERSARIAL):
        assert rt == text


def test_null_text_yields_null(spark):
    df = spark.createDataFrame([(1, None)], "id int, text string")
    row = df.select(
        wrap_html(F.col("text"), F.lit("u")).alias("html")
    ).select(extract_text(F.col("html")).alias("rt")).first()
    assert row["rt"] is None


def test_fixture_pages_invariant(spark):
    """Every fixture page's html extracts back to its text column,
    byte-identical — empty pages and multi-byte UTF-8 tails included."""
    pages = synthesize_pages(spark, 300, partitions=4)
    bad = (
        extract_pages(pages)
        .where(~(F.col("extracted_text").eqNullSafe(F.col("text"))))
        .count()
    )
    assert bad == 0


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not __import__("os").path.isdir(SF_DIR), reason="driver testdata absent")
def test_documents_pages_invariant(spark):
    from opentelemetry_collector_spark.sources.tables import pages_from_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = pages_from_documents(docs)
    got = extract_pages(pages).select(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("extracted_text").eqNullSafe(F.col("text")), 0).otherwise(1)
        ).alias("bad"),
    ).first()
    assert got["n"] > 0 and got["bad"] == 0


def test_plan_is_narrow(spark):
    """Extraction is a zero-shuffle narrow transform (scan-speed at 100 TB)."""
    pages = synthesize_pages(spark, 50, partitions=2)
    plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
        ),
        min_size=1,
        max_size=8,
    )
)
def test_property_roundtrip(spark, texts):
    for text, rt in _roundtrip(spark, texts):
        assert rt == text
