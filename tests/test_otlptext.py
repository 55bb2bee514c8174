"""Golden-output tests for the text renderer — loggingexporter analog
(exporter/loggingexporter/internal/otlptext/testdata/logs/*.out pattern:
byte-stable rendered text checked against a golden file)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from opentelemetry_collector_spark.fixtures.pages import generate_pages_pandas
from opentelemetry_collector_spark.functions.otlptext import render_records, render_to_string
from opentelemetry_collector_spark.operators.parse import parse_pages
from opentelemetry_collector_spark.schemas import PAGES_SCHEMA

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "otlptext_pages0-3.out")


@pytest.fixture(scope="module")
def records(spark):
    pdf = generate_pages_pandas(np.arange(4, dtype=np.uint64))
    pages = spark.createDataFrame(pdf, PAGES_SCHEMA)
    return parse_pages(pages)


def test_rendered_blocks_have_all_fields(records):
    row = render_records(records).orderBy("url", "line_no").first()
    for field in ("LogRecord #", "ObservedTimestamp:", "Timestamp:", "SeverityText:",
                  "Body: Str(", "Trace ID:", "Span ID:", "Flags:"):
        assert field in row["rendered"]


def test_golden_bytes(records):
    text = render_to_string(records, limit=10)
    if not os.path.exists(GOLDEN):  # first run writes the golden
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w", encoding="utf-8") as f:
            f.write(text)
    with open(GOLDEN, encoding="utf-8") as f:
        expected = f.read()
    assert text == expected


def test_rendering_is_deterministic(records):
    assert render_to_string(records, limit=5) == render_to_string(records, limit=5)


SPAN_GOLDEN = (
    "Span #0\n"
    "Trace ID: aaaa\n"
    "Parent ID: \n"
    "ID: bbbb\n"
    "Name: purchase\n"
    "Kind: Client\n"
    "Start time: 2024-01-01 00:00:00.000000 UTC\n"
    "End time: 2024-01-01 00:00:01.500000 UTC\n"
    "Status code: Ok\n"
    "Status message: \n"
    "Attributes:\n"
    "     -> k: Str(v)\n"
)


def test_span_golden_bytes(spark):
    """Span text block, hand-written expected bytes (traces.go field
    order, enum String() names)."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlptext import render_span

    df = spark.range(1).select(
        F.lit("aaaa").alias("trace_id"),
        F.lit("bbbb").alias("span_id"),
        F.lit("").alias("parent_span_id"),
        F.lit("purchase").alias("name"),
        F.lit(3).cast("int").alias("kind"),
        F.lit(1704067200_000_000_000).alias("start_time_unix_nano"),
        F.lit(1704067201_500_000_000).alias("end_time_unix_nano"),
        F.create_map(F.lit("k"), F.lit("v")).alias("attributes"),
        F.lit(1).cast("int").alias("status_code"),
        F.lit("").alias("status_message"),
    )
    got = df.select(render_span(F.lit(0)).alias("r")).first()["r"]
    assert got == SPAN_GOLDEN


NUM_DP_GOLDEN = (
    "NumberDataPoints #0\n"
    "Attributes:\n"
    "     -> event_type: Str(view)\n"
    "StartTimestamp: 2024-01-01 00:00:00.000000 UTC\n"
    "Timestamp: 2024-01-01 00:05:00.000000 UTC\n"
    "Value: 4.6\n"
)


def test_number_data_point_golden_bytes(spark):
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlptext import (
        render_number_data_point,
    )

    df = spark.range(1).select(
        F.lit(1704067200_000_000_000).alias("start_time_unix_nano"),
        F.lit(1704067500_000_000_000).alias("time_unix_nano"),
        F.create_map(F.lit("event_type"), F.lit("view")).alias("attributes"),
        F.lit(4.6).alias("value_double"),
    )
    got = df.select(render_number_data_point(F.lit(0)).alias("r")).first()["r"]
    assert got == NUM_DP_GOLDEN
