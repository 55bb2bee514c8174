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
