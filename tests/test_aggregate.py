"""Aggregation-operator tests: rollups, spanmetrics connector, windows."""

from __future__ import annotations

import datetime as dt

import pytest

from opentelemetry_collector_spark.operators.aggregate import (
    spanmetrics,
    tumbling_window,
)
from opentelemetry_collector_spark.sources.tables import events_to_records

EVENTS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 30), 10, "error", 5.0, '{"k": 1}'),
    (2, dt.datetime(2024, 1, 1, 0, 1, 0), 11, "click", 1.0, '{"k": 2}'),
    (3, dt.datetime(2024, 1, 1, 0, 6, 0), 10, "error", 7.0, '{"k": 3}'),
    (4, dt.datetime(2024, 1, 1, 0, 6, 30), 12, "view", 0.5, '{"k": 4}'),
]

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, COLS)


def test_events_to_records_severity_and_json(events):
    rows = {r["event_id"]: r for r in events_to_records(events).collect()}
    assert rows[1]["severity_text"] == "ERROR" and rows[1]["severity_number"] == 17
    assert rows[2]["severity_text"] == "DEBUG" and rows[2]["severity_number"] == 5
    assert rows[1]["attr_k"] == "1"
    assert rows[1]["time_unix_nano"] == int(
        dt.datetime(2024, 1, 1, 0, 0, 30, tzinfo=dt.timezone.utc).timestamp() * 1e9
    )


def test_spanmetrics(events):
    rows = {r["event_type"]: r for r in spanmetrics(events).collect()}
    assert rows["error"]["calls"] == 2
    assert rows["error"]["sum_value"] == 12.0
    assert rows["error"]["avg_value"] == 6.0


def test_tumbling_window(events):
    rows = {
        (r["window_start"], r["event_type"]): r["items"]
        for r in tumbling_window(events).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert rows[(base, "error")] == 1
    assert rows[(base, "click")] == 1
    assert rows[(base + 300, "error")] == 1
    assert rows[(base + 300, "view")] == 1
