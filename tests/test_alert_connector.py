"""metrics→logs alert connector: metric points crossing a data-derived
threshold become plog records — the 4th connector-matrix cell
(connector/connector.go:324-391), inverse direction of count_connector.
Severity tiers per severity_number.go:26-46 (WARN=13, ERROR=17).
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import metrics as met
from opentelemetry_collector_spark.schemas import SEVERITY_NUMBER

EVENTS = [
    (0, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.5, "{}"),
    (1, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "click", 3.0, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 7, 0), 1, "error", 60.0, "{}"),
    (3, dt.datetime(2024, 1, 1, 0, 2, 0), 2, "purchase", 120.0, "{}"),
    (4, dt.datetime(2024, 1, 1, 0, 12, 0), 2, "view", 0.5, "{}"),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def points(spark):
    # 5 sum points: 1.5, 3.0, 60.0, 120.0, 0.5 → mean 37.0,
    # warn threshold 55.5, error threshold 111.0
    return met.events_to_sum_points(spark.createDataFrame(EVENTS, COLS))


def test_alert_tiers_from_data_derived_threshold(points):
    rows = {r["attr_key"]: r for r in met.metrics_to_alert_logs(points).collect()}
    # only the two points above warn_factor × mean alert
    assert set(rows) == {"error", "purchase"}
    warn = rows["error"]
    assert warn["severity_text"] == "WARN"
    assert warn["severity_number"] == SEVERITY_NUMBER["WARN"] == 13
    assert warn["value_double"] == 60.0
    assert warn["threshold"] == 55.5
    err = rows["purchase"]
    assert err["severity_text"] == "ERROR"
    assert err["severity_number"] == SEVERITY_NUMBER["ERROR"] == 17
    assert err["value_double"] == 120.0


def test_alert_body_is_float_free(points):
    # byte parity must never ride printf float behavior
    bodies = [r["body"] for r in met.metrics_to_alert_logs(points).collect()]
    assert sorted(bodies) == [
        "alert: events.value error above threshold",
        "alert: events.value purchase above threshold",
    ]


def test_alert_exact_error_boundary(spark, points):
    # v == error_factor × mean is ERROR (>= cut), just below is WARN
    df = spark.createDataFrame(
        [("a", 10.0), ("b", 29.9), ("c", 30.0), ("d", 0.1)],
        ["attr_key", "value_double"],
    ).select(
        F.lit("m").alias("metric_name"),
        F.lit(0).cast("long").alias("time_unix_nano"),
        "attr_key",
        "value_double",
    )
    # mean 17.5 → warn 26.25, error 52.5 — only b and c alert as WARN
    rows = {r["attr_key"]: r for r in met.metrics_to_alert_logs(df).collect()}
    assert set(rows) == {"b", "c"}
    assert all(r["severity_text"] == "WARN" for r in rows.values())
    # error_factor=1.2 → error cut 21.0: b and c both ERROR
    rows = {
        r["attr_key"]: r
        for r in met.metrics_to_alert_logs(df, error_factor=1.2).collect()
    }
    assert rows["b"]["severity_text"] == "ERROR"
    assert rows["c"]["severity_text"] == "ERROR"


def test_alert_empty_input_yields_zero_rows(points):
    assert met.metrics_to_alert_logs(points.where(F.lit(False))).count() == 0
