"""logs→traces and metrics→traces connector cells — the last two of the
9-cell connector matrix (connector/connector.go:324-391). Sessions become
synthetic SERVER spans; threshold-crossing metric points become INTERNAL
anomaly spans. Ids are deterministic md5 so an independent engine replays
them byte-identically (status per pdata/ptrace/status_code.go:26-28).
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import metrics as met
from opentelemetry_collector_spark.operators import traces as tr

EVENTS = [
    # user 1: two sessions (40-min gap between event 1 and 2), first has
    # an error; user 2: one session, no error
    (0, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.5, "{}"),
    (1, dt.datetime(2024, 1, 1, 0, 5, 0), 1, "error", 60.0, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 45, 0), 1, "click", 3.0, "{}"),
    (3, dt.datetime(2024, 1, 1, 0, 2, 0), 2, "purchase", 120.0, "{}"),
    (4, dt.datetime(2024, 1, 1, 0, 12, 0), 2, "view", 0.5, "{}"),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, COLS)


def test_session_spans_shape_and_status(events):
    rows = {
        (r["user_id"], r["session_start"]): r
        for r in tr.logs_to_session_spans(events).collect()
    }
    assert len(rows) == 3  # user 1 splits on the 40-min gap
    t0 = int(dt.datetime(2024, 1, 1, 0, 0, 10, tzinfo=dt.timezone.utc).timestamp())
    err_sess = rows[(1, t0)]
    assert err_sess["status_code"] == tr.STATUS_CODE["Error"]
    assert err_sess["kind"] == tr.SPAN_KIND["Server"]
    assert err_sess["name"] == "session"
    assert err_sess["n_events"] == 2
    # span covers first→last event exactly, in nanoseconds
    assert err_sess["start_time_unix_nano"] == t0 * 1_000_000_000
    assert err_sess["end_time_unix_nano"] == (t0 + 290) * 1_000_000_000
    ok_sess = rows[(2, t0 + 110)]
    assert ok_sess["status_code"] == tr.STATUS_CODE["Ok"]


def test_session_span_ids_are_replayable_md5(events):
    r = [
        x
        for x in tr.logs_to_session_spans(events).collect()
        if x["user_id"] == 2
    ][0]
    src = f"2:{r['session_start']}"
    assert r["trace_id"] == hashlib.md5(src.encode()).hexdigest()
    assert r["span_id"] == hashlib.md5(f"s:{src}".encode()).hexdigest()[:16]
    assert len(r["trace_id"]) == 32 and len(r["span_id"]) == 16


def test_anomaly_spans_cover_their_window(events):
    pts = met.events_to_sum_points(events)
    # windows: (view,w0)=1.5 (error,w1)=60 (click,w9)=3 (purchase,w0)=120
    # (view,w2)=0.5 → mean 37.0, warn 55.5, error 111.0
    rows = {r["attr_key"]: r for r in tr.metrics_to_anomaly_spans(pts).collect()}
    assert set(rows) == {"error", "purchase"}
    assert rows["error"]["status_code"] == tr.STATUS_CODE["Ok"]  # WARN tier
    assert rows["purchase"]["status_code"] == tr.STATUS_CODE["Error"]
    for r in rows.values():
        assert r["kind"] == tr.SPAN_KIND["Internal"]
        assert r["end_time_unix_nano"] - r["start_time_unix_nano"] == 300 * 1_000_000_000
        assert r["start_time_unix_nano"] == r["window_start"] * 1_000_000_000
        src = f"{r['attr_key']}@{r['window_start']}"
        assert r["trace_id"] == hashlib.md5(src.encode()).hexdigest()


def test_span_connectors_empty_inputs(events):
    assert tr.logs_to_session_spans(events.where(F.lit(False))).count() == 0
    pts = met.events_to_sum_points(events.where(F.lit(False)))
    assert tr.metrics_to_anomaly_spans(pts).count() == 0


def test_anomaly_spans_window_start_exact_past_2_53(spark):
    # window_start must use INTEGRAL division: 1699999999999999999 ns is
    # 1 ns before a second boundary and > 2^53, so double division rounds
    # UP to 1700000000 and the md5 id seeds shift to the wrong window
    n = 1699999999999999999
    pts = spark.createDataFrame(
        [("k", n, n + 300 * 10**9, 100.0, 1)],
        "attr_key string, start_time_unix_nano long, time_unix_nano long,"
        " value_double double, point_count long",
    )
    r = tr.metrics_to_anomaly_spans(pts, warn_factor=0.5).collect()[0]
    assert r["window_start"] == n // 10**9 == 1699999999
    import hashlib

    src = f"k@{n // 10**9}"
    assert r["trace_id"] == hashlib.md5(src.encode()).hexdigest()


def test_alert_and_anomaly_share_one_threshold_recipe(events):
    # the twin contract both oracles replay: the two connector cells must
    # select the SAME points at the SAME tiers from the same input
    pts = met.events_to_sum_points(events)
    alerts = {
        (r["attr_key"], r["severity_text"] == "ERROR")
        for r in met.metrics_to_alert_logs(pts).collect()
    }
    spans = {
        (r["attr_key"], r["status_code"] == tr.STATUS_CODE["Error"])
        for r in tr.metrics_to_anomaly_spans(pts).collect()
    }
    assert alerts == spans
