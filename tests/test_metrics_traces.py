"""pmetric/ptrace model tests: temporality round-trip, histogram
invariants, span-frame structure — the unit layer under the oracle-checked
driver queries (fixture discipline per internal/testdata/log.go:28-42).
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import metrics as met
from opentelemetry_collector_spark.operators import traces as tr

EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.5, '{"k": 1}'),
    (1, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "click", 3.0, '{"k": 2}'),
    (2, dt.datetime(2024, 1, 1, 0, 7, 0), 1, "error", 60.0, '{"k": 3}'),
    (3, dt.datetime(2024, 1, 1, 0, 2, 0), 2, "purchase", 120.0, '{"k": 4}'),
    (4, dt.datetime(2024, 1, 1, 0, 12, 0), 2, "view", 0.5, '{"k": 5}'),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, COLS)


# ---------------------------------------------------------------------------
# pmetric
# ---------------------------------------------------------------------------

def test_sum_points_are_delta_tagged(events):
    pts = met.events_to_sum_points(events).collect()
    assert all(r["aggregation_temporality"] == met.TEMPORALITY_DELTA for r in pts)
    assert all(r["metric_type"] == met.METRIC_TYPE["Sum"] for r in pts)
    # two view events in different windows → two points for 'view'
    views = sorted(r["time_unix_nano"] for r in pts if r["attr_key"] == "view")
    assert len(views) == 2


def test_delta_to_cumulative_running_sum(events):
    cum = met.delta_to_cumulative(met.events_to_sum_points(events))
    rows = sorted(
        cum.where(F.col("attr_key") == "view").collect(),
        key=lambda r: r["time_unix_nano"],
    )
    assert [r["aggregation_temporality"] for r in rows] == [met.TEMPORALITY_CUMULATIVE] * 2
    assert rows[0]["cum_value_double"] == 1.5
    assert rows[1]["cum_value_double"] == 2.0  # 1.5 + 0.5
    # start time collapses to the series origin (fixed start semantics)
    assert rows[0]["start_time_unix_nano"] == rows[1]["start_time_unix_nano"]


def test_cumulative_to_delta_inverts(events):
    pts = met.events_to_sum_points(events)
    cum = met.delta_to_cumulative(pts).select(
        "metric_name", "attr_key", "time_unix_nano", "start_time_unix_nano",
        F.col("cum_value_double").alias("value_double"),
    )
    back = met.cumulative_to_delta(cum)
    got = {
        (r["attr_key"], r["time_unix_nano"]): r["delta_value_double"]
        for r in back.collect()
    }
    want = {
        (r["attr_key"], r["time_unix_nano"]): r["value_double"] for r in pts.collect()
    }
    assert got == want


def test_histogram_bucket_counts_sum_to_count(events):
    hist = met.histogram_points(events, bounds=met.DEFAULT_HIST_BOUNDS).collect()
    for r in hist:
        assert len(r["hist_bucket_counts"]) == len(met.DEFAULT_HIST_BOUNDS) + 1
        assert sum(r["hist_bucket_counts"]) == r["hist_count"]
    # purchase value 120 > last bound → overflow bucket
    p = next(r for r in hist if r["attr_key"] == "purchase")
    assert p["hist_bucket_counts"][-1] == 1


def test_histogram_long_form_matches_wide(events):
    bounds = met.DEFAULT_HIST_BOUNDS
    hist = met.histogram_points(events, bounds=bounds)
    long = met.histogram_buckets_long(hist, bounds).collect()
    wide = {r["attr_key"]: r["hist_bucket_counts"] for r in hist.collect()}
    for r in long:
        assert r["n"] == wide[r["attr_key"]][r["bucket_idx"]]
        if r["bucket_idx"] < len(bounds):
            assert r["le"] == bounds[r["bucket_idx"]]
        else:
            assert r["le"] is None


def test_gauge_points_take_last_value(events):
    pts = {
        (r["attr_key"], r["window_end"]): r["value_double"]
        for r in met.gauge_points(events).collect()
    }
    # window [0:00, 0:05): view@0:00:10 then click@0:01:00 — click is last
    assert pts[("view", 1704067500)] == 1.5
    assert pts[("click", 1704067500)] == 3.0
    assert all(r[0] is not None for r in pts)


def test_exp_histogram_bucket_math(events):
    import math

    pts = {
        (r["attr_key"], r["bucket_index"]): r["n"]
        for r in met.exp_histogram_points(events, scale=2).collect()
    }
    # value 1.5 → ceil(log2(1.5)*4)-1 = ceil(2.3398)-1 = 2
    assert pts[("view", 2)] == 1
    # value 120 → ceil(log2(120)*4)-1 = ceil(27.627)-1 = 27
    assert pts[("purchase", 27)] == 1
    for (_, idx), _n in pts.items():
        assert idx is not None  # all fixture values are > 0


def test_summary_points_exact_quantiles(events):
    rows = met.summary_points(events, quantiles=(0.5,)).collect()
    by_key = {r["attr_key"]: r for r in rows}
    v = by_key["view"]
    assert v["summary_count"] == 2 and v["quantile"] == 0.5
    assert v["quantile_value"] == 1.0  # median of {0.5, 1.5}, interpolated


def test_sum_points_work_under_streaming(spark, tmp_path):
    """The same events_to_sum_points expression runs under Structured
    Streaming with a watermark (metrics-receiver boundary as a stream);
    emitted watermark-closed points equal the batch evaluation."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "ev")
    for i, batch in enumerate([EVENTS[:3], EVENTS[3:]]):
        spark.createDataFrame(batch, COLS).coalesce(1).write.mode("append").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    pts = met.events_to_sum_points(stream.withWatermark("ts", "0 seconds"))
    q = (
        pts.writeStream.format("memory")
        .queryName("sum_pts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["attr_key"], r["time_unix_nano"]): (r["point_count"], r["value_double"])
        for r in spark.sql("SELECT * FROM sum_pts").collect()
    }
    batch_pts = {
        (r["attr_key"], r["time_unix_nano"]): (r["point_count"], r["value_double"])
        for r in met.events_to_sum_points(spark.read.parquet(d)).collect()
    }
    assert got  # at least the watermark-closed windows emitted
    for k, v in got.items():
        assert batch_pts[k] == v


# ---------------------------------------------------------------------------
# ptrace
# ---------------------------------------------------------------------------

def test_span_frame_parent_chain(events):
    spans = tr.events_to_spans(events).collect()
    # user 1: view → click → error, chained parents, one root
    u1 = [s for s in spans if s["name"] in ("view", "click", "error") and s["attributes"]["event_id"] in ("0", "1", "2")]
    u1.sort(key=lambda s: s["start_time_unix_nano"])
    assert u1[0]["parent_span_id"] == ""
    assert u1[1]["parent_span_id"] == u1[0]["span_id"]
    assert u1[2]["parent_span_id"] == u1[1]["span_id"]
    assert len({s["trace_id"] for s in u1}) == 1


def test_span_enums_and_duration(events):
    spans = {s["attributes"]["event_id"]: s for s in tr.events_to_spans(events).collect()}
    err = spans["2"]
    assert err["kind"] == tr.SPAN_KIND["Internal"]
    assert err["status_code"] == tr.STATUS_CODE["Error"]
    assert err["status_message"] != ""
    assert [e["name"] for e in err["events"]] == ["exception"]
    # duration: value ms → ns interval
    assert err["end_time_unix_nano"] - err["start_time_unix_nano"] == 60_000_000
    ok = spans["0"]
    assert ok["status_code"] == tr.STATUS_CODE["Ok"]
    assert ok["events"] == []


def test_spanmetrics_red_rollup(events):
    out = {
        (r["service"], r["kind"], r["status_code"]): r
        for r in tr.spanmetrics(tr.events_to_spans(events)).collect()
    }
    err = out[("svc-1", tr.SPAN_KIND["Internal"], tr.STATUS_CODE["Error"])]
    assert err["calls"] == 1 and err["sum_ms"] == 60.0
    srv = out[("svc-1", tr.SPAN_KIND["Server"], tr.STATUS_CODE["Ok"])]
    assert srv["calls"] == 2
    assert srv["min_ms"] == 1.5 and srv["max_ms"] == 3.0 and srv["avg_ms"] == 2.25


def test_count_connector_points(spark, events):
    """Logs→metrics count connector: per-attribute-set counts as
    monotonic Delta Sum points on the pmetric frame
    (connector/connector.go:324-391 matrix cell)."""
    from opentelemetry_collector_spark.sources.tables import events_to_records

    pts = met.count_connector(
        events_to_records(events), attrs=("event_type",)
    ).collect()
    got = {r["event_type"]: r for r in pts}
    assert got["view"]["point_count"] == 2
    assert got["view"]["value_double"] == 2.0
    assert got["view"]["attributes"] == {"event_type": "view"}
    r = got["error"]
    assert r["metric_name"] == "log.record.count"
    assert r["metric_type"] == met.METRIC_TYPE["Sum"]
    assert r["aggregation_temporality"] == met.TEMPORALITY_DELTA
    assert r["is_monotonic"] is True


def test_count_connector_condition_and_multi_attr(spark, events):
    from opentelemetry_collector_spark.sources.tables import events_to_records

    recs = events_to_records(events)
    pts = met.count_connector(
        recs,
        attrs=("event_type", "severity_text"),
        metric_name="error.count",
        condition=F.col("severity_number") >= 17,
    ).collect()
    assert len(pts) == 1
    assert pts[0]["event_type"] == "error"
    assert pts[0]["severity_text"] == "ERROR"
    assert pts[0]["metric_name"] == "error.count"
    assert pts[0]["attributes"] == {
        "event_type": "error", "severity_text": "ERROR"
    }


def test_count_connector_empty_and_no_attrs(spark, events):
    from opentelemetry_collector_spark.sources.tables import events_to_records

    recs = events_to_records(events)
    assert met.count_connector(recs.where(F.lit(False))).count() == 0
    with pytest.raises(ValueError, match="grouping attribute"):
        met.count_connector(recs, attrs=())
