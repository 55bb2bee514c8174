"""OTLP/JSON codec tests — pdata/plog/json_test.go analog: marshal →
unmarshal round-trip equality over the full parsed record model, plus
wire-shape and item-count invariants."""

from __future__ import annotations

import json

import numpy as np
import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.fixtures.pages import generate_pages_pandas
from opentelemetry_collector_spark.functions import otlp_json
from opentelemetry_collector_spark.operators.parse import parse_pages
from opentelemetry_collector_spark.schemas import PAGES_SCHEMA


@pytest.fixture(scope="module")
def records(spark):
    pdf = generate_pages_pandas(np.arange(120, dtype=np.uint64))
    return parse_pages(spark.createDataFrame(pdf, PAGES_SCHEMA)).persist()


def _canon(rows):
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        d["attributes"] = tuple(sorted(d["attributes"].items()))
        d["resource"] = tuple(sorted(d["resource"].items()))
        out.append(tuple(sorted(d.items())))
    return sorted(out)


def test_roundtrip_equals_identity(records):
    """Every field of every record survives marshal → unmarshal exactly
    (json_test.go: TestLogsJSON round-trip equality)."""
    back = otlp_json.roundtrip(records)
    assert back.columns == records.columns
    assert _canon(back.collect()) == _canon(records.collect())


def test_record_count_invariant(records):
    """LogRecordCount is preserved through the wire form — the item
    accounting unit (pdata/plog/logs.go:45-57)."""
    n = records.count()
    marshaled = otlp_json.logs_to_otlp_json(records)
    assert marshaled.count() == records.select("resource").distinct().count()
    assert otlp_json.otlp_json_to_logs(marshaled).count() == n


def test_wire_shape_is_proto3_json(records):
    """The envelope is the proto3-JSON ExportLogsServiceRequest shape:
    resourceLogs→scopeLogs→logRecords, camelCase fields, uint64 times as
    decimal strings, attributes as key/stringValue pairs."""
    row = otlp_json.logs_to_otlp_json(records).first()
    req = json.loads(row["request_json"])
    rl = req["resourceLogs"][0]
    res_attrs = {a["key"]: a["value"]["stringValue"] for a in rl["resource"]["attributes"]}
    assert set(res_attrs) == {"host", "lang"}
    sl = rl["scopeLogs"][0]
    assert sl["scope"]["name"] == otlp_json.SCOPE_NAME
    rec = sl["logRecords"][0]
    assert isinstance(rec["timeUnixNano"], str)
    assert set(rec) >= {"timeUnixNano", "observedTimeUnixNano", "severityNumber",
                        "severityText", "body", "attributes"}
    assert "stringValue" in rec["body"]


def test_spans_roundtrip_equals_identity(spark):
    """ptrace codec: full-field round-trip equality over the span frame
    incl. nested span events (ptrace json marshal/unmarshal analog)."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.traces import events_to_spans

    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.5, '{"k": 1}'),
            (1, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "error", 3.0, '{"k": 2}'),
            (2, dt.datetime(2024, 1, 1, 0, 2, 0), 2, "purchase", 9.0, '{"k": 3}'),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spans = events_to_spans(ev)
    back = otlp_json.otlp_json_to_spans(otlp_json.spans_to_otlp_json(spans))
    assert back.columns == spans.columns

    def canon(rows):
        out = []
        for r in rows:
            d = r.asDict(recursive=True)
            d["attributes"] = tuple(sorted(d["attributes"].items()))
            d["resource"] = tuple(sorted(d["resource"].items()))
            d["events"] = tuple(
                (e["time_unix_nano"], e["name"], tuple(sorted(e["attributes"].items())))
                for e in d["events"]
            )
            d["links"] = tuple(d["links"])
            out.append(tuple(sorted(d.items())))
        return sorted(out)

    assert canon(back.collect()) == canon(spans.collect())


def test_metrics_sum_points_roundtrip(spark):
    """pmetric codec: Sum data points round-trip losslessly, including
    the double values (shortest-round-trip JSON rendering)."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.metrics import events_to_sum_points

    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.57, '{"k": 1}'),
            (1, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "view", 3.03, '{"k": 2}'),
            (2, dt.datetime(2024, 1, 1, 0, 9, 0), 2, "click", 9.99, '{"k": 3}'),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pts = events_to_sum_points(ev)
    back = otlp_json.otlp_json_to_sum_points(otlp_json.sum_points_to_otlp_json(pts))

    def canon(df):
        return sorted(
            (
                r["metric_name"],
                r["aggregation_temporality"],
                tuple(sorted(r["attributes"].items())),
                r["start_time_unix_nano"],
                r["time_unix_nano"],
                r["value_double"],
            )
            for r in df.collect()
        )

    want = canon(
        pts.select(
            "metric_name", "aggregation_temporality", "attributes",
            "start_time_unix_nano", "time_unix_nano", "value_double",
        )
    )
    got = canon(back)
    # both view events share one 5-min window → 2 points total
    assert got == want and len(got) == 2


def test_streaming_otlp_json_ingest(spark, records, tmp_path):
    """OTLP/HTTP-receiver story end to end: a stream of OTLP/JSON request
    strings is unmarshaled on the fly (from_json is streaming-safe) and
    the flat records recovered equal the original frame."""
    reqs = otlp_json.logs_to_otlp_json(records, salt_buckets=4)
    in_dir = str(tmp_path / "requests")
    reqs.select("request_json").coalesce(2).write.text(in_dir)

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(in_dir)
        .withColumnRenamed("value", "request_json")
    )
    back = otlp_json.otlp_json_to_logs(stream)
    q = (
        back.writeStream.format("memory")
        .queryName("otlp_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM otlp_ingest")
    assert got.count() == records.count()
    assert _canon(got.collect()) == _canon(records.collect())


def test_unmarshal_tolerates_minimal_record(spark):
    """proto3 JSON null-fills missing fields — a minimal record parses
    without error (permanent-error classification happens downstream)."""
    minimal = json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {"attributes": [{"key": "host", "value": {"stringValue": "h"}}]},
                    "scopeLogs": [
                        {"scope": {"name": "x", "version": "1"},
                         "logRecords": [{"body": {"stringValue": "hello"}}]}
                    ],
                }
            ]
        }
    )
    df = spark.createDataFrame([(minimal,)], ["request_json"])
    out = otlp_json.otlp_json_to_logs(df).collect()
    assert len(out) == 1
    assert out[0]["body"] == "hello"
    assert out[0]["resource"]["host"] == "h"
    assert out[0]["time_unix_nano"] is None


def test_envelope_record_cap_on_skewed_fixture(spark, records):
    """send_batch_max_size semantics (splitlogs.go:22-76 + config.go:25-46):
    with ``max_records_per_envelope`` no request carries more records than
    the cap, even when one resource dominates — and the flattened
    round-trip result is unchanged."""
    # skew: collapse every record onto ONE hot resource
    hot = records.withColumn(
        "resource",
        F.struct(F.lit("hot.example.com").alias("host"), F.lit("en").alias("lang")),
    )
    cap = 64
    marshaled = otlp_json.logs_to_otlp_json(
        hot, salt_buckets=4, max_records_per_envelope=cap
    )
    sizes = [
        sum(
            len(sl["logRecords"])
            for rl in json.loads(r["request_json"])["resourceLogs"]
            for sl in rl["scopeLogs"]
        )
        for r in marshaled.collect()
    ]
    assert max(sizes) <= cap
    assert sum(sizes) == hot.count()  # no record lost by the split
    # round-trip identity holds with the cap active
    back = otlp_json.otlp_json_to_logs(marshaled)
    assert back.count() == hot.count()


def test_full_metric_union_roundtrips(spark):
    """All five Metric union members round-trip through one JSON codec
    (pdata/pmetric/json.go:31-47; point accessors
    generated_metric.go:109-222): Gauge/Histogram/ExponentialHistogram/
    Summary here, Sum covered above — each marshal → unmarshal over a
    deterministic event frame reproduces the operator frame exactly."""
    from opentelemetry_collector_spark.operators import metrics as M

    rows = [
        (i, ["view", "click", "error"][i % 3], float(1 + (i * 7) % 40) / 2.0)
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        [
            (i, t, v, __import__("datetime").datetime(2026, 1, 1, 0, i % 50, i % 60))
            for (i, t, v) in rows
        ],
        "event_id long, event_type string, value double, ts timestamp",
    )

    g = M.gauge_points(ev)
    gb = otlp_json.otlp_json_to_gauge_points(otlp_json.gauge_points_to_otlp_json(g))
    cols = ["metric_name", "attr_key", "window_end", "value_double"]
    assert {tuple(r) for r in g.select(*cols).collect()} == {
        tuple(r) for r in gb.select(*cols).collect()
    }

    h = M.histogram_points(ev)
    hb = otlp_json.otlp_json_to_histogram_points(otlp_json.histogram_points_to_otlp_json(h))
    canon = lambda df: {
        (r.attr_key, r.hist_count, r.hist_sum, tuple(r.hist_bucket_counts), tuple(r.hist_explicit_bounds))
        for r in df.collect()
    }
    assert canon(h) == canon(hb)

    e = M.exp_histogram_points(ev)
    eb = otlp_json.otlp_json_to_exp_histogram_points(
        otlp_json.exp_histogram_points_to_otlp_json(e)
    )
    assert {(r.attr_key, r.bucket_index, r.n) for r in e.collect()} == {
        (r.attr_key, r.bucket_index, r.n) for r in eb.collect()
    }
    # DP totals consistent with the long form
    totals = {
        (r.attr_key): (r.dp_count,) for r in eb.select("attr_key", "dp_count").distinct().collect()
    }
    from collections import Counter

    want = Counter()
    for _, t, _ in rows:
        want[t] += 1
    assert {k: v[0] for k, v in totals.items()} == dict(want)

    s = M.summary_points(ev)
    sb = otlp_json.otlp_json_to_summary_points(otlp_json.summary_points_to_otlp_json(s))
    cols = ["attr_key", "summary_count", "summary_sum", "quantile", "quantile_value"]
    assert {tuple(r) for r in s.select(*cols).collect()} == {
        tuple(r) for r in sb.select(*cols).collect()
    }

    # the union is well-formed on the wire: exactly one point-type field
    req = json.loads(
        otlp_json.histogram_points_to_otlp_json(h).first()["request_json"]
    )
    metric = req["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]
    assert "histogram" in metric and "sum" not in metric and "gauge" not in metric
    dp0 = metric["histogram"]["dataPoints"][0]
    assert isinstance(dp0["count"], str)  # uint64 → decimal string
    assert all(isinstance(c, str) for c in dp0["bucketCounts"])


# ---------------------------------------------------------------------------
# Property-based round-trip (json_test.go's fuzz analog): arbitrary unicode
# bodies/attrs/urls, extreme uint64-range timestamps, random severities —
# every generated record must survive marshal → unmarshal bit-exactly.
# ---------------------------------------------------------------------------

from datetime import datetime  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
)
_ATTR_KEY = _TXT.filter(lambda k: k not in (otlp_json.URL_ATTR, otlp_json.LINE_NO_ATTR))
_HEX = st.text(alphabet="0123456789abcdef", max_size=32)

_REC = st.tuples(
    _TXT,  # url
    st.integers(min_value=0, max_value=2**62),  # time_unix_nano
    st.datetimes(
        min_value=datetime(1970, 1, 1), max_value=datetime(2100, 1, 1)
    ),  # observed_ts (session TZ is UTC)
    st.integers(min_value=0, max_value=24),  # severity_number
    _TXT,  # severity_text
    _TXT,  # body
    st.dictionaries(_ATTR_KEY, _TXT, max_size=4),  # attributes
    _HEX,  # trace_id
    _HEX,  # span_id
    st.integers(min_value=0, max_value=2**31 - 1),  # flags
    st.integers(min_value=0, max_value=1000),  # dropped_attributes_count
    st.tuples(st.sampled_from(["web-1", "web-2", ""]), st.sampled_from(["en", "xx"])),
    st.integers(min_value=0, max_value=10**6),  # line_no
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(recs=st.lists(_REC, min_size=1, max_size=8))
def test_logs_roundtrip_property(spark, recs):
    from opentelemetry_collector_spark.schemas import LOG_RECORDS_SCHEMA

    # microsecond-floor the generated datetimes: pcommon ns timestamps
    # carry µs precision through the model (TimestampType), and hypothesis
    # generates them at µs resolution already — this is a no-op guard
    df = spark.createDataFrame(recs, LOG_RECORDS_SCHEMA)
    back = otlp_json.roundtrip(df)
    assert back.columns == df.columns
    assert _canon(back.collect()) == _canon(df.collect())


_EV = st.tuples(
    st.integers(min_value=0, max_value=2**62),
    _TXT,
    st.dictionaries(_TXT, _TXT, max_size=2),
)
_LINK = st.tuples(_HEX, _HEX, _TXT, st.dictionaries(_TXT, _TXT, max_size=2))
_SPAN = st.tuples(
    st.text(alphabet="0123456789abcdef", min_size=32, max_size=32),  # trace_id
    st.text(alphabet="0123456789abcdef", min_size=16, max_size=16),  # span_id
    st.sampled_from(["", "1111222233334444"]),  # parent_span_id ("" = root)
    _TXT,  # trace_state
    _TXT,  # name
    st.integers(min_value=0, max_value=5),  # kind
    st.integers(min_value=0, max_value=2**62),  # start
    st.integers(min_value=0, max_value=2**62),  # end
    st.dictionaries(_TXT, _TXT, max_size=3),  # attributes
    st.integers(min_value=0, max_value=2),  # status_code
    _TXT,  # status_message
    st.lists(_EV, max_size=2),  # events
    st.lists(_LINK, max_size=2),  # links
    st.tuples(st.sampled_from(["svc-0", "svc-1"])),  # resource
)


def _canon_spans(rows):
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        d["attributes"] = tuple(sorted(d["attributes"].items()))
        d["resource"] = tuple(sorted(d["resource"].items()))
        d["events"] = tuple(
            (e["time_unix_nano"], e["name"], tuple(sorted(e["attributes"].items())))
            for e in d["events"]
        )
        d["links"] = tuple(
            (l["trace_id"], l["span_id"], l["trace_state"],
             tuple(sorted(l["attributes"].items())))
            for l in d["links"]
        )
        out.append(tuple(sorted(d.items())))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(recs=st.lists(_SPAN, min_size=1, max_size=6))
def test_spans_roundtrip_property(spark, recs):
    """ptrace codec fuzz: arbitrary unicode names/states/attrs and nested
    events/links survive marshal → unmarshal exactly."""
    from opentelemetry_collector_spark.operators.traces import SPANS_SCHEMA

    df = spark.createDataFrame(recs, SPANS_SCHEMA)
    back = otlp_json.otlp_json_to_spans(otlp_json.spans_to_otlp_json(df))
    assert back.columns == df.columns
    assert _canon_spans(back.collect()) == _canon_spans(df.collect())


def test_exp_histogram_unmarshal_foreign_zero_omissions(spark):
    """Canonical proto3-JSON writers omit zero-valued fields: a data point
    with only a zeroCount (no "positive" message, no "scale") must still
    yield its NULL-index zero-bucket row with scale 0 — absent means
    zero/empty, never NULL (json.go unmarshal defaults)."""
    req = {
        "resourceMetrics": [{
            "scopeMetrics": [{
                "metrics": [{
                    "name": "events.hist",
                    "exponentialHistogram": {
                        "aggregationTemporality": 1,
                        "dataPoints": [{
                            "attributes": [
                                {"key": "event_type",
                                 "value": {"stringValue": "view"}}
                            ],
                            "count": "5",
                            "zeroCount": "5",
                        }],
                    },
                }],
            }],
        }],
    }
    df = spark.createDataFrame([(json.dumps(req),)], "request_json string")
    rows = otlp_json.otlp_json_to_exp_histogram_points(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["attr_key"] == "view"
    assert r["bucket_index"] is None and r["n"] == 5
    assert r["scale"] == 0
    assert r["dp_count"] == 5


_SUMPT = st.tuples(
    st.sampled_from(["events.count", "μetric-名"]),  # metric_name
    st.integers(min_value=1, max_value=2),  # aggregation_temporality
    st.booleans(),  # is_monotonic
    st.integers(min_value=0, max_value=2**62),  # start
    st.integers(min_value=0, max_value=2**62),  # time
    st.floats(allow_nan=False, allow_infinity=False, width=64),  # value
    st.dictionaries(_TXT, _TXT, max_size=3),  # attributes
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=st.lists(_SUMPT, min_size=1, max_size=6))
def test_sum_points_roundtrip_property(spark, pts):
    """pmetric Sum codec fuzz: arbitrary unicode names/attrs, full-range
    ns timestamps, and arbitrary finite doubles survive marshal →
    unmarshal exactly (doubles ride JSON shortest-round-trip text)."""
    schema = (
        "metric_name string, aggregation_temporality int, is_monotonic boolean, "
        "start_time_unix_nano long, time_unix_nano long, value_double double, "
        "attributes map<string,string>"
    )
    df = spark.createDataFrame(pts, schema)
    back = otlp_json.otlp_json_to_sum_points(
        otlp_json.sum_points_to_otlp_json(df)
    )

    def canon(rows):
        out = []
        for r in rows:
            d = r.asDict(recursive=True)
            out.append(
                (
                    d["metric_name"],
                    d["aggregation_temporality"],
                    d["is_monotonic"],
                    d["start_time_unix_nano"],
                    d["time_unix_nano"],
                    d["value_double"],
                    tuple(sorted(d["attributes"].items())),
                )
            )
        return sorted(out)

    assert canon(back.collect()) == canon(df.collect())
    # the int union member is NULL for every double-valued point
    assert back.where(F.col("value_int").isNotNull()).count() == 0


# ---------------------------------------------------------------------------
# ExportLogsPartialSuccess wire shape (response side)
# ---------------------------------------------------------------------------


def test_export_partial_success_roundtrip(spark):
    """build → parse is identity for (rejected, message); full success
    omits partialSuccess and parses back to proto3 defaults (0, '')."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlp_json import (
        logs_export_response_json,
        parse_logs_export_response,
    )

    df = spark.createDataFrame(
        [(0, ""), (5, "queue full"), (12, ""), (0, "soft warning")],
        ["rejected", "msg"],
    )
    out = df.select(
        "rejected",
        "msg",
        parse_logs_export_response(
            logs_export_response_json(F.col("rejected"), F.col("msg"))
        ).alias("back"),
    ).collect()
    for r in out:
        assert r["back"]["rejected_log_records"] == r["rejected"]
        assert r["back"]["error_message"] == (r["msg"] if (r["rejected"] or r["msg"]) else "")
    # absent field entirely → defaults
    defaults = spark.range(1).select(
        parse_logs_export_response(F.lit("{}")).alias("b")
    ).first()["b"]
    assert defaults["rejected_log_records"] == 0 and defaults["error_message"] == ""


def test_export_partial_success_counter_parity(spark):
    """The response built from a sink's counters parses back to the same
    rejected count the telemetry recorded (counter ↔ wire parity), with
    the same proto3-JSON field names the column codec understands."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlp_json import (
        parse_logs_export_response,
    )
    from opentelemetry_collector_spark.streaming.telemetry import PipelineTelemetry

    tel = PipelineTelemetry()
    tel.record_sent("otlp", 990)
    tel.record_send_failed("otlp", 10)
    resp = tel.export_response("otlp")
    back = (
        spark.range(1)
        .select(parse_logs_export_response(F.lit(resp)).alias("b"))
        .first()["b"]
    )
    assert back["rejected_log_records"] == 10
    assert "otlp" in back["error_message"]
    # full success: unset partialSuccess on the wire
    assert tel.export_response("other") == "{}"


def test_export_partial_success_pb_parity():
    """The binary codec carries the same response contract."""
    from opentelemetry_collector_spark.functions.otlp_pb import (
        decode_export_response,
        encode_export_response,
    )

    assert decode_export_response(encode_export_response(0)) == {
        "rejected_log_records": 0,
        "error_message": "",
    }
    assert decode_export_response(encode_export_response(7, "downstream 429")) == {
        "rejected_log_records": 7,
        "error_message": "downstream 429",
    }
