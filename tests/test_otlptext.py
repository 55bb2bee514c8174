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
        F.array().cast(
            "array<struct<time_unix_nano:bigint,name:string,attributes:map<string,string>>>"
        ).alias("events"),
        F.array().cast(
            "array<struct<trace_id:string,span_id:string,trace_state:string,"
            "attributes:map<string,string>>>"
        ).alias("links"),
    )
    got = df.select(render_span(F.lit(0)).alias("r")).first()["r"]
    assert got == SPAN_GOLDEN


SPAN_WITH_EVENTS_LINKS_GOLDEN = (
    "Span #0\n"
    "Trace ID: aaaa\n"
    "Parent ID: cccc\n"
    "ID: bbbb\n"
    "Name: error\n"
    "Kind: Internal\n"
    "Start time: 2024-01-01 00:00:00.000000 UTC\n"
    "End time: 2024-01-01 00:00:01.500000 UTC\n"
    "Status code: Error\n"
    "Status message: event processing failed\n"
    "Events:\n"
    "SpanEvent #0\n"
    "     -> Name: exception\n"
    "     -> Timestamp: 2024-01-01 00:00:00.000000 UTC\n"
    "     -> DroppedAttributesCount: 0\n"
    "     -> Attributes::\n"
    "          -> exception.type: Str(PipelineError)\n"
    "Links:\n"
    "SpanLink #0\n"
    "     -> Trace ID: aaaa\n"
    "     -> ID: dddd\n"
    "     -> TraceState: ot=svc-1\n"
    "     -> DroppedAttributesCount: 0\n"
    "     -> Attributes::\n"
    "          -> link.type: Str(trace_root)\n"
)


def test_span_events_links_golden_bytes(spark):
    """Span with an event and a link renders the Events:/Links: sections
    (databuffer.go:231-270 logEvents/logLinks shape — SpanEvent/SpanLink
    blocks with the nested double-colon attributes indent from
    two_spans.out)."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlptext import render_span

    start_ns = 1704067200_000_000_000
    df = spark.range(1).select(
        F.lit("aaaa").alias("trace_id"),
        F.lit("bbbb").alias("span_id"),
        F.lit("cccc").alias("parent_span_id"),
        F.lit("error").alias("name"),
        F.lit(1).cast("int").alias("kind"),
        F.lit(start_ns).alias("start_time_unix_nano"),
        F.lit(start_ns + 1_500_000_000).alias("end_time_unix_nano"),
        F.create_map().cast("map<string,string>").alias("attributes"),
        F.lit(2).cast("int").alias("status_code"),
        F.lit("event processing failed").alias("status_message"),
        F.array(
            F.struct(
                F.lit(start_ns).alias("time_unix_nano"),
                F.lit("exception").alias("name"),
                F.create_map(F.lit("exception.type"), F.lit("PipelineError")).alias(
                    "attributes"
                ),
            )
        ).alias("events"),
        F.array(
            F.struct(
                F.lit("aaaa").alias("trace_id"),
                F.lit("dddd").alias("span_id"),
                F.lit("ot=svc-1").alias("trace_state"),
                F.create_map(F.lit("link.type"), F.lit("trace_root")).alias("attributes"),
            )
        ).alias("links"),
    )
    got = df.select(render_span(F.lit(0)).alias("r")).first()["r"]
    assert got == SPAN_WITH_EVENTS_LINKS_GOLDEN


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


HIST_DP_GOLDEN = (
    "HistogramDataPoints #0\n"
    "Data point attributes:\n"
    "     -> event_type: Str(view)\n"
    "StartTimestamp: 1970-01-01 00:00:00 +0000 UTC\n"
    "Timestamp: 1970-01-01 00:00:00 +0000 UTC\n"
    "Count: 3\n"
    "Sum: 12.500000\n"
    "Min: 1.000000\n"
    "Max: 9.000000\n"
    "ExplicitBounds #0: 1.000000\n"
    "ExplicitBounds #1: 5.000000\n"
    "Buckets #0, Count: 1\n"
    "Buckets #1, Count: 1\n"
    "Buckets #2, Count: 1\n"
)


def test_histogram_data_point_golden_bytes(spark):
    """Histogram point block, hand-written bytes — the databuffer.go
    logHistogramDataPoints line shapes (Count, Go-%f Sum,
    ExplicitBounds #i, Buckets #j)."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlptext import (
        render_histogram_data_point,
    )

    df = spark.range(1).select(
        F.lit("view").alias("attr_key"),
        F.lit(3).cast("long").alias("hist_count"),
        F.lit(12.5).alias("hist_sum"),
        F.lit(1.0).alias("hist_min"),
        F.lit(9.0).alias("hist_max"),
        F.array(F.lit(1), F.lit(1), F.lit(1)).cast("array<bigint>").alias(
            "hist_bucket_counts"
        ),
        F.array(F.lit(1.0), F.lit(5.0)).alias("hist_explicit_bounds"),
    )
    got = df.select(render_histogram_data_point(F.lit(0)).alias("r")).first()["r"]
    assert got == HIST_DP_GOLDEN


SUMMARY_DP_GOLDEN = (
    "SummaryDataPoints\n"
    "Data point attributes:\n"
    "     -> event_type: Str(view)\n"
    "StartTimestamp: 1970-01-01 00:00:00 +0000 UTC\n"
    "Timestamp: 1970-01-01 00:00:00 +0000 UTC\n"
    "Count: 10\n"
    "Sum: 99.500000\n"
    "QuantileValue #0: Quantile 0.500000, Value 9.000000\n"
    "QuantileValue #1: Quantile 0.990000, Value 20.250000\n"
)


def test_summary_points_golden_bytes(spark):
    """Summary point block (databuffer.go:208-229): QuantileValue lines
    sorted by quantile, Go-%f doubles."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlptext import render_summary_points

    df = spark.createDataFrame(
        [
            ("view", 10, 99.5, 0.99, 20.25),
            ("view", 10, 99.5, 0.5, 9.0),
        ],
        "attr_key string, summary_count long, summary_sum double, "
        "quantile double, quantile_value double",
    )
    got = render_summary_points(df).first()["rendered"]
    assert got == SUMMARY_DP_GOLDEN


def test_exp_histogram_points_render(spark):
    """Exp-histogram block (databuffer.go:152-206): zero bucket first as
    'Bucket [0, 0]', then positive buckets with exp(index·ln2·2⁻ˢ)
    boundaries; scale 0 → powers of two."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.functions.otlptext import (
        render_exp_histogram_points,
    )

    df = spark.createDataFrame(
        [
            ("view", 0, 1, 2, 5.0),   # bucket (1,2]: index 1 → [2,4) upper? scale 0: [2.0,4.0)
            ("view", 0, None, 1, 0.0),  # zero bucket
            ("view", 0, 3, 4, 40.0),
        ],
        "attr_key string, scale int, bucket_index bigint, n bigint, bucket_sum double",
    )
    got = render_exp_histogram_points(df).first()["rendered"]
    assert "ExponentialHistogramDataPoints\n" in got
    assert "Count: 7\n" in got and "Sum: 45.000000\n" in got
    assert "Bucket [0, 0], Count: 1" in got
    assert "Bucket [2.000000, 4.000000), Count: 2" in got
    assert "Bucket [8.000000, 16.000000), Count: 4" in got
    # zero bucket renders before the positive buckets
    assert got.index("Bucket [0, 0]") < got.index("Bucket [2.000000")


TYPED_ATTRS_GOLDEN = (
    "Attributes:\n"
    "     -> enabled: Bool(true)\n"
    "     -> pi: Double(3.14)\n"
    "     -> retries: Int(42)\n"
    "     -> tags: Map({\"k1\":\"val1\",\"k2\":\"val2\"})\n"
)


def test_typed_attr_lines_golden_bytes(spark):
    """Typed attribute values render as Type(AsString) — the
    embedded_maps.out pattern: Map→JSON, Double→ES6 shortest round-trip,
    Bool/Int via strconv (valueToString, databuffer.go:272-274)."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from opentelemetry_collector_spark.functions.otlptext import typed_attr_lines

    expr = typed_attr_lines(
        [
            ("retries", F.lit(42), T.IntegerType()),
            ("pi", F.lit(3.14), T.DoubleType()),
            ("enabled", F.lit(True), T.BooleanType()),
            (
                "tags",
                F.create_map(F.lit("k1"), F.lit("val1"), F.lit("k2"), F.lit("val2")),
                T.MapType(T.StringType(), T.StringType()),
            ),
        ]
    )
    got = spark.range(1).select(expr.alias("r")).first()["r"]
    assert got == TYPED_ATTRS_GOLDEN


# ---------------------------------------------------------------------------
# byte-parity golden corpus vs the reference's own testdata/logs/*.out
# ---------------------------------------------------------------------------

import os

import pytest
from pyspark.sql import types as T

_REF_LOGS_GOLDEN = (
    "/root/reference/exporter/loggingexporter/internal/otlptext/testdata/logs"
)

_GOLDEN_SCHEMA = T.StructType(
    [
        T.StructField("rl_idx", T.IntegerType()),
        T.StructField("scope_idx", T.IntegerType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("resource_schema_url", T.StringType()),
        T.StructField(
            "resource_attrs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("vtype", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("scope_name", T.StringType()),
        T.StructField("scope_version", T.StringType()),
        T.StructField("scope_schema_url", T.StringType()),
        T.StructField("time_unix_nano", T.LongType()),
        T.StructField("observed_unix_nano", T.LongType()),
        T.StructField("severity_number", T.IntegerType()),
        T.StructField("severity_text", T.StringType()),
        T.StructField("body_vtype", T.StringType()),
        T.StructField("body_value", T.StringType()),
        T.StructField(
            "attributes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("vtype", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("flags", T.IntegerType()),
    ]
)

# internal/testdata/log.go logTimestamp: 2020-02-11T20:26:13.000000789Z
_LOG_TS_NS = 1581452773 * 10**9 + 789

# fillLogOne / fillLogTwo (internal/testdata/log.go:44-71) as fixture rows
_REC_ONE = (
    0, 0, 0, "", [("resource-attr", "Str", "resource-attr-val-1")],
    "", "", "", _LOG_TS_NS, 0, 9, "Info", "Str", "This is a log message",
    [("app", "Str", "server"), ("instance_num", "Int", "1")],
    "08040201000000000000000000000000", "0102040800000000", 0,
)
_REC_TWO = (
    0, 0, 1, "", [("resource-attr", "Str", "resource-attr-val-1")],
    "", "", "", _LOG_TS_NS, 0, 9, "Info", "Str", "something happened",
    [("customer", "Str", "acme"), ("env", "Str", "dev")],
    "", "", 0,
)
# logs_test.go "logs_with_embedded_maps" (empty resource, Map body/attr)
_REC_MAPS = (
    0, 0, 0, "", [],
    "", "", "", _LOG_TS_NS, 0, 9, "INFO",
    "Map", '{"key1":"val1","key2":{"key21":"val21","key22":"val22"}}',
    [
        ("key1", "Map", '{"key11":"val11","key12":"val12","key13":{"key131":"val131"}}'),
        ("key2", "Str", "val2"),
    ],
    "", "", 0,
)


@pytest.mark.skipif(
    not os.path.isdir(_REF_LOGS_GOLDEN), reason="reference golden corpus absent"
)
@pytest.mark.parametrize(
    ("out_file", "rows"),
    [
        ("empty.out", []),
        ("one_record.out", [_REC_ONE]),
        ("two_records.out", [_REC_ONE, _REC_TWO]),
        ("embedded_maps.out", [_REC_MAPS]),
    ],
)
def test_golden_logs_text_matches_reference_bytes(spark, out_file, rows):
    """golden_logs_text reproduces the reference's own golden files
    byte-identically (logs_test.go TestLogsText over
    internal/testdata.GenerateLogs fixtures)."""
    from opentelemetry_collector_spark.functions.otlptext import golden_logs_text

    frame = spark.createDataFrame(rows, _GOLDEN_SCHEMA)
    got = golden_logs_text(frame)
    with open(os.path.join(_REF_LOGS_GOLDEN, out_file), "rb") as f:
        want = f.read().decode("utf-8")
    assert got == want, f"{out_file}: byte mismatch"


def test_foreign_point_without_sum_still_renders(spark):
    """A point unmarshaled from a foreign payload that omits sum/bounds
    (valid OTLP: HasSum=false) must render a block WITHOUT the Sum line —
    not silently vanish from the debug sink via a NULL-poisoned concat."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from opentelemetry_collector_spark.functions.otlptext import (
        render_histogram_data_point,
    )

    schema = T.StructType(
        [
            T.StructField("attr_key", T.StringType()),
            T.StructField("hist_count", T.LongType()),
            T.StructField("hist_sum", T.DoubleType()),
            T.StructField("hist_min", T.DoubleType()),
            T.StructField("hist_max", T.DoubleType()),
            T.StructField("hist_explicit_bounds", T.ArrayType(T.DoubleType())),
            T.StructField("hist_bucket_counts", T.ArrayType(T.LongType())),
        ]
    )
    df = spark.createDataFrame(
        [("k", 7, None, None, None, None, None)], schema
    )
    got = df.select(render_histogram_data_point().alias("r")).first()["r"]
    assert got is not None and "Count: 7" in got
    assert "Sum:" not in got and "ExplicitBounds" not in got
