"""OTLP/JSON Logs marshal/unmarshal — the pdata/plog/json.go analog (D8).

The reference round-trips Logs through the protobuf-JSON form of
ExportLogsServiceRequest (pdata/plog/json.go:31-42, via pdata/internal/
json): the nested Resource → Scope → LogRecord hierarchy with proto3 JSON
conventions (camelCase fields, uint64 timestamps rendered as decimal
strings, attributes as [{key, value:{stringValue}}] pairs).

Here the wire form is built and parsed entirely with ``to_json`` /
``from_json`` over a fixed nested StructType — JVM-side, no Python in the
loop. The flat LOG_RECORDS_SCHEMA ↔ nested OTLP mapping is a bijection:

- ``resource.host`` / ``resource.lang`` → resource.attributes pairs;
- the record's attributes map → the OTLP attributes array; the flat
  model's ``url`` and ``line_no`` columns ride along as reserved
  ``log.url`` / ``log.line_no`` attributes (OTLP has no such fields) and
  are popped back out on unmarshal — callers must not use those keys;
- ``observed_ts`` (µs timestamp) ↔ ``observedTimeUnixNano`` string.

Scale: marshal is one groupBy(resource) shuffle (collect_list of record
structs per resource — the OTLP batch envelope is inherently grouped);
unmarshal is a narrow from_json + three explodes. Both stay in codegen.

Unmarshal numeric fields use ``try_cast``, never ``cast``: the session
runs with ANSI on, and a foreign payload carrying a uint64 above int64
max (valid proto3 JSON) or a malformed digit string must null-fill the
field per proto3 defaults, not abort the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import LOG_RECORDS_SCHEMA, RESOURCE_SCHEMA
from .values import ns_to_micros

# proto3 JSON form of common.v1.KeyValue with a string value
_KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField(
            "value",
            T.StructType([T.StructField("stringValue", T.StringType(), True)]),
            False,
        ),
    ]
)

_LOG_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType(), True),  # uint64 → string
        T.StructField("observedTimeUnixNano", T.StringType(), True),
        T.StructField("severityNumber", T.IntegerType(), True),
        T.StructField("severityText", T.StringType(), True),
        T.StructField(
            "body",
            T.StructType([T.StructField("stringValue", T.StringType(), True)]),
            True,
        ),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
        T.StructField("droppedAttributesCount", T.IntegerType(), True),
        T.StructField("flags", T.IntegerType(), True),
        T.StructField("traceId", T.StringType(), True),
        T.StructField("spanId", T.StringType(), True),
    ]
)

# ExportLogsServiceRequest / LogsData (plog/json.go:40-42)
OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True)]
                            ),
                            True,
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType(), True),
                                                    T.StructField("version", T.StringType(), True),
                                                ]
                                            ),
                                            True,
                                        ),
                                        T.StructField(
                                            "logRecords",
                                            T.ArrayType(_LOG_RECORD_SCHEMA),
                                            True,
                                        ),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        )
    ]
)

SCOPE_NAME = "opentelemetry_collector_spark"
SCOPE_VERSION = "0.1"

# reserved attribute keys carrying the flat model's non-OTLP columns
URL_ATTR = "log.url"
LINE_NO_ATTR = "log.line_no"


def _kv(key: Column | str, value: Column) -> Column:
    k = F.lit(key) if isinstance(key, str) else key
    return F.struct(
        k.alias("key"), F.struct(value.alias("stringValue")).alias("value")
    )


def _attrs_to_kv_array(attrs: Column) -> Column:
    return F.transform(
        F.map_entries(attrs), lambda e: _kv(e.getField("key"), e.getField("value"))
    )


def _kv_array_to_map(arr: Column) -> Column:
    return F.map_from_entries(
        F.transform(
            arr,
            lambda e: F.struct(
                e.getField("key").alias("key"),
                e.getField("value").getField("stringValue").alias("value"),
            ),
        )
    )


def _chunk_envelopes(grouped: DataFrame, list_col: str, cap: int | None) -> DataFrame:
    """Split each collected record list into ≤``cap``-element envelopes —
    the send_batch_max_size semantics (processor/batchprocessor/
    splitlogs.go:22-76: oversized requests are SPLIT by record count, not
    bounded by a fixed bucket count).

    Post-aggregation slice+explode: no extra shuffle — the groupBy's single
    exchange stays the only one, and the per-envelope JSON string is now
    record-bounded instead of growing linearly with per-resource volume.
    ``explode_outer`` + post-filter instead of ``explode`` keeps the slice
    expression out of InferFiltersFromGenerate's duplicated pre-filter.
    """
    if not cap:
        return grouped
    # beta gate (on by default): operators may fall back to unbounded
    # per-resource envelopes via feature_gates: ["-exporter.record_count_envelopes"]
    from ..plans.featuregate import BOUNDED_ENVELOPES_GATE

    if not BOUNDED_ENVELOPES_GATE.is_enabled():
        return grouped
    cap = int(cap)
    lst = F.col(list_col)
    n_chunks = F.greatest(
        F.ceil(F.size(lst) / F.lit(cap)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.slice(lst, (i - F.lit(1)) * F.lit(cap) + F.lit(1), cap),
    )
    return (
        grouped.withColumn("__chunk", F.explode_outer(chunks))
        .where(F.col("__chunk").isNotNull())
        .drop(list_col)
        .withColumnRenamed("__chunk", list_col)
    )


def logs_to_otlp_json(
    records: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
) -> DataFrame:
    """LOG_RECORDS_SCHEMA frame → OTLP/JSON request strings per resource:
    ``(resource, request_json)`` rows (MarshalLogs analog,
    plog/json.go:31-37).

    Two independent scale controls (the flattened round-trip result is
    identical either way):

    - ``salt_buckets`` bounds per-TASK volume: salting by a record-hash
      spreads a hot resource across ``salt_buckets`` reducers, so marshal
      parallelism is (#resources × buckets) instead of #resources and no
      single task collects an unbounded list.
    - ``max_records_per_envelope`` bounds per-ENVELOPE record count — the
      send_batch_max_size analog (processor/batchprocessor/
      splitlogs.go:22-76 + config.go:25-46): each collected list is split
      into ≤cap-record requests post-aggregation, so JSON string size is
      record-bounded instead of linear in per-resource volume (VERDICT r2
      "What's wrong #2"). No extra shuffle.
    """
    rec_struct = F.struct(
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        (F.unix_micros(F.col("observed_ts").cast("timestamp")) * F.lit(1000))
        .cast("string")
        .alias("observedTimeUnixNano"),
        F.col("severity_number").alias("severityNumber"),
        F.col("severity_text").alias("severityText"),
        F.struct(F.col("body").alias("stringValue")).alias("body"),
        F.concat(
            _attrs_to_kv_array(F.col("attributes")),
            F.array(
                _kv(URL_ATTR, F.col("url")),
                _kv(LINE_NO_ATTR, F.col("line_no").cast("string")),
            ),
        ).alias("attributes"),
        F.col("dropped_attributes_count").alias("droppedAttributesCount"),
        F.col("flags").alias("flags"),
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
    )
    if salt_buckets:
        salt = F.pmod(
            F.xxhash64(F.col("url"), F.col("line_no")), F.lit(int(salt_buckets))
        )
        grouped = (
            records.groupBy(F.col("resource"), salt.alias("__salt"))
            .agg(F.collect_list(rec_struct).alias("__records"))
            .drop("__salt")
        )
    else:
        grouped = records.groupBy("resource").agg(
            F.collect_list(rec_struct).alias("__records")
        )
    grouped = _chunk_envelopes(grouped, "__records", max_records_per_envelope)
    resource_attrs = F.array(
        _kv("host", F.col("resource.host")), _kv("lang", F.col("resource.lang"))
    )
    request = F.struct(
        F.array(
            F.struct(
                F.struct(resource_attrs.alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(
                            F.lit(SCOPE_NAME).alias("name"),
                            F.lit(SCOPE_VERSION).alias("version"),
                        ).alias("scope"),
                        F.col("__records").alias("logRecords"),
                    )
                ).alias("scopeLogs"),
            )
        ).alias("resourceLogs")
    )
    return grouped.select(
        F.col("resource"), F.to_json(request).alias("request_json")
    )


def otlp_json_to_logs(requests: DataFrame, json_col: str = "request_json") -> DataFrame:
    """OTLP/JSON request strings → LOG_RECORDS_SCHEMA frame
    (UnmarshalLogs analog, plog/json.go:39-42). Unknown/missing fields
    null-fill per proto3 JSON; the reserved ``log.url`` / ``log.line_no``
    attributes are popped back into their flat columns."""
    parsed = requests.select(
        F.from_json(F.col(json_col), OTLP_LOGS_SCHEMA).alias("req")
    )
    rl = parsed.select(F.explode("req.resourceLogs").alias("rl"))
    res_map = _kv_array_to_map(F.col("rl.resource.attributes"))
    sl = rl.select(
        res_map.alias("__res"), F.explode("rl.scopeLogs").alias("sl")
    )
    lr = sl.select("__res", F.explode("sl.logRecords").alias("r"))
    attrs_map = _kv_array_to_map(F.col("r.attributes"))
    own_attrs = F.map_filter(
        attrs_map, lambda k, _: ~k.isin(URL_ATTR, LINE_NO_ATTR)
    )
    return lr.select(
        F.element_at(attrs_map, URL_ATTR).alias("url"),
        F.col("r.timeUnixNano").try_cast("long").alias("time_unix_nano"),
        F.timestamp_micros(ns_to_micros(F.col("r.observedTimeUnixNano"))).alias(
            "observed_ts"
        ),
        F.col("r.severityNumber").alias("severity_number"),
        F.col("r.severityText").alias("severity_text"),
        F.col("r.body.stringValue").alias("body"),
        own_attrs.alias("attributes"),
        F.col("r.traceId").alias("trace_id"),
        F.col("r.spanId").alias("span_id"),
        F.col("r.flags").alias("flags"),
        F.col("r.droppedAttributesCount").alias("dropped_attributes_count"),
        F.struct(
            F.element_at(F.col("__res"), "host").alias("host"),
            F.element_at(F.col("__res"), "lang").alias("lang"),
        ).alias("resource"),
        F.element_at(attrs_map, LINE_NO_ATTR).try_cast("int").alias("line_no"),
    )


# ---------------------------------------------------------------------------
# Traces (ExportTraceServiceRequest — same proto3-JSON conventions)
# ---------------------------------------------------------------------------

_SPAN_EVENT_JSON = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
    ]
)

# Span.Link proto3-JSON shape (generated_span.go:163-170)
_SPAN_LINK_JSON = T.StructType(
    [
        T.StructField("traceId", T.StringType(), True),
        T.StructField("spanId", T.StringType(), True),
        T.StructField("traceState", T.StringType(), True),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
    ]
)

_SPAN_JSON = T.StructType(
    [
        T.StructField("traceId", T.StringType(), True),
        T.StructField("spanId", T.StringType(), True),
        T.StructField("parentSpanId", T.StringType(), True),
        T.StructField("traceState", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("kind", T.IntegerType(), True),
        T.StructField("startTimeUnixNano", T.StringType(), True),
        T.StructField("endTimeUnixNano", T.StringType(), True),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
        T.StructField(
            "status",
            T.StructType(
                [
                    T.StructField("code", T.IntegerType(), True),
                    T.StructField("message", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("events", T.ArrayType(_SPAN_EVENT_JSON), True),
        T.StructField("links", T.ArrayType(_SPAN_LINK_JSON), True),
    ]
)

OTLP_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True)]
                            ),
                            True,
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType(), True),
                                                    T.StructField("version", T.StringType(), True),
                                                ]
                                            ),
                                            True,
                                        ),
                                        T.StructField("spans", T.ArrayType(_SPAN_JSON), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        )
    ]
)


def spans_to_otlp_json(
    spans: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
) -> DataFrame:
    """SPANS_SCHEMA frame → OTLP/JSON trace-export request strings per
    resource (ptrace JSONMarshaler analog — same envelope conventions as
    the logs codec; `resourceSpans → scopeSpans → spans`; same two scale
    controls: salt for task parallelism, cap for envelope record count)."""
    ev_struct = F.transform(
        F.col("events"),
        lambda e: F.struct(
            e.getField("time_unix_nano").cast("string").alias("timeUnixNano"),
            e.getField("name").alias("name"),
            F.transform(
                F.map_entries(e.getField("attributes")),
                lambda kv: _kv(kv.getField("key"), kv.getField("value")),
            ).alias("attributes"),
        ),
    )
    link_struct = F.transform(
        F.col("links"),
        lambda l: F.struct(
            l.getField("trace_id").alias("traceId"),
            l.getField("span_id").alias("spanId"),
            l.getField("trace_state").alias("traceState"),
            F.transform(
                F.map_entries(l.getField("attributes")),
                lambda kv: _kv(kv.getField("key"), kv.getField("value")),
            ).alias("attributes"),
        ),
    )
    span_struct = F.struct(
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.col("parent_span_id").alias("parentSpanId"),
        F.col("trace_state").alias("traceState"),
        F.col("name").alias("name"),
        F.col("kind").alias("kind"),
        F.col("start_time_unix_nano").cast("string").alias("startTimeUnixNano"),
        F.col("end_time_unix_nano").cast("string").alias("endTimeUnixNano"),
        _attrs_to_kv_array(F.col("attributes")).alias("attributes"),
        F.struct(
            F.col("status_code").alias("code"), F.col("status_message").alias("message")
        ).alias("status"),
        ev_struct.alias("events"),
        link_struct.alias("links"),
    )
    if salt_buckets:
        salt = F.pmod(F.xxhash64(F.col("span_id")), F.lit(int(salt_buckets)))
        grouped = (
            spans.groupBy(F.col("resource"), salt.alias("__salt"))
            .agg(F.collect_list(span_struct).alias("__spans"))
            .drop("__salt")
        )
    else:
        grouped = spans.groupBy("resource").agg(
            F.collect_list(span_struct).alias("__spans")
        )
    grouped = _chunk_envelopes(grouped, "__spans", max_records_per_envelope)
    resource_attrs = F.array(_kv("service", F.col("resource.service")))
    request = F.struct(
        F.array(
            F.struct(
                F.struct(resource_attrs.alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(
                            F.lit(SCOPE_NAME).alias("name"),
                            F.lit(SCOPE_VERSION).alias("version"),
                        ).alias("scope"),
                        F.col("__spans").alias("spans"),
                    )
                ).alias("scopeSpans"),
            )
        ).alias("resourceSpans")
    )
    return grouped.select(F.col("resource"), F.to_json(request).alias("request_json"))


def otlp_json_to_spans(requests: DataFrame, json_col: str = "request_json") -> DataFrame:
    """OTLP/JSON trace requests → SPANS_SCHEMA frame."""
    parsed = requests.select(F.from_json(F.col(json_col), OTLP_TRACES_SCHEMA).alias("req"))
    rs = parsed.select(F.explode("req.resourceSpans").alias("rs"))
    res_map = _kv_array_to_map(F.col("rs.resource.attributes"))
    ss = rs.select(res_map.alias("__res"), F.explode("rs.scopeSpans").alias("ss"))
    sp = ss.select("__res", F.explode("ss.spans").alias("s"))
    events = F.transform(
        F.col("s.events"),
        lambda e: F.struct(
            e.getField("timeUnixNano").try_cast("long").alias("time_unix_nano"),
            e.getField("name").alias("name"),
            F.map_from_entries(
                F.transform(
                    e.getField("attributes"),
                    lambda kv: F.struct(
                        kv.getField("key").alias("key"),
                        kv.getField("value").getField("stringValue").alias("value"),
                    ),
                )
            ).alias("attributes"),
        ),
    )
    links = F.transform(
        F.col("s.links"),
        lambda l: F.struct(
            l.getField("traceId").alias("trace_id"),
            l.getField("spanId").alias("span_id"),
            l.getField("traceState").alias("trace_state"),
            F.map_from_entries(
                F.transform(
                    l.getField("attributes"),
                    lambda kv: F.struct(
                        kv.getField("key").alias("key"),
                        kv.getField("value").getField("stringValue").alias("value"),
                    ),
                )
            ).alias("attributes"),
        ),
    )
    return sp.select(
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.col("s.parentSpanId").alias("parent_span_id"),
        F.coalesce(F.col("s.traceState"), F.lit("")).alias("trace_state"),
        F.col("s.name").alias("name"),
        F.col("s.kind").alias("kind"),
        F.col("s.startTimeUnixNano").try_cast("long").alias("start_time_unix_nano"),
        F.col("s.endTimeUnixNano").try_cast("long").alias("end_time_unix_nano"),
        _kv_array_to_map(F.col("s.attributes")).alias("attributes"),
        F.col("s.status.code").alias("status_code"),
        F.col("s.status.message").alias("status_message"),
        F.coalesce(
            events,
            F.array().cast(
                "array<struct<time_unix_nano:bigint,name:string,attributes:map<string,string>>>"
            ),
        ).alias("events"),
        F.coalesce(
            links,
            F.array().cast(
                "array<struct<trace_id:string,span_id:string,trace_state:string,"
                "attributes:map<string,string>>>"
            ),
        ).alias("links"),
        F.struct(F.element_at(F.col("__res"), "service").alias("service")).alias("resource"),
    )


# ---------------------------------------------------------------------------
# Metrics (ExportMetricsServiceRequest — the FULL 5-type union
# Gauge | Sum | Histogram | ExponentialHistogram | Summary, matching
# pdata/pmetric/json.go:31-47 via pmetricjson and the point accessors
# generated_metric.go:109-222; proto3-JSON conventions: camelCase fields,
# uint64 counts/times as decimal strings, bucketCounts as string arrays)
# ---------------------------------------------------------------------------

# Exemplar proto3-JSON shape (pmetricjson "exemplars" /
# "filtered_attributes" cases; generated_metric.go Exemplar accessors)
_EXEMPLAR_JSON = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType(), True),
        T.StructField("asDouble", T.DoubleType(), True),
        T.StructField("spanId", T.StringType(), True),
        T.StructField("traceId", T.StringType(), True),
        T.StructField("filteredAttributes", T.ArrayType(_KV_SCHEMA), True),
    ]
)

_NUM_DP_JSON = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType(), True),
        T.StructField("timeUnixNano", T.StringType(), True),
        T.StructField("asDouble", T.DoubleType(), True),
        T.StructField("asInt", T.StringType(), True),  # int64 → string
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
        T.StructField("exemplars", T.ArrayType(_EXEMPLAR_JSON), True),
    ]
)

_HIST_DP_JSON = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType(), True),
        T.StructField("timeUnixNano", T.StringType(), True),
        T.StructField("count", T.StringType(), True),  # uint64 → string
        T.StructField("sum", T.DoubleType(), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("bucketCounts", T.ArrayType(T.StringType()), True),
        T.StructField("explicitBounds", T.ArrayType(T.DoubleType()), True),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
    ]
)

_EXP_BUCKETS_JSON = T.StructType(
    [
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("bucketCounts", T.ArrayType(T.StringType()), True),
    ]
)

_EXP_DP_JSON = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType(), True),
        T.StructField("timeUnixNano", T.StringType(), True),
        T.StructField("count", T.StringType(), True),
        T.StructField("sum", T.DoubleType(), True),
        T.StructField("scale", T.IntegerType(), True),
        T.StructField("zeroCount", T.StringType(), True),
        T.StructField("positive", _EXP_BUCKETS_JSON, True),
        T.StructField("negative", _EXP_BUCKETS_JSON, True),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
    ]
)

_SUMMARY_DP_JSON = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType(), True),
        T.StructField("timeUnixNano", T.StringType(), True),
        T.StructField("count", T.StringType(), True),
        T.StructField("sum", T.DoubleType(), True),
        T.StructField(
            "quantileValues",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("quantile", T.DoubleType(), True),
                        T.StructField("value", T.DoubleType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True),
    ]
)

# the Metric tagged union (pdata/pmetric/metric_type.go:21-27): exactly one
# of the five point-type fields is present per metric
_METRIC_JSON = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField(
            "gauge",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_NUM_DP_JSON), True)]),
            True,
        ),
        T.StructField(
            "sum",
            T.StructType(
                [
                    T.StructField("aggregationTemporality", T.IntegerType(), True),
                    T.StructField("isMonotonic", T.BooleanType(), True),
                    T.StructField("dataPoints", T.ArrayType(_NUM_DP_JSON), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "histogram",
            T.StructType(
                [
                    T.StructField("aggregationTemporality", T.IntegerType(), True),
                    T.StructField("dataPoints", T.ArrayType(_HIST_DP_JSON), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "exponentialHistogram",
            T.StructType(
                [
                    T.StructField("aggregationTemporality", T.IntegerType(), True),
                    T.StructField("dataPoints", T.ArrayType(_EXP_DP_JSON), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "summary",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_SUMMARY_DP_JSON), True)]),
            True,
        ),
    ]
)

OTLP_METRICS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", T.ArrayType(_KV_SCHEMA), True)]
                            ),
                            True,
                        ),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType(), True),
                                                    T.StructField("version", T.StringType(), True),
                                                ]
                                            ),
                                            True,
                                        ),
                                        T.StructField(
                                            "metrics",
                                            T.ArrayType(_METRIC_JSON),
                                            True,
                                        ),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        )
    ]
)


def _dp_attrs(attr_name: str) -> Column:
    """Data-point attributes array from the frame's ``attr_key`` column."""
    return F.array(_kv(attr_name, F.col("attr_key")))


def _metrics_request(grouped: DataFrame, metric_struct: Column) -> DataFrame:
    """Wrap one Metric struct per input row into the full
    ExportMetricsServiceRequest envelope and serialize (to_json omits the
    union's absent point-type fields — exactly one is set per metric)."""
    request = F.struct(
        F.array(
            F.struct(
                F.struct(F.array().cast(T.ArrayType(_KV_SCHEMA)).alias("attributes")).alias(
                    "resource"
                ),
                F.array(
                    F.struct(
                        F.struct(
                            F.lit(SCOPE_NAME).alias("name"),
                            F.lit(SCOPE_VERSION).alias("version"),
                        ).alias("scope"),
                        F.array(metric_struct).alias("metrics"),
                    )
                ).alias("scopeMetrics"),
            )
        ).alias("resourceMetrics")
    )
    return grouped.select(F.to_json(request).alias("request_json"))


def _exploded_metrics(requests: DataFrame, json_col: str = "request_json") -> DataFrame:
    """requests → one row per Metric (column ``m`` typed _METRIC_JSON)."""
    parsed = requests.select(F.from_json(F.col(json_col), OTLP_METRICS_SCHEMA).alias("req"))
    rm = parsed.select(F.explode("req.resourceMetrics").alias("rm"))
    sm = rm.select(F.explode("rm.scopeMetrics").alias("sm"))
    return sm.select(F.explode("sm.metrics").alias("m"))


def sum_points_to_otlp_json(
    points: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
    value_col: str = "value_double",
    as_int: bool = False,
    metric_name: Column | None = None,
) -> DataFrame:
    """Sum data points (metrics.events_to_sum_points shape) → OTLP/JSON
    metric-export request strings, one Sum metric per (metric_name
    [, salt]) envelope (pmetric JSONMarshaler analog; same two scale
    controls as the logs codec).

    ``as_int`` selects the NumberDataPoint value union's int member
    (``asInt``, int64 rendered as a decimal string per proto3-JSON —
    generated_metric.go NumberDataPoint Int/DoubleValue accessors);
    default is ``asDouble``. ``metric_name`` overrides the frame's
    metric_name column (e.g. the count metric of a (count, sum) pair).
    """
    if as_int:
        val = F.col(value_col).cast("long").cast("string").alias("asInt")
    else:
        val = F.col(value_col).alias("asDouble")
    if metric_name is not None:
        points = points.withColumn("metric_name", metric_name)
    dp_fields = [
        F.col("start_time_unix_nano").cast("string").alias("startTimeUnixNano"),
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        val,
        _attrs_to_kv_array(F.col("attributes")).alias("attributes"),
    ]
    if "exemplars" in points.columns:
        dp_fields.append(
            F.transform(
                F.col("exemplars"),
                lambda e: F.struct(
                    e.getField("time_unix_nano").cast("string").alias("timeUnixNano"),
                    e.getField("value_double").alias("asDouble"),
                    e.getField("span_id").alias("spanId"),
                    e.getField("trace_id").alias("traceId"),
                    F.transform(
                        F.map_entries(e.getField("filtered_attributes")),
                        lambda kv: _kv(kv.getField("key"), kv.getField("value")),
                    ).alias("filteredAttributes"),
                ),
            ).alias("exemplars")
        )
    dp = F.struct(*dp_fields)
    keys: list = [F.col("metric_name"), F.col("aggregation_temporality"), F.col("is_monotonic")]
    if salt_buckets:
        keys.append(
            F.pmod(F.xxhash64(F.col("time_unix_nano"), F.col("attr_key")), F.lit(int(salt_buckets))).alias(
                "__salt"
            )
        )
    grouped = points.groupBy(*keys).agg(F.collect_list(dp).alias("__dps"))
    grouped = _chunk_envelopes(grouped, "__dps", max_records_per_envelope)
    metric = F.struct(
        F.col("metric_name").alias("name"),
        F.struct(
            F.col("aggregation_temporality").alias("aggregationTemporality"),
            F.col("is_monotonic").alias("isMonotonic"),
            F.col("__dps").alias("dataPoints"),
        ).alias("sum"),
    )
    return _metrics_request(grouped, metric)


def otlp_json_to_sum_points(requests: DataFrame, json_col: str = "request_json") -> DataFrame:
    """OTLP/JSON metric requests → long-format Sum data-point rows."""
    m = _exploded_metrics(requests, json_col)
    dp = m.select(
        F.col("m.name").alias("metric_name"),
        F.col("m.sum.aggregationTemporality").alias("aggregation_temporality"),
        F.col("m.sum.isMonotonic").alias("is_monotonic"),
        F.explode("m.sum.dataPoints").alias("p"),
    )
    return dp.select(
        "metric_name",
        "aggregation_temporality",
        "is_monotonic",
        F.col("p.startTimeUnixNano").try_cast("long").alias("start_time_unix_nano"),
        F.col("p.timeUnixNano").try_cast("long").alias("time_unix_nano"),
        F.col("p.asDouble").alias("value_double"),
        # the value union's int member (NULL when the point is a double)
        F.col("p.asInt").try_cast("long").alias("value_int"),
        _kv_array_to_map(F.col("p.attributes")).alias("attributes"),
        F.transform(
            F.col("p.exemplars"),
            lambda e: F.struct(
                e.getField("timeUnixNano").try_cast("long").alias("time_unix_nano"),
                e.getField("asDouble").alias("value_double"),
                e.getField("traceId").alias("trace_id"),
                e.getField("spanId").alias("span_id"),
                _kv_array_to_map(e.getField("filteredAttributes")).alias(
                    "filtered_attributes"
                ),
            ),
        ).alias("exemplars"),
    )


def gauge_points_to_otlp_json(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Gauge data points (metrics.gauge_points shape: attr_key,
    window_end seconds, value_double) → OTLP/JSON requests, one Gauge
    metric per metric_name (generated_metric.go:109-121 Gauge accessor)."""
    dp = F.struct(
        (F.col("window_end") * F.lit(1_000_000_000))
        .cast("long")
        .cast("string")
        .alias("timeUnixNano"),
        F.col("value_double").alias("asDouble"),
        _dp_attrs(attr_name).alias("attributes"),
    )
    grouped = points.groupBy("metric_name").agg(F.collect_list(dp).alias("__dps"))
    metric = F.struct(
        F.col("metric_name").alias("name"),
        F.struct(F.col("__dps").alias("dataPoints")).alias("gauge"),
    )
    return _metrics_request(grouped, metric)


def otlp_json_to_gauge_points(
    requests: DataFrame, attr_name: str = "event_type", json_col: str = "request_json"
) -> DataFrame:
    """OTLP/JSON requests → gauge_points frame shape."""
    from ..operators.metrics import METRIC_TYPE

    m = _exploded_metrics(requests, json_col).where(F.col("m.gauge").isNotNull())
    dp = m.select(F.col("m.name").alias("metric_name"), F.explode("m.gauge.dataPoints").alias("p"))
    return dp.select(
        "metric_name",
        F.lit(METRIC_TYPE["Gauge"]).alias("metric_type"),
        F.element_at(_kv_array_to_map(F.col("p.attributes")), attr_name).alias("attr_key"),
        # integer division: ns epoch → whole seconds (the gauge frame's
        # window_end grain)
        F.call_function(
            "div", F.col("p.timeUnixNano").try_cast("long"), F.lit(1_000_000_000)
        ).alias("window_end"),
        F.col("p.asDouble").alias("value_double"),
    )


def histogram_points_to_otlp_json(
    hist: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Explicit-bounds Histogram points (metrics.histogram_points shape) →
    OTLP/JSON requests, one Histogram metric per (metric_name,
    temporality). Proto3-JSON: uint64 count/bucketCounts as strings
    (generated_metric.go:142-157 Histogram accessor)."""
    dp = F.struct(
        F.col("hist_count").cast("string").alias("count"),
        F.col("hist_sum").alias("sum"),
        F.col("hist_min").alias("min"),
        F.col("hist_max").alias("max"),
        F.transform(F.col("hist_bucket_counts"), lambda x: x.cast("string")).alias(
            "bucketCounts"
        ),
        F.col("hist_explicit_bounds").alias("explicitBounds"),
        _dp_attrs(attr_name).alias("attributes"),
    )
    grouped = hist.groupBy("metric_name", "aggregation_temporality").agg(
        F.collect_list(dp).alias("__dps")
    )
    metric = F.struct(
        F.col("metric_name").alias("name"),
        F.struct(
            F.col("aggregation_temporality").alias("aggregationTemporality"),
            F.col("__dps").alias("dataPoints"),
        ).alias("histogram"),
    )
    return _metrics_request(grouped, metric)


def otlp_json_to_histogram_points(
    requests: DataFrame, attr_name: str = "event_type", json_col: str = "request_json"
) -> DataFrame:
    """OTLP/JSON requests → histogram_points frame shape."""
    from ..operators.metrics import METRIC_TYPE

    m = _exploded_metrics(requests, json_col).where(F.col("m.histogram").isNotNull())
    dp = m.select(
        F.col("m.name").alias("metric_name"),
        F.col("m.histogram.aggregationTemporality").alias("aggregation_temporality"),
        F.explode("m.histogram.dataPoints").alias("p"),
    )
    return dp.select(
        "metric_name",
        F.lit(METRIC_TYPE["Histogram"]).alias("metric_type"),
        "aggregation_temporality",
        F.element_at(_kv_array_to_map(F.col("p.attributes")), attr_name).alias("attr_key"),
        F.col("p.count").try_cast("long").alias("hist_count"),
        F.col("p.sum").alias("hist_sum"),
        F.col("p.min").alias("hist_min"),
        F.col("p.max").alias("hist_max"),
        F.transform(F.col("p.bucketCounts"), lambda x: x.try_cast("long")).alias(
            "hist_bucket_counts"
        ),
        F.col("p.explicitBounds").alias("hist_explicit_bounds"),
    )


def exp_histogram_points_to_otlp_json(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Long-form ExponentialHistogram buckets (metrics.
    exp_histogram_points shape: one row per (attr_key, bucket_index) with
    NULL index = the zero bucket) → OTLP/JSON requests
    (generated_metric.go:159-174 ExponentialHistogram accessor): per key
    one data point with dense ``positive.bucketCounts`` from ``offset``,
    ``zeroCount``, and the DP-level count/sum totals. Per-bucket sums are
    not part of the OTLP shape and are not carried.

    Two bounded aggregations (per-key rollup + dense-array build) over a
    #keys×#buckets-sized frame — nothing here scales with row count. The
    zero bucket rides the SAME aggregation as conditional sums
    (collect_list skips NULL elements), so the input is scanned once —
    no second branch, no join.
    """
    idx = F.col("bucket_index")
    is_pos = idx.isNotNull()
    joined = points.groupBy(
        "metric_name", "aggregation_temporality", "scale", "attr_key"
    ).agg(
        F.min(F.when(is_pos, idx)).cast("int").alias("__offset"),
        F.max(F.when(is_pos, idx)).cast("int").alias("__maxidx"),
        F.map_from_entries(
            F.collect_list(
                F.when(is_pos, F.struct(idx.cast("int"), F.col("n")))
            )
        ).alias("__bmap"),
        F.sum(F.when(is_pos, F.col("n"))).cast("long").alias("__pos_count"),
        F.round(F.sum(F.when(is_pos, F.col("bucket_sum"))), 4).alias("__pos_sum"),
        F.sum(F.when(~is_pos, F.col("n"))).cast("long").alias("__zero_count"),
        F.round(F.sum(F.when(~is_pos, F.col("bucket_sum"))), 4).alias("__zero_sum"),
    )
    dense = F.transform(
        F.sequence(F.col("__offset"), F.col("__maxidx")),
        lambda i: F.coalesce(F.element_at(F.col("__bmap"), i), F.lit(0)).cast("string"),
    )
    positive = F.when(
        F.col("__offset").isNotNull(),
        F.struct(F.col("__offset").alias("offset"), dense.alias("bucketCounts")),
    ).otherwise(
        F.struct(
            F.lit(0).alias("offset"),
            F.array().cast("array<string>").alias("bucketCounts"),
        )
    )
    dp = F.struct(
        (F.coalesce(F.col("__pos_count"), F.lit(0)) + F.coalesce(F.col("__zero_count"), F.lit(0)))
        .cast("string")
        .alias("count"),
        F.round(
            F.coalesce(F.col("__pos_sum"), F.lit(0.0))
            + F.coalesce(F.col("__zero_sum"), F.lit(0.0)),
            4,
        ).alias("sum"),
        F.col("scale").cast("int").alias("scale"),
        F.coalesce(F.col("__zero_count"), F.lit(0)).cast("string").alias("zeroCount"),
        positive.alias("positive"),
        F.struct(
            F.lit(0).alias("offset"),
            F.array().cast("array<string>").alias("bucketCounts"),
        ).alias("negative"),
        _dp_attrs(attr_name).alias("attributes"),
    )
    grouped = joined.groupBy("metric_name", "aggregation_temporality").agg(
        F.collect_list(dp).alias("__dps")
    )
    metric = F.struct(
        F.col("metric_name").alias("name"),
        F.struct(
            F.col("aggregation_temporality").alias("aggregationTemporality"),
            F.col("__dps").alias("dataPoints"),
        ).alias("exponentialHistogram"),
    )
    return _metrics_request(grouped, metric)


def otlp_json_to_exp_histogram_points(
    requests: DataFrame, attr_name: str = "event_type", json_col: str = "request_json"
) -> DataFrame:
    """OTLP/JSON requests → long-form exp-histogram bucket rows (one per
    non-empty positive bucket + one NULL-index row per non-zero zeroCount)
    with the DP totals ``dp_count``/``dp_sum`` on every row."""
    from ..operators.metrics import METRIC_TYPE

    m = _exploded_metrics(requests, json_col).where(
        F.col("m.exponentialHistogram").isNotNull()
    )
    dp = m.select(
        F.col("m.name").alias("metric_name"),
        F.col("m.exponentialHistogram.aggregationTemporality").alias(
            "aggregation_temporality"
        ),
        F.explode("m.exponentialHistogram.dataPoints").alias("p"),
    ).select(
        "metric_name",
        "aggregation_temporality",
        # proto3 JSON omits zero-valued fields: a canonical writer drops
        # "scale":0, "offset":0, and an all-empty "positive" message
        # entirely, so absent must read as zero/empty — NOT as NULL (our
        # own marshal always writes them, so only foreign payloads hit
        # this; an un-coalesced __counts would NULL the concat'd entries
        # array and silently drop the zero-bucket row)
        F.coalesce(F.col("p.scale"), F.lit(0)).alias("scale"),
        F.element_at(_kv_array_to_map(F.col("p.attributes")), attr_name).alias("attr_key"),
        F.col("p.count").try_cast("long").alias("dp_count"),
        F.col("p.sum").alias("dp_sum"),
        F.col("p.zeroCount").try_cast("long").alias("__zero"),
        F.coalesce(F.col("p.positive.offset"), F.lit(0)).alias("__offset"),
        F.coalesce(
            F.col("p.positive.bucketCounts"), F.array().cast("array<string>")
        ).alias("__counts"),
    )
    base = [
        "metric_name",
        "aggregation_temporality",
        "scale",
        "attr_key",
        "dp_count",
        "dp_sum",
    ]
    # ONE generator per data point: the positive buckets and the optional
    # zero-bucket entry are concatenated into one array and exploded once
    # (a pos/zero union would duplicate the whole upstream marshal plan)
    entries = F.concat(
        F.transform(
            F.col("__counts"),
            lambda c, i: F.struct(
                (F.col("__offset").try_cast("long") + i).alias("bucket_index"),
                c.try_cast("long").alias("n"),
            ),
        ),
        F.when(
            F.col("__zero") > 0,
            F.array(
                F.struct(
                    F.lit(None).cast("long").alias("bucket_index"),
                    F.col("__zero").alias("n"),
                )
            ),
        ).otherwise(
            F.array().cast("array<struct<bucket_index:bigint,n:bigint>>")
        ),
    )
    rows = dp.select(*base, F.explode_outer(entries).alias("e")).where(
        F.col("e").isNotNull() & (F.col("e.n") > 0)
    )
    return rows.select(
        *base,
        F.lit(METRIC_TYPE["ExponentialHistogram"]).alias("metric_type"),
        F.col("e.bucket_index").alias("bucket_index"),
        F.col("e.n").alias("n"),
    )


def summary_points_to_otlp_json(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Long-form Summary quantiles (metrics.summary_points shape: one row
    per (attr_key, quantile)) → OTLP/JSON requests, one Summary metric per
    metric_name with sorted quantileValues per data point
    (generated_metric.go:209-222 Summary accessor)."""
    per_key = points.groupBy(
        "metric_name", "attr_key", "summary_count", "summary_sum"
    ).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("quantile"), F.col("quantile_value").alias("value"))
            )
        ).alias("__qvs")
    )
    dp = F.struct(
        F.col("summary_count").cast("string").alias("count"),
        F.col("summary_sum").alias("sum"),
        F.col("__qvs").alias("quantileValues"),
        _dp_attrs(attr_name).alias("attributes"),
    )
    grouped = per_key.groupBy("metric_name").agg(F.collect_list(dp).alias("__dps"))
    metric = F.struct(
        F.col("metric_name").alias("name"),
        F.struct(F.col("__dps").alias("dataPoints")).alias("summary"),
    )
    return _metrics_request(grouped, metric)


def otlp_json_to_summary_points(
    requests: DataFrame, attr_name: str = "event_type", json_col: str = "request_json"
) -> DataFrame:
    """OTLP/JSON requests → long-form summary_points frame shape."""
    from ..operators.metrics import METRIC_TYPE

    m = _exploded_metrics(requests, json_col).where(F.col("m.summary").isNotNull())
    dp = m.select(F.col("m.name").alias("metric_name"), F.explode("m.summary.dataPoints").alias("p"))
    qv = dp.select(
        "metric_name",
        F.lit(METRIC_TYPE["Summary"]).alias("metric_type"),
        F.element_at(_kv_array_to_map(F.col("p.attributes")), attr_name).alias("attr_key"),
        F.col("p.count").try_cast("long").alias("summary_count"),
        F.col("p.sum").alias("summary_sum"),
        F.explode("p.quantileValues").alias("q"),
    )
    return qv.select(
        "metric_name",
        "metric_type",
        "attr_key",
        "summary_count",
        "summary_sum",
        F.col("q.quantile").alias("quantile"),
        F.col("q.value").alias("quantile_value"),
    )


def roundtrip(
    records: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
) -> DataFrame:
    """marshal → unmarshal; output frame ≡ input frame (json_test.go
    round-trip equality analog) — the driver query hashes this against
    the identity projection."""
    return otlp_json_to_logs(
        logs_to_otlp_json(
            records,
            salt_buckets=salt_buckets,
            max_records_per_envelope=max_records_per_envelope,
        )
    )


# ---------------------------------------------------------------------------
# ExportLogsServiceResponse / ExportLogsPartialSuccess (the response-side
# wire contract: plogotlp/generated_exportpartialsuccess.go:24-60)
# ---------------------------------------------------------------------------

LOGS_EXPORT_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "partialSuccess",
            T.StructType(
                [
                    # int64 renders as a decimal string in proto3 JSON
                    T.StructField("rejectedLogRecords", T.StringType(), True),
                    T.StructField("errorMessage", T.StringType(), True),
                ]
            ),
            True,
        )
    ]
)


def logs_export_response_json(
    rejected: Column, error_message: Column | None = None
) -> Column:
    """Render an ExportLogsServiceResponse as proto3 JSON. Full success
    (0 rejected, no message) omits partialSuccess entirely — the
    reference keeps the field unset on success and only populates
    rejected_log_records + error_message on partial failure
    (generated_exportpartialsuccess.go:24-60)."""
    msg = error_message if error_message is not None else F.lit("")
    ps = F.struct(
        rejected.cast("long").cast("string").alias("rejectedLogRecords"),
        msg.alias("errorMessage"),
    )
    return F.when(
        (F.coalesce(rejected.cast("long"), F.lit(0)) > 0)
        | (F.coalesce(msg, F.lit("")) != ""),
        F.to_json(F.struct(ps.alias("partialSuccess"))),
    ).otherwise(F.lit("{}"))


def parse_logs_export_response(response_json: Column) -> Column:
    """proto3-JSON response → struct(rejected_log_records, error_message),
    absent partialSuccess ⇒ (0, '') per proto3 defaults. try_cast: a
    foreign uint64 above int64 max must null-fill, not abort (ANSI)."""
    parsed = F.from_json(response_json, LOGS_EXPORT_RESPONSE_SCHEMA)
    ps = parsed.getField("partialSuccess")
    return F.struct(
        F.coalesce(
            ps.getField("rejectedLogRecords").try_cast("long"), F.lit(0).cast("long")
        ).alias("rejected_log_records"),
        F.coalesce(ps.getField("errorMessage"), F.lit("")).alias("error_message"),
    )
