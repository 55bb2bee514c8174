"""ptrace data model + the real spanmetrics connector (SURVEY.md §1.1, T5).

The reference's Span carries trace/span/parent ids, a 6-valued Kind enum
(pdata/ptrace/span_kind.go:26-41: 0 Unspecified, 1 Internal, 2 Server,
3 Client, 4 Producer, 5 Consumer), start/end Timestamps, attributes,
Events[], Links[], and Status{code,message} with the 3-valued StatusCode
(pdata/ptrace/status_code.go:26-28: 0 Unset, 1 Ok, 2 Error) —
pdata/ptrace/generated_span.go:53-184. Spark mapping: a flat DataFrame
with ArrayType(StructType) events/links columns.

``events_to_spans`` synthesizes a deterministic span frame from the event
stream (each user's events in time order form one trace; parent = the
previous span in the trace), entirely in built-in expressions so the
DuckDB oracle reproduces it bit-for-bit. ``spanmetrics`` then implements
the real connector semantics (connector/connector.go:324-391, the
traces→metrics cell of the connector matrix): per
(service, kind, status_code) call counts + duration min/max/sum/avg — the
upgrade of the r1 events-based stand-in to actual span durations.

Scale: span synthesis is one window shuffle on (user) for the parent
chain; spanmetrics is one hash aggregate keyed by the tiny
(service, kind, status) space — map-side partials collapse it to
#distinct-keys rows per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# pdata/ptrace/span_kind.go:26-41
SPAN_KIND = {
    "Unspecified": 0,
    "Internal": 1,
    "Server": 2,
    "Client": 3,
    "Producer": 4,
    "Consumer": 5,
}

# pdata/ptrace/status_code.go:26-28
STATUS_CODE = {"Unset": 0, "Ok": 1, "Error": 2}

# event_type → span kind (server-rendered views/clicks, outbound purchase
# calls, internal error spans) — fixture semantics, not reference ones
EVENT_KIND = {
    "view": SPAN_KIND["Server"],
    "click": SPAN_KIND["Server"],
    "signup": SPAN_KIND["Server"],
    "purchase": SPAN_KIND["Client"],
    "error": SPAN_KIND["Internal"],
}

SPAN_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("time_unix_nano", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

# Span.Links(): each link carries target trace/span ids, a W3C trace state
# and attributes (pdata/ptrace/generated_span.go:163-170 + SpanLink proto)
SPAN_LINK_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_id", T.StringType(), False),
        T.StructField("trace_state", T.StringType(), False),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),  # 32-char hex
        T.StructField("span_id", T.StringType(), False),  # 16-char hex
        T.StructField("parent_span_id", T.StringType(), False),  # "" = root
        # W3C tracestate string (generated_span.go:78-80,
        # pdata/pcommon/trace_state.go:28-55)
        T.StructField("trace_state", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("start_time_unix_nano", T.LongType(), False),
        T.StructField("end_time_unix_nano", T.LongType(), False),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("status_message", T.StringType(), False),
        T.StructField("events", T.ArrayType(SPAN_EVENT_SCHEMA), False),
        T.StructField("links", T.ArrayType(SPAN_LINK_SCHEMA), False),
        T.StructField("resource", T.StructType([T.StructField("service", T.StringType(), False)]), False),
    ]
)


def events_to_spans(events: DataFrame) -> DataFrame:
    """events → SPANS_SCHEMA frame (deterministic, oracle-reproducible).

    - trace_id = md5('trace:'+user_id): one trace per user;
    - span_id = first 16 hex chars of md5('span:'+event_id);
    - parent_span_id = previous span of the same trace in (ts, event_id)
      order, '' for the trace root (one lag window per user);
    - duration = value ms → end = start + value·10⁶ ns;
    - kind/status from event_type (error → Internal/Error + an
      'exception' span event, everything else → Ok);
    - trace_state = 'ot=svc-' + (user_id mod 4) — a deterministic W3C
      tracestate entry (trace_state.go:28-55 carries the raw string);
    - links: every NON-ROOT error span links back to its trace's root
      span (first span of the user in time order) with a
      link.type=trace_root attribute — the error→origin breadcrumb
      (generated_span.go:163-170);
    - resource.service = 'svc-' + (user_id mod 4).
    """
    start_ns = (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
    dur_ns = F.round(F.col("value") * F.lit(1_000_000)).cast("long")
    span_id = F.substring(F.md5(F.concat(F.lit("span:"), F.col("event_id"))), 1, 16)
    kind = F.coalesce(
        *[F.when(F.col("event_type") == t, F.lit(k)) for t, k in EVENT_KIND.items()],
        F.lit(SPAN_KIND["Unspecified"]),
    ).cast("int")
    is_err = F.col("event_type") == "error"
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    exc_event = F.struct(
        start_ns.alias("time_unix_nano"),
        F.lit("exception").alias("name"),
        F.create_map(F.lit("exception.type"), F.lit("PipelineError")).alias("attributes"),
    )
    trace_id = F.md5(F.concat(F.lit("trace:"), F.col("user_id")))
    trace_state = F.concat(
        F.lit("ot=svc-"), (F.col("user_id") % F.lit(4)).cast("string")
    )
    root_span_id = F.first(span_id).over(w)
    root_link = F.struct(
        trace_id.alias("trace_id"),
        root_span_id.alias("span_id"),
        trace_state.alias("trace_state"),
        F.create_map(F.lit("link.type"), F.lit("trace_root")).alias("attributes"),
    )
    return events.select(
        trace_id.alias("trace_id"),
        span_id.alias("span_id"),
        F.coalesce(F.lag(span_id).over(w), F.lit("")).alias("parent_span_id"),
        trace_state.alias("trace_state"),
        F.col("event_type").alias("name"),
        kind.alias("kind"),
        start_ns.alias("start_time_unix_nano"),
        (start_ns + dur_ns).alias("end_time_unix_nano"),
        F.create_map(
            F.lit("event_id"), F.col("event_id").cast("string"),
            F.lit("k"), F.get_json_object(F.col("props"), "$.k"),
        ).alias("attributes"),
        F.when(is_err, F.lit(STATUS_CODE["Error"]))
        .otherwise(F.lit(STATUS_CODE["Ok"]))
        .cast("int")
        .alias("status_code"),
        F.when(is_err, F.lit("event processing failed")).otherwise(F.lit("")).alias(
            "status_message"
        ),
        F.when(is_err, F.array(exc_event))
        .otherwise(F.array().cast(T.ArrayType(SPAN_EVENT_SCHEMA)))
        .alias("events"),
        F.when(is_err & (root_span_id != span_id), F.array(root_link))
        .otherwise(F.array().cast(T.ArrayType(SPAN_LINK_SCHEMA)))
        .alias("links"),
        F.struct(
            F.concat(F.lit("svc-"), (F.col("user_id") % F.lit(4)).cast("string")).alias(
                "service"
            )
        ).alias("resource"),
    )


def span_duration_ms(spans: DataFrame) -> DataFrame:
    """Append duration_ms (double) from the nano interval."""
    return spans.withColumn(
        "duration_ms",
        (F.col("end_time_unix_nano") - F.col("start_time_unix_nano"))
        / F.lit(1_000_000.0),
    )


def span_events_to_logs(spans: DataFrame) -> DataFrame:
    """Connector matrix traces→logs cell (connector/connector.go:324-391):
    every span Event becomes a log record carrying its span's identity —
    the exception-to-error-log bridge. Narrow explode; spans without
    events contribute nothing."""
    ev = spans.select(
        "trace_id",
        "span_id",
        F.col("resource.service").alias("service"),
        F.col("status_code"),
        F.explode("events").alias("ev"),
    )
    return ev.select(
        "trace_id",
        "span_id",
        "service",
        F.col("ev.time_unix_nano").alias("time_unix_nano"),
        F.col("ev.name").alias("body"),
        # span events surfacing on Error spans log at ERROR (17)
        F.when(F.col("status_code") == STATUS_CODE["Error"], F.lit(17))
        .otherwise(F.lit(9))
        .cast("int")
        .alias("severity_number"),
        F.element_at(F.col("ev.attributes"), "exception.type").alias("exception_type"),
    )


def spanmetrics(spans: DataFrame) -> DataFrame:
    """The real spanmetrics connector (traces→metrics,
    connector/connector.go:324-391): per (service, kind, status_code)
    call count + duration min/max/sum/avg in ms (4-dp rounded).

    One hash aggregate over a tiny key space — the canonical
    RED-metrics-from-spans rollup.
    """
    d = span_duration_ms(spans)
    return (
        d.groupBy(
            F.col("resource.service").alias("service"),
            F.col("kind"),
            F.col("status_code"),
        )
        .agg(
            F.count("*").alias("calls"),
            F.round(F.min("duration_ms"), 4).alias("min_ms"),
            F.round(F.max("duration_ms"), 4).alias("max_ms"),
            F.round(F.sum("duration_ms"), 4).alias("sum_ms"),
            F.round(F.avg("duration_ms"), 4).alias("avg_ms"),
        )
    )


def logs_to_session_spans(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    error_type: str = "error",
) -> DataFrame:
    """Connector matrix logs→traces cell (connector/connector.go:324-391):
    each user session (gap-bounded, the reference's groupbytrace shape)
    becomes ONE synthetic SERVER span on the ptrace frame — trace/span ids
    derived deterministically from (user, session_start) via md5 so an
    independent engine replays them byte-identically; Status is Error
    when the session saw an error record, else Ok
    (pdata/ptrace/status_code.go:26-28).

    Scale: one ``session_window`` aggregate — the identical shuffle the
    sessionize rollup already pays; ids/status are scan-speed expressions
    over the aggregated (tiny) frame.
    """
    agg = (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("_t0"),
            F.max(ts_col).alias("_t1"),
            F.max((F.col("event_type") == error_type).cast("int")).alias("_err"),
        )
    )
    start_s = F.unix_timestamp(F.col("w.start"))
    tid_src = F.concat(
        F.col(user_col).cast("string"), F.lit(":"), start_s.cast("string")
    )
    return agg.select(
        F.col(user_col),
        start_s.alias("session_start"),
        F.md5(tid_src).alias("trace_id"),
        F.substring(F.md5(F.concat(F.lit("s:"), tid_src)), 1, 16).alias("span_id"),
        F.lit("session").alias("name"),
        F.lit(SPAN_KIND["Server"]).cast("int").alias("kind"),
        (F.unix_micros(F.col("_t0").cast("timestamp")) * 1000).alias(
            "start_time_unix_nano"
        ),
        (F.unix_micros(F.col("_t1").cast("timestamp")) * 1000).alias(
            "end_time_unix_nano"
        ),
        F.when(F.col("_err") == 1, F.lit(STATUS_CODE["Error"]))
        .otherwise(F.lit(STATUS_CODE["Ok"]))
        .cast("int")
        .alias("status_code"),
        F.col("n_events"),
    )


def metrics_to_anomaly_spans(
    points: DataFrame,
    warn_factor: float = 1.5,
    error_factor: float = 3.0,
    value_col: str = "value_double",
    key_col: str = "attr_key",
) -> DataFrame:
    """Connector matrix metrics→traces cell (connector/connector.go:324-391),
    closing the 9-cell matrix: metric data points crossing a data-derived
    threshold become synthetic INTERNAL spans covering their window —
    the span twin of :func:`metrics.metrics_to_alert_logs` (same 1-row
    mean broadcast, same rounded tier cuts), with deterministic md5 ids
    from (series key, window start) and Status Error above the
    ``error_factor`` cut, Ok between the cuts.

    Scale: ONE 1-row global aggregate broadcast back as a constant join;
    the points frame never shuffles and the predicate + id derivation are
    scan-speed under it.
    """
    from .metrics import threshold_filtered_points

    filtered, _warn_thr, is_err = threshold_filtered_points(
        points, warn_factor, error_factor, value_col
    )
    v = F.col(value_col)
    # integral div, not `/`: double division misrounds nanos > 2^53 that
    # are not whole-second aligned (1699999999999999999/1e9 rounds UP to
    # 1700000000), shifting the md5 id seed to the wrong window
    ws = F.expr("start_time_unix_nano div 1000000000")
    tid_src = F.concat(F.col(key_col), F.lit("@"), ws.cast("string"))
    return (
        filtered
        .select(
            F.col(key_col),
            ws.alias("window_start"),
            F.md5(tid_src).alias("trace_id"),
            F.substring(
                F.md5(F.concat(F.lit("s:"), tid_src)), 1, 16
            ).alias("span_id"),
            F.lit("anomaly").alias("name"),
            F.lit(SPAN_KIND["Internal"]).cast("int").alias("kind"),
            F.col("start_time_unix_nano"),
            F.col("time_unix_nano").alias("end_time_unix_nano"),
            F.when(is_err, F.lit(STATUS_CODE["Error"]))
            .otherwise(F.lit(STATUS_CODE["Ok"]))
            .cast("int")
            .alias("status_code"),
            F.col("point_count").alias("n_events"),
            v.alias("value_double"),
        )
    )
