"""Human-readable text rendering of log records — the logging-exporter
analog (E3).

The reference's loggingexporter renders every signal into a canonical
golden text form (exporter/loggingexporter/internal/otlptext/
databuffer.go:32-272, logs.go:29) used both for debugging and for
golden-output tests (testdata/logs/*.out). This module reproduces that
pattern: a deterministic per-record block, rendered entirely with built-in
column expressions (no driver loop, no UDF), so a debug sink can write the
text form at any scale and goldens stay byte-stable.

Field order mirrors databuffer.go's log renderer: ObservedTimestamp,
Timestamp, SeverityText, SeverityNumber, Body, Attributes (sorted by key
— pcommon.Map is ordered, our map normalizes to key order), TraceID,
SpanID, Flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .values import ns_to_micros


def _attr_lines(attributes: Column) -> Column:
    """Render `     -> key: Str(value)` lines, sorted by key."""
    entries = F.sort_array(F.map_entries(attributes))
    lines = F.transform(
        entries,
        lambda e: F.concat(
            F.lit("     -> "),
            e.getField("key"),
            F.lit(": Str("),
            e.getField("value"),
            F.lit(")"),
        ),
    )
    return F.when(F.size(entries) > 0, F.concat(F.lit("Attributes:\n"), F.array_join(lines, "\n"), F.lit("\n"))).otherwise(F.lit(""))


def render_log_record(prefix_index: Column | None = None) -> Column:
    """Column expression producing the canonical text block for one record."""
    header = (
        F.concat(F.lit("LogRecord #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("LogRecord\n")
    )
    ts = F.when(
        F.col("time_unix_nano") > 0,
        F.date_format(
            F.timestamp_micros(ns_to_micros(F.col("time_unix_nano"))),
            "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'",
        ),
    ).otherwise(F.lit("1970-01-01 00:00:00 +0000 UTC"))
    return F.concat(
        header,
        F.lit("ObservedTimestamp: "),
        F.date_format(F.col("observed_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'"),
        F.lit("\n"),
        F.lit("Timestamp: "), ts, F.lit("\n"),
        F.lit("SeverityText: "), F.col("severity_text"), F.lit("\n"),
        F.lit("SeverityNumber: "), F.col("severity_number").cast("string"), F.lit("\n"),
        F.lit("Body: Str("), F.col("body"), F.lit(")\n"),
        _attr_lines(F.col("attributes")),
        F.lit("Trace ID: "), F.col("trace_id"), F.lit("\n"),
        F.lit("Span ID: "), F.col("span_id"), F.lit("\n"),
        F.lit("Flags: "), F.col("flags").cast("string"), F.lit("\n"),
    )


def render_span(prefix_index: Column | None = None) -> Column:
    """Canonical text block for one span — mirrors the trace renderer's
    field order (exporter/loggingexporter/internal/otlptext/traces.go:
    Trace ID, Parent ID, ID, Name, Kind, Start/End time, Status
    code/message, Attributes), with Kind/StatusCode rendered via their
    enum String() names (span_kind.go:28-45, status_code.go:32-43)."""
    from ..operators.traces import SPAN_KIND, STATUS_CODE

    def enum_str(col: Column, mapping: dict[str, int]) -> Column:
        expr = F.lit("")
        out = None
        for name, num in mapping.items():
            branch = F.when(col == F.lit(num), F.lit(name))
            out = branch if out is None else out.when(col == F.lit(num), F.lit(name))
        return out.otherwise(expr)

    header = (
        F.concat(F.lit("Span #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("Span\n")
    )
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'"
    start = F.date_format(
        F.timestamp_micros(ns_to_micros(F.col("start_time_unix_nano"))), ts_fmt
    )
    end = F.date_format(
        F.timestamp_micros(ns_to_micros(F.col("end_time_unix_nano"))), ts_fmt
    )
    return F.concat(
        header,
        F.lit("Trace ID: "), F.col("trace_id"), F.lit("\n"),
        F.lit("Parent ID: "), F.col("parent_span_id"), F.lit("\n"),
        F.lit("ID: "), F.col("span_id"), F.lit("\n"),
        F.lit("Name: "), F.col("name"), F.lit("\n"),
        F.lit("Kind: "), enum_str(F.col("kind"), SPAN_KIND), F.lit("\n"),
        F.lit("Start time: "), start, F.lit("\n"),
        F.lit("End time: "), end, F.lit("\n"),
        F.lit("Status code: "), enum_str(F.col("status_code"), STATUS_CODE), F.lit("\n"),
        F.lit("Status message: "), F.col("status_message"), F.lit("\n"),
        _attr_lines(F.col("attributes")),
    )


def render_number_data_point(prefix_index: Column | None = None) -> Column:
    """Canonical text block for one Sum/Gauge data point
    (databuffer.go:102-117 logNumberDataPoints: attributes,
    StartTimestamp, Timestamp, Value)."""
    header = (
        F.concat(F.lit("NumberDataPoints #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("NumberDataPoints\n")
    )
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'"
    start = F.date_format(
        F.timestamp_micros(ns_to_micros(F.col("start_time_unix_nano"))), ts_fmt
    )
    ts = F.date_format(
        F.timestamp_micros(ns_to_micros(F.col("time_unix_nano"))), ts_fmt
    )
    from .values import es6_double_col

    return F.concat(
        header,
        _attr_lines(F.col("attributes")),
        F.lit("StartTimestamp: "), start, F.lit("\n"),
        F.lit("Timestamp: "), ts, F.lit("\n"),
        F.lit("Value: "), es6_double_col(F.col("value_double")), F.lit("\n"),
    )


def render_records(records: DataFrame) -> DataFrame:
    """records → (url, line_no, rendered) — the debug-sink projection."""
    return records.select(
        "url",
        "line_no",
        render_log_record(F.col("line_no")).alias("rendered"),
    )


def render_to_string(records: DataFrame, limit: int = 100) -> str:
    """Driver-side golden-text assembly for tests/debug display: records
    ordered by (url, line_no), concatenated. Only for small frames."""
    rows = (
        render_records(records)
        .orderBy("url", "line_no")
        .limit(limit)
        .collect()
    )
    return "".join(r["rendered"] for r in rows)
