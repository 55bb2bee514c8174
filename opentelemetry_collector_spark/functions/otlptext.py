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
            F.timestamp_micros((F.col("time_unix_nano") / 1000).cast("long")),
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
