"""Aggregation operators — the "aggregate" of parse→enrich→route→aggregate.

The reference aggregates only in its telemetry (obsreport counters,
obsreport/obsreport_processor.go:237-295) and in the connector design
(traces→metrics, connector/connector.go:324-391). Here those become
first-class rollups:

- ``severity_rollup`` / ``host_rollup``: per-key item counts — the
  obsreport counter grain (pdata/plog/logs.go:45-57 LogRecordCount) as a
  groupBy;
- ``spanmetrics``: the spanmetrics-connector analog (T5): a record stream
  in, a metrics frame out (count/min/max/avg per key);
- ``tumbling_window``: the OTTL ``group_by(key, 2m)`` design (P11,
  docs/processing.md:217-222) — event-time bucketed aggregation. Window
  starts are reported as epoch seconds so results are engine-exact.

All are single-shuffle hash aggregations with map-side partials; doubles
are rounded at the boundary for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def severity_rollup(records: DataFrame) -> DataFrame:
    """Per-(severity_number, severity_text) item + distinct-user counts."""
    return (
        records.groupBy("severity_number", "severity_text")
        .agg(
            F.count("*").alias("items"),
            F.countDistinct("user_id").alias("users"),
        )
    )


def host_rollup(records: DataFrame) -> DataFrame:
    """Per-host record counts over the parsed log-record model."""
    return records.groupBy(F.col("resource.host").alias("host")).agg(
        F.count("*").alias("items")
    )


def spanmetrics(
    events: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Connector analog (T5): event stream → metrics frame.

    Mirrors spanmetrics: per-key call count + latency-ish min/max/avg of
    ``value_col`` (4-dp rounded sums/avgs for engine parity).
    """
    return events.groupBy(key_col).agg(
        F.count("*").alias("calls"),
        F.round(F.min(value_col), 4).alias("min_value"),
        F.round(F.max(value_col), 4).alias("max_value"),
        F.round(F.sum(value_col), 4).alias("sum_value"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
    )


def tumbling_window(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_seconds: int = 300,
) -> DataFrame:
    """Event-time tumbling window aggregation (P11 group_by analog).

    Uses ``window()`` so the identical expression works under Structured
    Streaming with a watermark; the window start is emitted as epoch
    seconds (integer) for cross-engine comparison.
    """
    w = F.window(F.col(ts_col), f"{width_seconds} seconds")
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("items"), F.round(F.avg(value_col), 4).alias("avg_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            key_col,
            "items",
            "avg_value",
        )
    )
