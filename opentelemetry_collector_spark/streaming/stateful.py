"""Custom stateful streaming operators — applyInPandasWithState.

The reference's OTTL design sketches ``group_by(trace_id, 2m)``
(docs/processing.md:217-222): accumulate records per key and emit when
the group has been quiet for a window. Tumbling/session windows cover the
aggregation cases (operators/aggregate.py, stream.py); THIS module is the
escape hatch for state machines Spark's built-in windows can't express —
here, trace assembly: spans accumulate per trace_id and a trace SUMMARY
is emitted once the event-time watermark passes the trace's last activity
plus a gap (the "trace completion by inactivity" semantics of a
tail-sampling buffer).

Mechanics (Structured Streaming arbitrary stateful ops):
- ``applyInPandasWithState`` partitions the stream by key; each key's
  Arrow batches arrive with a GroupState handle;
- state is a fixed-schema tuple (counts + min/max times), O(1) per trace
  regardless of span count — the 100 TB property: state size scales with
  ACTIVE traces, not records;
- ``GroupStateTimeout.EventTimeTimeout`` + watermark: a trace times out
  when the watermark passes ``last_end + gap``; the state is then removed
  and the summary emitted, so memory is bounded by the inactivity gap.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.values import ns_to_micros

TRACE_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("n_spans", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("start_time_unix_nano", T.LongType(), False),
        T.StructField("end_time_unix_nano", T.LongType(), False),
        T.StructField("duration_ms", T.DoubleType(), False),
    ]
)

# O(1) per-trace state: span/error counts + time bounds
TRACE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_spans", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("start_ns", T.LongType(), False),
        T.StructField("end_ns", T.LongType(), False),
    ]
)


def _summary_row(trace_id: str, n: int, errs: int, start: int, end: int) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "trace_id": trace_id,
                "n_spans": n,
                "n_errors": errs,
                "start_time_unix_nano": start,
                "end_time_unix_nano": end,
                "duration_ms": (end - start) / 1_000_000.0,
            }
        ]
    )


def assemble_traces(
    spans: DataFrame,
    gap: str = "10 minutes",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming spans → completed-trace summaries.

    ``spans`` must be a streaming frame with SPANS_SCHEMA columns plus an
    event-time ``ts_col`` AND its watermark already applied — use
    :func:`with_event_ts`, which owns the watermark delay. A trace's
    summary is emitted once the watermark passes its last span's end time
    + gap.
    """
    gap_ms = _duration_ms(gap)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (trace_id,) = key
        if state.hasTimedOut:
            n, errs, start, end = state.get
            state.remove()
            yield _summary_row(trace_id, n, errs, start, end)
            return
        n, errs, start, end = state.get if state.exists else (0, 0, None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            errs += int((pdf["status_code"] == 2).sum())
            lo = int(pdf["start_time_unix_nano"].min())
            hi = int(pdf["end_time_unix_nano"].max())
            start = lo if start is None else min(start, lo)
            end = hi if end is None else max(end, hi)
        state.update((n, errs, int(start), int(end)))
        # time out once the watermark passes last activity + gap; an
        # out-of-order straggler whose end already trails the watermark
        # still needs a FUTURE timeout (Spark rejects timestamps at or
        # behind the watermark)
        timeout_ms = max(
            int(end // 1_000_000) + gap_ms, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        return

    return (
        spans.groupBy("trace_id").applyInPandasWithState(
            fn,
            outputStructType=TRACE_SUMMARY_SCHEMA,
            stateStructType=TRACE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def with_event_ts(spans: DataFrame, watermark_delay: str = "0 seconds") -> DataFrame:
    """Attach the event-time column + watermark the stateful op keys off
    (end time of each span)."""
    return spans.withColumn(
        "event_ts",
        F.timestamp_micros(ns_to_micros(F.col("end_time_unix_nano"))),
    ).withWatermark("event_ts", watermark_delay)


def _duration_ms(s: str) -> int:
    qty, unit = s.split()
    mult = {
        "millisecond": 1,
        "milliseconds": 1,
        "second": 1000,
        "seconds": 1000,
        "minute": 60_000,
        "minutes": 60_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
    }[unit]
    return int(qty) * mult


def batch_trace_summaries(spans: DataFrame) -> DataFrame:
    """Batch twin of :func:`assemble_traces` (same output schema, plain
    groupBy) — the parity target for tests: the streaming emission must
    equal this for every watermark-closed trace."""
    return (
        spans.groupBy("trace_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("status_code") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            F.min("start_time_unix_nano").alias("start_time_unix_nano"),
            F.max("end_time_unix_nano").alias("end_time_unix_nano"),
        )
        .withColumn(
            "duration_ms",
            (F.col("end_time_unix_nano") - F.col("start_time_unix_nano"))
            / F.lit(1_000_000.0),
        )
    )
