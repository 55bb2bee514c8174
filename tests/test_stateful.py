"""applyInPandasWithState trace assembly (P11 group_by(trace_id, gap)):
streaming emission parity against the batch twin, O(1)-state semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.traces import events_to_spans
from opentelemetry_collector_spark.streaming.stateful import (
    assemble_traces,
    batch_trace_summaries,
    with_event_ts,
)

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _events(base_min: int, n: int, user: int):
    """n events for one user starting at minute ``base_min``."""
    return [
        (
            base_min * 100 + i,
            dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=base_min + i),
            user,
            "error" if i == 0 else "click",
            10.0,
            '{"k": 1}',
        )
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def spans_dir(spark, tmp_path_factory):
    """Three files = three micro-batches; event time advances file to
    file so the watermark closes earlier traces."""
    d = str(tmp_path_factory.mktemp("spans_stream"))
    batches = [
        _events(0, 3, user=1),  # trace A: minutes 0-2
        _events(30, 2, user=2),  # trace B: minutes 30-31 (A now > gap old)
        _events(90, 1, user=3),  # trace C: minute 90 (B now > gap old)
    ]
    for rows in batches:
        ev = spark.createDataFrame(rows, EVENT_COLS)
        events_to_spans(ev).coalesce(1).write.mode("append").parquet(d)
    return d


def test_streaming_trace_assembly_matches_batch(spark, spans_dir, tmp_path):
    spans_schema = spark.read.parquet(spans_dir).schema
    stream = (
        spark.readStream.schema(spans_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spans_dir)
    )
    out = assemble_traces(with_event_ts(stream), gap="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("traces_done")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["trace_id"]: r for r in spark.sql("SELECT * FROM traces_done").collect()}

    batch = {
        r["trace_id"]: r
        for r in batch_trace_summaries(spark.read.parquet(spans_dir)).collect()
    }
    # the last trace (C) is still open (watermark never passed end+gap)
    assert 1 <= len(got) < len(batch)
    for tid, row in got.items():
        want = batch[tid]
        assert row["n_spans"] == want["n_spans"]
        assert row["n_errors"] == want["n_errors"]
        assert row["start_time_unix_nano"] == want["start_time_unix_nano"]
        assert row["end_time_unix_nano"] == want["end_time_unix_nano"]
        assert row["duration_ms"] == want["duration_ms"]
    # every emitted trace has the planted leading error span
    assert all(r["n_errors"] == 1 for r in got.values())


def test_resume_does_not_duplicate_emissions(spark, spans_dir, tmp_path):
    """Restarting the query on the same checkpoint re-emits nothing —
    operator state and emissions survive in the checkpoint (WAL analog);
    the memory sink can't recover, so this drives the real path:
    foreachBatch + epoch-idempotent sink."""
    from opentelemetry_collector_spark.streaming.sinks import IdempotentParquetSink

    spans_schema = spark.read.parquet(spans_dir).schema
    sink = IdempotentParquetSink(str(tmp_path / "done"), "traces")

    def run():
        stream = (
            spark.readStream.schema(spans_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(spans_dir)
        )
        q = (
            assemble_traces(with_event_ts(stream), gap="10 minutes")
            .writeStream.foreachBatch(lambda df, eid: sink.write_epoch(df, eid))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination(120)
        return sink.committed_row_count()

    first = run()
    second = run()  # resume: no new input, no new emissions
    assert first >= 1
    assert second == first
