"""Fan-out router + sink tests (fanoutconsumer/logs.go:32-82 +
exporterhelper analogs)."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.fixtures import synthesize_pages
from opentelemetry_collector_spark.operators.parse import parse_pages
from opentelemetry_collector_spark.streaming import (
    FanoutRouter,
    IdempotentParquetSink,
    PermanentError,
    RetryableError,
    RetryPolicy,
    RetryingSink,
    Route,
)
from opentelemetry_collector_spark.streaming.router import SINKS_COL

ROUTES = [
    Route("sink_errors", "severity_number >= 17"),
    Route("sink_access", 'attributes["method"] != nil'),
    Route("sink_default", kind="default"),
    Route("sink_all", kind="all"),
]


@pytest.fixture(scope="module")
def records(spark):
    return parse_pages(synthesize_pages(spark, 400)).persist()


@pytest.fixture(scope="module")
def assigned(records):
    return FanoutRouter(ROUTES).assign(records).persist()


def test_route_membership(assigned):
    # every row goes to sink_all; default = matched by no predicate route
    assert assigned.where(~F.array_contains(SINKS_COL, "sink_all")).count() == 0
    n = assigned.count()
    n_err = assigned.where(F.col("severity_number") >= 17).count()
    n_acc = assigned.where(F.element_at("attributes", "method").isNotNull()).count()
    n_def = assigned.where(
        (F.col("severity_number") < 17) & F.element_at("attributes", "method").isNull()
    ).count()
    got = {
        r["sink"]: r["n"]
        for r in FanoutRouter(ROUTES).route_counts(assigned).collect()
    }
    assert got["sink_all"] == n
    assert got["sink_errors"] == n_err
    assert got["sink_access"] == n_acc
    assert got["sink_default"] == n_def
    # fan-out clone semantics: totals add up exactly
    assert n_err + n_acc + n_def == n  # predicates happen to be disjoint here


def test_route_counts_includes_empty_sinks(records):
    """A sink that matched nothing must still emit an n=0 row — counters
    exist even when idle, and the output shape is data-independent
    (driver-oracle parity: the SQL twin's count(*) always yields a row)."""
    router = FanoutRouter(
        [Route("never", "severity_number >= 99"), Route("rest", kind="default")]
    )
    got = {r["sink"]: r["n"] for r in router.route_counts(router.assign(records)).collect()}
    assert got["never"] == 0
    assert got["rest"] == records.count()


def test_write_partitioned_and_readback(spark, assigned, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"), "logs")
    router = FanoutRouter(ROUTES)
    router.write_partitioned(assigned, sink, epoch_id=0)
    want = {r["sink"]: r["n"] for r in router.route_counts(assigned).collect()}
    for name, n in want.items():
        got = router.read_sink(spark, sink, name).count()
        assert got == n, name
    # routed-row equality (FIXTURES.md §5): anti-join emptiness on (url, line_no)
    expected_err = assigned.where(F.col("severity_number") >= 17).select("url", "line_no")
    got_err = router.read_sink(spark, sink, "sink_errors").select("url", "line_no")
    assert got_err.exceptAll(expected_err).count() == 0
    assert expected_err.exceptAll(got_err).count() == 0


def test_epoch_idempotence(spark, assigned, tmp_path):
    """Replaying an epoch (crash-recovery analog,
    persistent_storage.go:283-349) must not duplicate rows."""
    sink = IdempotentParquetSink(str(tmp_path / "out2"), "logs")
    router = FanoutRouter(ROUTES)
    n1 = router.write_partitioned(assigned, sink, epoch_id=0)
    n2 = router.write_partitioned(assigned, sink, epoch_id=0)  # replay → skip
    assert n1 > 0 and n2 == 0
    total = spark.read.parquet(f"{sink.data_dir}/epoch=0").count()
    assert total == n1


def test_write_per_sink_with_retry(spark, assigned, tmp_path):
    router = FanoutRouter(ROUTES)
    real = IdempotentParquetSink(str(tmp_path / "s_err"), "sink_errors")
    attempts = {"n": 0}

    def flaky_push(df, epoch_id):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RetryableError("transient backend outage")
        return real.write_epoch(df, epoch_id)

    retry = RetryingSink(
        flaky_push,
        RetryPolicy(initial_interval=0.01, max_elapsed_time=5),
        name="sink_errors",
        sleep=lambda s: None,
    )
    out = router.write_per_sink(assigned, {"sink_errors": retry}, epoch_id=0)
    n_err = assigned.where(F.col("severity_number") >= 17).count()
    assert out["sink_errors"] == n_err
    assert attempts["n"] == 3
    assert retry.stats.sent == n_err


def test_permanent_error_not_retried():
    calls = {"n": 0}

    def push(df, epoch_id):
        calls["n"] += 1
        raise PermanentError("bad request")

    retry = RetryingSink(push, RetryPolicy(initial_interval=0.01), sleep=lambda s: None)
    with pytest.raises(PermanentError):
        retry.send(None, 0)
    assert calls["n"] == 1
    assert retry.stats.send_failed == 1


def test_retry_gives_up_after_max_elapsed():
    def push(df, epoch_id):
        raise RetryableError("always down")

    retry = RetryingSink(
        push,
        RetryPolicy(initial_interval=1.0, multiplier=2.0, max_elapsed_time=0.5),
        sleep=lambda s: None,
    )
    with pytest.raises(PermanentError, match="max elapsed"):
        retry.send(None, 0)


def test_throttle_delay_override():
    """Server-requested delay (Retry-After / RetryInfo analog,
    queued_retry.go:420-424) must floor the backoff."""
    slept = []

    def push(df, epoch_id):
        if len(slept) < 1:
            raise RetryableError("throttled", throttle_delay=7.5)
        return 1

    retry = RetryingSink(
        push,
        RetryPolicy(initial_interval=0.01, max_elapsed_time=60),
        sleep=lambda s: slept.append(s),
    )
    assert retry.send(None, 0) == 1
    assert slept == [7.5]


def test_route_counts_with_collector_style_names(records):
    """Collector component ids are ``type/instance`` — such names must
    survive the stack() unpivot (unquoted they parse as a division)."""
    routes = [
        Route("otlp/errors", "severity_number >= 17"),
        Route("file/all", kind="all"),
    ]
    router = FanoutRouter(routes)
    assigned2 = router.assign(records)
    got = {r["sink"]: r["n"] for r in router.route_counts(assigned2).collect()}
    n = records.count()
    n_err = records.where(F.col("severity_number") >= 17).count()
    assert got == {"otlp/errors": n_err, "file/all": n}
    by = router.count_by(assigned2, "resource").collect()
    assert sum(r["n"] for r in by if r["sink"] == "file/all") == n
    assert sum(r["n"] for r in by if r["sink"] == "otlp/errors") == n_err


def test_partial_retry_requires_supports_partial(spark, records):
    """failed_predicate shrink is gated: an overwrite-per-epoch sink keeps
    nothing durable across a failed attempt, so the default retries the
    FULL batch; only supports_partial=True (a push target that acked the
    succeeded subset, signalerrors.go:56-69) may shrink."""
    df = records.limit(50)
    seen: list[int] = []

    def make_push():
        calls = {"n": 0}

        def push(d, epoch_id):
            calls["n"] += 1
            n = d.count()
            seen.append(n)
            if calls["n"] == 1:
                raise RetryableError(
                    "partial", failed_predicate=F.col("severity_number") >= 17
                )
            return n

        return push

    from opentelemetry_collector_spark.streaming import RetryableError  # noqa: F811

    total = df.count()
    n_err = df.where(F.col("severity_number") >= 17).count()

    seen.clear()
    full = RetryingSink(
        make_push(), RetryPolicy(initial_interval=0.01), sleep=lambda s: None
    )
    assert full.send(df, 0) == total
    assert seen == [total, total]  # no shrink without the capability

    seen.clear()
    partial = RetryingSink(
        make_push(),
        RetryPolicy(initial_interval=0.01),
        sleep=lambda s: None,
        supports_partial=True,
    )
    assert partial.send(df, 0) == n_err
    assert seen == [total, n_err]
