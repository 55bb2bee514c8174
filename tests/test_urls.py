"""URL-operator unit tests that live outside the textstats suite:
sketch rollups (HLL distinct / approx percentile with error gates)."""

from __future__ import annotations

from opentelemetry_collector_spark.operators.urls import host_sketches


def test_host_sketches_gates_hold(spark):
    """HLL distinct + approx median land within the declared 5% of the
    exact twins on a realistic per-host corpus (the url_suite 'sketch'
    part's contract, unit-scoped)."""
    rows = [
        (f"https://h{i % 3}.example.com/p/{i}", f"text body {i % 40} " * (1 + i % 7))
        for i in range(600)
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    got = host_sketches(pages).collect()
    assert len(got) == 3
    for r in got:
        assert r["distinct_ok"] is True
        assert r["median_ok"] is True
        assert r["exact_distinct"] > 0


def test_host_sketches_empty(spark):
    pages = spark.createDataFrame([], "url string, text string")
    assert host_sketches(pages).count() == 0
