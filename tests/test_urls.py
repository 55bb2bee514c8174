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


def test_surt_key_collapses_cosmetic_variants(spark):
    """All cosmetic variants of one logical URL (scheme/host case, www,
    default port, fragment, query order) produce ONE SURT key, and the
    key has the archival shape com,example,...)/path?query."""
    from opentelemetry_collector_spark.operators.urls import surt_key

    base = "https://news.example.com/A/b?z=1&a=2"
    variants = [
        base,
        "HTTPS://news.Example.COM/A/b?z=1&a=2",
        "https://www.news.example.com/A/b?z=1&a=2",
        "https://news.example.com:443/A/b?z=1&a=2",
        "https://news.example.com/A/b?a=2&z=1",
        "https://news.example.com/A/b?z=1&a=2#frag",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = {r[0] for r in df.select(surt_key(F.col("url"))).collect()}
    assert keys == {"com,example,news)/A/b?a=2&z=1"}
    # non-default port survives; different path → different key
    extra = spark.createDataFrame(
        [("https://news.example.com:8080/A/b",), ("https://news.example.com/A/c",)],
        "url string",
    )
    got = [r[0] for r in extra.select(surt_key(F.col("url"))).collect()]
    assert got[0] == "com,example,news:8080)/A/b"
    assert got[1] == "com,example,news)/A/c"
