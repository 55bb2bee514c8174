"""Fixture determinism — testdata.GenerateLogs analog
(internal/testdata/log.go:28-42: fixed content so goldens are stable)."""

import numpy as np

from opentelemetry_collector_spark.fixtures import synthesize_pages
from opentelemetry_collector_spark.fixtures.pages import generate_pages_pandas


def test_deterministic_per_row_id():
    a = generate_pages_pandas(np.arange(100))
    b = generate_pages_pandas(np.arange(100))
    assert a.equals(b)
    # same id inside a different chunk → identical row (scale invariance)
    c = generate_pages_pandas(np.array([50]))
    row = a.iloc[50]
    assert row["url"] == c.iloc[0]["url"]
    assert row["text"] == c.iloc[0]["text"]
    assert row["html"] == c.iloc[0]["html"]


def test_grammar_and_special_rows():
    pdf = generate_pages_pandas(np.arange(200))
    assert (pdf.loc[pdf.index % 97 == 0, "text"] == "").all()
    # every 13th (and not 97th) row carries a multi-byte tail
    mb = pdf[(pdf.index % 13 == 0) & (pdf.index % 97 != 0)]
    assert all("ünïcödé" in t for t in mb["text"])
    assert pdf["url"].is_unique


def test_zipf_skew():
    pdf = generate_pages_pandas(np.arange(20000))
    hosts = pdf["url"].str.extract(r"https://([^/]+)/")[0]
    top = hosts.value_counts(normalize=True).iloc[0]
    assert 0.15 < top < 0.30  # top host ~20% — exercises salting


def test_synthesize_distributed_matches_local(spark):
    sdf = synthesize_pages(spark, 150, partitions=7).orderBy("url").toPandas()
    loc = generate_pages_pandas(np.arange(150)).sort_values("url").reset_index(drop=True)
    assert list(sdf["url"]) == list(loc["url"])
    assert list(sdf["text"]) == list(loc["text"])
    assert [bytes(h) for h in sdf["html"]] == list(loc["html"])


def test_fan_out_small_scan_is_conditional(spark):
    """Rebalances a 1-split scan to defaultParallelism; NO-OP once the
    frame already has >= target partitions (the cluster-scale case)."""
    from opentelemetry_collector_spark.sources.tables import fan_out_small_scan

    one = spark.range(100).coalesce(1)
    fanned = fan_out_small_scan(one)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    wide = spark.range(100).repartition(64)
    assert fan_out_small_scan(wide, min_partitions=8) is wide  # untouched
