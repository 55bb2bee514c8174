"""client.Info analog: per-row provenance at the file-source boundary
(client/client.go — Addr/Metadata propagated through the pipeline)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.tables import with_client_info

SF_DIR = "/root/testdata/sf0.001"


def test_client_info_rides_every_row(spark):
    df = with_client_info(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    row = df.select("client", "event_id").first()
    assert row["client"]["transport"] == "file"
    assert row["client"]["addr"].endswith(".parquet")
    assert row["client"]["file_name"].endswith(".parquet")
    assert row["client"]["file_size"] > 0
    # provenance survives downstream transforms like client.FromContext:
    # a groupBy over it answers "which client sent how many rows"
    per_client = (
        df.groupBy(F.col("client.file_name").alias("f"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in per_client) == df.count()


def test_client_info_requires_file_source(spark):
    derived = spark.range(5).select(F.col("id").alias("event_id"))
    with pytest.raises(ValueError, match="file-source boundary"):
        with_client_info(derived)
