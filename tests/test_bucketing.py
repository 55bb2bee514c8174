"""Bucketed-storage plan tests: the write-once shuffle actually buys
exchange-free joins and aggregations downstream (the 100 TB co-location
contract, asserted on the physical plan)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.tables import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    write_bucketed(docs, "bt_docs_a", "doc_id", n_buckets=8, sort_by="doc_id")
    write_bucketed(
        docs.select("doc_id", F.length("text").alias("n_chars")),
        "bt_docs_b",
        "doc_id",
        n_buckets=8,
        sort_by="doc_id",
    )
    yield spark.table("bt_docs_a"), spark.table("bt_docs_b")
    spark.sql("DROP TABLE IF EXISTS bt_docs_a")
    spark.sql("DROP TABLE IF EXISTS bt_docs_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the whole point: both sides arrive pre-partitioned AND
        # pre-sorted — no shuffle, no per-query sort
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    agg = a.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert "Exchange hashpartitioning" not in _plan(agg)
    assert agg.where(F.col("n") > 1).count() == 0


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join from the raw parquet shuffles — proving the
    assertion above is the bucketing, not the data size."""
    a, _ = bucketed_pair
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(a.join(raw, "doc_id"))
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_write_shards_roundtrip_verifies_manifest(spark, tmp_path):
    """Export loop end-to-end: permute (shuffle_shards) → write
    (write_shards, one directory per shard, position-sorted) → read back
    → the re-derived manifest matches the pre-write one exactly."""
    from opentelemetry_collector_spark.operators.textstats import (
        shard_manifest,
        shuffle_shards,
    )
    from opentelemetry_collector_spark.sources.tables import write_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    sharded = shuffle_shards(docs, n_shards=4)
    want = {
        r["shard_id"]: (r["n_docs"], r["manifest_md5"])
        for r in shard_manifest(sharded).collect()
    }
    out = str(tmp_path / "export")
    write_shards(docs, sharded, out, n_shards=4)

    back = spark.read.parquet(out)
    assert {"doc_id", "text", "pos_in_shard", "shard_id"} <= set(back.columns)
    got = {
        r["shard_id"]: (r["n_docs"], r["manifest_md5"])
        for r in shard_manifest(back).collect()
    }
    assert got == want
    # every shard directory exists and each holds ONE position-sorted file
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert dirs == [f"shard_id={s}" for s in sorted(want)]
    import pyarrow.parquet as pq

    for d in dirs:
        files = [f for f in os.listdir(f"{out}/{d}") if f.endswith(".parquet")]
        assert len(files) == 1
        pos = pq.read_table(f"{out}/{d}/{files[0]}", columns=["pos_in_shard"])
        vals = pos.column(0).to_pylist()
        assert vals == sorted(vals) == list(range(len(vals)))

    with pytest.raises(ValueError):
        write_shards(docs, sharded, out, n_shards=0)
