"""Table loaders + source adapters (receiver analogs, SURVEY.md §2.1).

``load_tables`` is the S1 boundary (receiver/otlpreceiver/otlp.go:42-279):
rows enter the DAG via a declarative scan, so filters/projections written
downstream reach the parquet reader as PushedFilters/ReadSchema.

``events_to_records`` is the S2/OTLP-JSON analog
(receiver/otlpreceiver/encoder.go:30-31 content-type switch): a JSON
payload column is decoded into the plog-shaped record model with built-in
expressions only (get_json_object), never per-row Python.

``pages_from_documents`` adapts the driver's ``documents`` table into the
pages shape from BASELINE.json input_hint so the full
parse→enrich→route→aggregate pipeline can run over driver-provided data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables as DataFrames (lazy scans)."""
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}


def fan_out_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin rebalance a scan whose per-row compute dominates its
    byte size (gram/shingle explodes over short compressed text: a 600 KB
    parquet file is ONE split at any sane maxPartitionBytes, so a narrow
    scan-speed operator runs on one core while 31 idle).

    No-op whenever the scan already has ≥ ``min_partitions`` (default:
    defaultParallelism) partitions — the 100 TB case, where splits ≫
    cores and the rebalance would only add a pointless full shuffle. The
    round-robin exchange this inserts locally moves the RAW text column
    once (≤ input bytes — trivially cheap relative to the compute it
    unlocks) and is accounted in the plan-budget test like any other
    exchange. NOT for operators whose contract is "corpus never
    shuffles" (blocklist/broadcast enrichment) or whose map side is
    already cheap relative to their keyed shuffles (the dedup family —
    measured a regression on simhash under round-robin repartition).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# Severity mapping for event_type — the severity_number enum analog
# (pdata/plog/severity_number.go:26-46): error→ERROR(17), purchase→INFO(9),
# signup→INFO(9), click→DEBUG(5), view→TRACE(1).
EVENT_SEVERITY = {
    "error": ("ERROR", 17),
    "purchase": ("INFO", 9),
    "signup": ("INFO", 9),
    "click": ("DEBUG", 5),
    "view": ("TRACE", 1),
}


def events_to_records(events: DataFrame) -> DataFrame:
    """events → flat log-record rows (OTLP/JSON receiver analog, S2).

    ``props`` is the JSON body; ``k`` is promoted to a typed attribute the
    way hot attributes are promoted to columns (SURVEY.md §1.2). All
    expressions are JVM built-ins → whole-stage codegen, filters push
    through to the scan.
    """
    sev_text = F.coalesce(
        *[F.when(F.col("event_type") == t, F.lit(s)) for t, (s, _) in EVENT_SEVERITY.items()],
        F.lit(""),
    )
    sev_num = F.coalesce(
        *[F.when(F.col("event_type") == t, F.lit(n)) for t, (_, n) in EVENT_SEVERITY.items()],
        F.lit(0),
    ).cast("int")
    return events.select(
        F.col("event_id"),
        F.col("ts").alias("observed_ts"),
        # parquet timestamps arrive as TIMESTAMP_NTZ; session TZ is UTC so
        # the cast is identity and unix_micros matches DuckDB epoch_us
        (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
        .cast("long")
        .alias("time_unix_nano"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        sev_text.alias("severity_text"),
        sev_num.alias("severity_number"),
        F.get_json_object(F.col("props"), "$.k").alias("attr_k"),
        F.col("props").alias("body"),
    )


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents → pages shape (url, warc_ts, html, text, lang).

    Deterministic synthesis of the page envelope around driver-provided
    text so the north-star pipeline runs over the standard tables:
    url derives from (source, doc_id), warc_ts from doc_id seconds.
    """
    from ..operators.htmltext import wrap_html

    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id")
    )
    return docs.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("warc_ts"),
        wrap_html(F.col("text"), url).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def with_client_info(df: DataFrame, transport: str = "file") -> DataFrame:
    """Attach the reference's ``client.Info`` analog (client/client.go:
    Addr/Auth/Metadata propagated per request through the pipeline) as a
    ``client`` struct column at the source boundary.

    In a batch/streaming engine there is no live peer connection — the
    "client" of a scan is the file that produced the bytes, so the
    Spark-first mapping is file provenance: the hidden ``_metadata``
    column a file source already carries (path, name, size, modification
    time — zero cost, populated by the reader itself, no extra scan) plus
    the declared transport. Downstream operators read it the way the
    reference reads ``client.FromContext``: a column, flowing with every
    row, surviving every transform that keeps it.

    Only file-sourced frames carry ``_metadata``; on a derived frame this
    raises rather than fabricating provenance.
    """
    try:
        meta = df.select(F.col("_metadata")).schema
    except Exception as exc:
        raise ValueError(
            "with_client_info: frame has no _metadata column — client "
            "info exists only at a file-source boundary"
        ) from exc
    del meta
    return df.withColumn(
        "client",
        F.struct(
            F.lit(transport).alias("transport"),
            F.col("_metadata.file_path").alias("addr"),
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("file_size"),
        ),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Pre-shuffled storage: persist ``df`` hash-bucketed by ``key``
    (optionally sorted within buckets) as a parquet table.

    The 100 TB join strategy the one-shot ``repartition`` cannot give
    you: bucketing pays the shuffle ONCE at write time, records it in
    the table's metadata, and every later join / groupBy / dedup keyed
    on ``key`` between same-bucketed tables reads co-located buckets —
    Catalyst elides the exchange on both sides (and the sort too when
    ``sort_by`` matches the join key). For the corpus tables here
    (documents by doc_id, embeddings by vec_id) that turns the dedup
    join-back and the enrichment spine from per-query shuffles of the
    full corpus into local merge joins. ``n_buckets`` should be sized
    like shuffle partitions at the target scale (buckets ≈ cores × a
    small factor; each bucket well under executor memory).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def write_shards(
    df: DataFrame,
    sharded: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Materialize a :func:`~..operators.textstats.shuffle_shards`
    permutation as the export layout: one parquet directory per shard
    (``partitionBy(shard_id)``), rows in position order inside each
    shard's file, ``pos_in_shard`` stored so a read-back can re-derive
    the manifest (`shard_manifest`) and verify a restarted export.

    Scale: the assignment joins back to the corpus keyed on the id — it
    is corpus-sized, so this is deliberately a shuffle join (broadcast
    would be the bug); ``repartition(n_shards, shard_id)`` (the caller passes the same\n    ``n_shards`` it gave shuffle_shards) then gives
    ~one task per shard writing one position-sorted file. Shard-id hash
    collisions just mean a task writes two directories — each directory
    still holds its shard's rows in order.
    """
    if n_shards < 1:
        raise ValueError("write_shards: n_shards must be >= 1")
    (
        df.join(sharded, id_col)
        .repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(path)
    )
