"""SparkSession factory tuned for the pipeline.

Scale notes (100 TB / 1000-executor design, tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting is
  the safety net for Zipf-skewed hosts (SURVEY.md §4 item 1).
- shuffle.partitions defaults to cores locally; on a real cluster this is
  set to ~2-3x total cores via spark-submit conf, and AQE coalesces down.
- Arrow enabled for the few pandas-UDF boundaries (multimodal decode); the
  hot parse path is pure JVM expressions and never crosses into Python.
- session TZ pinned UTC so timestamps compare bit-exactly with the DuckDB
  oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # parquet sinks: zstd mirrors the reference's wire compression options
    # (config/configcompression/compressionType.go:21-28)
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "otel-collector-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to local[$SPARK_GRAFT_CPUS] (env, default all cores)
    so the scaling bench can pin parallelism via one knob.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner.isdigit():
            conf["spark.sql.shuffle.partitions"] = inner
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
