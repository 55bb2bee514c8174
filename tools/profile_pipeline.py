"""Stage-by-stage pipeline profiling at a given parallelism.

Usage: SPARK_GRAFT_CPUS=8 python tools/profile_pipeline.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentelemetry_collector_spark.fixtures.lookups import lkp_geo, lkp_lang
from opentelemetry_collector_spark.operators.enrich import (
    enrich_lang_family,
    enrich_resource_geo,
)
from opentelemetry_collector_spark.operators.parse import explode_lines, parse_pages
from opentelemetry_collector_spark.session import get_spark
from opentelemetry_collector_spark.streaming.router import FanoutRouter, Route

PAGES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache/pages_sf0.1")


def timed(label, df):
    t0 = time.monotonic()
    n = df.count()
    print(f"{label:30s} {time.monotonic()-t0:7.2f}s  rows={n}")


def main():
    spark = get_spark("profile")
    print("defaultParallelism:", spark.sparkContext.defaultParallelism)
    from opentelemetry_collector_spark.operators.batch import batch_repartition

    pages = spark.read.parquet(PAGES)
    pages = batch_repartition(partitions=spark.sparkContext.defaultParallelism * 2, key="url")(pages)
    for _ in range(2):  # second pass is the measurement (warm)
        print("--- pass ---")
        timed("scan(count)", pages)
        timed("scan text only", pages.select("text"))
        timed("explode_lines", explode_lines(pages))
        parsed = parse_pages(pages, engine="sql", hot_columns=True)
        timed("parse sql", parsed)
        enr = enrich_lang_family(enrich_resource_geo(parsed, lkp_geo(spark)), lkp_lang(spark))
        timed("parse+enrich", enr)
        router = FanoutRouter(
            [
                Route("errors", predicate=F.col("severity_number") >= 17),
                Route("access_4xx", predicate=(F.col("attr_status") >= 400) & (F.col("attr_status") < 500)),
                Route("audit", kind="all"),
                Route("default", kind="default"),
            ]
        )
        assigned = router.assign(enr)
        agg = (
            assigned.select(F.explode("__sinks").alias("sink"), F.col("resource.country").alias("country"))
            .groupBy("sink", "country")
            .agg(F.count("*").alias("n"))
        )
        t0 = time.monotonic()
        agg.collect()
        print(f"{'full pipeline':30s} {time.monotonic()-t0:7.2f}s")


if __name__ == "__main__":
    main()
