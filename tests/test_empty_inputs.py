"""Empty-input robustness: every operator must return 0 rows on an empty
frame — not throw (a 100 TB scan WILL produce empty partitions, empty
micro-batches and empty route subsets; ANSI-mode expression errors on the
empty path would kill whole jobs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import (
    aggregate as agg,
    dedup,
    metrics as met,
    multimodal as mm,
    similarity as sim,
    textstats as ts,
    traces as tr,
)
from opentelemetry_collector_spark.operators.parse import parse_pages
from opentelemetry_collector_spark.schemas import PAGES_SCHEMA


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_parse_empty_pages(spark):
    pages = spark.createDataFrame([], PAGES_SCHEMA)
    assert parse_pages(pages, engine="sql").count() == 0
    assert parse_pages(pages, engine="arrow").count() == 0


def test_dedup_family_empty(empty_docs):
    assert dedup.dedup_exact(empty_docs).count() == 0
    assert dedup.jaccard_pairs(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.simhash(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0


def test_textstats_empty(empty_docs):
    assert ts.token_stats(empty_docs).count() == 0
    assert ts.quality_score(empty_docs).count() == 0
    assert ts.lang_id(empty_docs).count() == 0
    assert ts.fingerprint(empty_docs).count() == 0
    assert ts.winnowing_fingerprints(empty_docs).count() == 0


def test_metrics_empty(empty_events):
    assert met.events_to_sum_points(empty_events).count() == 0
    assert met.delta_to_cumulative(met.events_to_sum_points(empty_events)).count() == 0
    assert met.gauge_points(empty_events).count() == 0
    assert met.histogram_points(empty_events).count() == 0
    assert met.exp_histogram_points(empty_events).count() == 0
    assert met.summary_points(empty_events).count() == 0


def test_traces_empty(empty_events):
    spans = tr.events_to_spans(empty_events)
    assert spans.count() == 0
    assert tr.spanmetrics(spans).count() == 0
    assert tr.span_events_to_logs(spans).count() == 0


def test_similarity_empty(spark, empty_emb):
    queries = empty_emb.select(F.col("vec_id").alias("query_id"), "embedding")
    assert sim.cosine_topk(empty_emb, queries).count() == 0
    assert sim.cosine_pairs(empty_emb, threshold=0.5).count() == 0
    assert sim.rp_lsh_pairs(empty_emb, threshold=0.5, dim=4, planes=4, bands=2).count() == 0


def test_multimodal_empty(empty_docs):
    blobs = mm.attach_blob(empty_docs)
    assert mm.blob_meta_columnar(blobs).count() == 0
    assert mm.decode_image_meta(blobs, fake=True).count() == 0
    assert mm.frame_sample(blobs).count() == 0


def test_aggregate_empty(empty_events):
    assert agg.spanmetrics(empty_events).count() == 0
    assert agg.tumbling_window(empty_events).count() == 0


def test_empty_text_and_null_props_rows(spark):
    """Degenerate VALUES (not just empty frames): blank text, one-char
    text, null props must flow through without expression errors."""
    docs = spark.createDataFrame([(1, ""), (2, "x")], "doc_id long, text string")
    assert ts.winnowing_fingerprints(docs).count() == 2
    assert dedup.jaccard_pairs(docs).count() == 0
    ev = spark.createDataFrame(
        [(1, None, 5, "view", 1.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    spans = tr.events_to_spans(ev).collect()
    assert len(spans) == 1
