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


def test_round3_operators_empty(spark, empty_docs, empty_events):
    from opentelemetry_collector_spark.operators.urls import host_stats

    assert dedup.chunk_dedup(empty_docs).count() == 0
    assert ts.repetition_signals(empty_docs).count() == 0
    empty_docs_lang = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert ts.sample_stratified(empty_docs_lang).count() == 0
    assert ts.contamination_overlap(empty_docs, empty_docs).count() == 0
    empty_pages = spark.createDataFrame([], "url string, text string, lang string")
    assert host_stats(empty_pages).count() == 0
    # metric codecs on empty frames: marshal produces 0 requests, unmarshal 0 rows
    from opentelemetry_collector_spark.functions import otlp_json as oj

    g = met.gauge_points(empty_events)
    assert oj.otlp_json_to_gauge_points(oj.gauge_points_to_otlp_json(g)).count() == 0
    e = met.exp_histogram_points(empty_events)
    assert oj.otlp_json_to_exp_histogram_points(
        oj.exp_histogram_points_to_otlp_json(e)
    ).count() == 0
    s = met.summary_points(empty_events)
    assert oj.otlp_json_to_summary_points(oj.summary_points_to_otlp_json(s)).count() == 0
    x = met.sum_points_with_exemplars(empty_events)
    assert oj.otlp_json_to_sum_points(oj.sum_points_to_otlp_json(x)).count() == 0


def test_chunk_dedup_short_and_empty_text(spark):
    """Texts shorter than one chunk (incl. empty string) produce no chunk
    rows and must not trip the negative-step sequence trap."""
    from opentelemetry_collector_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in chunk_dedup(df, k=8).collect()}
    assert set(got) == {3}
    assert got[3]["n_chunks"] == 1


def test_redact_and_blocklist_empty(spark, empty_docs):
    from opentelemetry_collector_spark.operators.redact import redact_pii
    from opentelemetry_collector_spark.operators.urls import filter_blocked_hosts

    assert redact_pii(empty_docs).count() == 0
    empty_pages = spark.createDataFrame([], "url string, text string, lang string")
    no_block = spark.createDataFrame([], "host string")
    assert filter_blocked_hosts(empty_pages, no_block).count() == 0
    some_block = spark.createDataFrame([("x",)], "host string")
    assert filter_blocked_hosts(empty_pages, some_block).count() == 0


def test_new_round3_operators_empty(spark, empty_docs, empty_emb):
    assert sim.lsh_cell_dedup(empty_emb, dim=4, planes=2).count() == 0
    empty_docs_src = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert ts.tfidf_top_terms(empty_docs_src).count() == 0
    empty_docs_lang = spark.createDataFrame(
        [], "doc_id long, text string, lang string"
    )
    assert ts.ccnet_perplexity_buckets(empty_docs_lang).count() == 0


def test_mixing_and_packing_empty(spark, empty_docs):
    empty_src = spark.createDataFrame([], "doc_id long, text string, source string")
    assert ts.mixture_weights(empty_src, {"x": 1.0}).count() == 0
    assert ts.pack_sequences(empty_docs, budget=128).count() == 0
    assert ts.char_entropy(empty_docs).count() == 0


def test_pb_codec_and_new_ops_on_empty_inputs(spark, empty_docs):
    from opentelemetry_collector_spark.functions import otlp_pb
    from opentelemetry_collector_spark.schemas import LOG_RECORDS_SCHEMA

    empty_records = spark.createDataFrame([], LOG_RECORDS_SCHEMA)
    assert otlp_pb.logs_to_otlp_pb(empty_records).count() == 0
    assert otlp_pb.roundtrip_pb(empty_records, salt_buckets=4).count() == 0
    assert ts.text_signals(empty_docs).count() == 0
    assert ts.doc_signals(empty_docs).count() == 0
    assert ts.bpe_encode(empty_docs).count() == 0
    empty_lang = spark.createDataFrame([], "doc_id long, lang string, text string")
    assert ts.apply_mixture(empty_lang, {"en": 1.0}, group_col="lang").count() == 0


def test_round4_operators_empty(spark, empty_docs):
    from opentelemetry_collector_spark.operators import dsir

    # gopher filter over empty signals
    assert ts.gopher_filter(ts.doc_signals(empty_docs)).count() == 0
    # normalization + dedup over empty corpus
    norm = empty_docs.select(
        "doc_id", ts.normalize_text(F.col("text")).alias("text")
    )
    assert dedup.dedup_exact(norm).count() == 0
    # incremental dedup: empty batch vs empty snapshot
    empty_snap = spark.createDataFrame([], "digest string")
    survivors, updated = dedup.dedup_incremental(empty_docs, empty_snap)
    assert survivors.count() == 0 and updated.count() == 0
    # bigram LM: empty corpus scores nothing, does not divide by zero
    assert ts.bigram_logperplexity(empty_docs).count() == 0
    # DSIR scoring under a model trained elsewhere, over an empty corpus
    raw = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model, consts = dsir.dsir_log_ratios(raw, raw, n_buckets=64)
    assert dsir.dsir_scores(empty_docs, model, consts, n_buckets=64).count() == 0
    scored_empty = spark.createDataFrame([], "doc_id long, log_w double")
    assert dsir.dsir_resample(scored_empty, k=5).count() == 0


def test_c4_line_filter_empty_and_null(spark, empty_docs):
    assert ts.c4_line_filter(empty_docs).count() == 0
    # NULL text rows are filtered out, not nulled through
    nulls = spark.createDataFrame(
        [(1, None), (2, "A good line with five words.")],
        "doc_id long, text string",
    )
    rows = ts.c4_line_filter(nulls).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_round5_wet_wat_cdx_bm25_empty(spark):
    from opentelemetry_collector_spark.sources.warc import (
        cdx_index,
        wat_records,
        wet_records,
    )

    empty_pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string"
    )
    assert wet_records(empty_pages).count() == 0
    assert wat_records(empty_pages).count() == 0
    assert cdx_index(wet_records(empty_pages), n_shards=4).count() == 0
    empty_docs2 = spark.createDataFrame([], "doc_id long, text string")
    assert ts.bm25_topk(empty_docs2, ["spark"], k=5).count() == 0
    # null text rows are filtered, never scored or framed
    nulls = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    assert ts.bm25_topk(nulls, ["spark"], k=5).count() == 0
