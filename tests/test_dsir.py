"""DSIR importance resampling: model fit, scoring, Gumbel-top-k."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_resample,
    dsir_scores,
    ngram_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_outweigh_raw_like_docs(spark):
    # target talks about astronomy; raw is mostly boilerplate
    target = _docs(
        spark,
        [(1, "stars orbit the galaxy core"), (2, "galaxy stars shine bright")],
    )
    raw = _docs(
        spark,
        [
            (10, "click here to subscribe now"),
            (11, "stars orbit the galaxy core"),
            (12, "buy now click here"),
            (13, "galaxy stars galaxy stars"),
        ],
    )
    model, consts = dsir_log_ratios(raw, target, n_buckets=512)
    scored = {
        r["doc_id"]: r["log_w"]
        for r in dsir_scores(raw, model, consts, n_buckets=512).collect()
    }
    assert scored[11] > scored[10]
    assert scored[13] > scored[12]


def test_unseen_features_score_the_smoothing_constant(spark):
    target = _docs(spark, [(1, "alpha beta")])
    raw = _docs(spark, [(2, "alpha gamma")])
    model, consts = dsir_log_ratios(raw, target, n_buckets=512)
    c0 = consts.collect()[0]["c0"]
    # a doc whose every unigram+bigram is new to BOTH corpora
    foreign = _docs(spark, [(9, "zeta omega")])
    row = dsir_scores(foreign, model, consts, n_buckets=512).collect()[0]
    assert row["n_feats"] == 3  # 2 unigrams + 1 bigram
    assert row["log_w"] == pytest.approx(round(3 * c0, 4), abs=2e-4)


def test_bigrams_are_part_of_the_feature_space(spark):
    df = _docs(spark, [(1, "a b c")])
    n = df.select(
        F.size(ngram_buckets(F.col("text"), 64)).alias("n")
    ).collect()[0]["n"]
    assert n == 5  # 3 unigrams + 2 bigrams


def test_resample_is_deterministic_and_ranked(spark):
    raw = _docs(spark, [(i, f"doc number {i} with words {i % 7}") for i in range(40)])
    target = _docs(spark, [(100, "doc number 3 with words 3")])
    model, consts = dsir_log_ratios(raw, target, n_buckets=512)
    scored = dsir_scores(raw, model, consts, n_buckets=512)
    a = dsir_resample(scored, k=8).collect()
    b = dsir_resample(scored, k=8).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["rank"] for r in a] == list(range(1, 9))
    keys = [r["gumbel_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # a different seed draws a different sample (Gumbel noise moved)
    c = dsir_resample(scored, k=8, seed="other").collect()
    assert [r["doc_id"] for r in c] != [r["doc_id"] for r in a]


def test_gumbel_key_matches_hand_formula(spark):
    scored = spark.createDataFrame([(5, 0.25)], "doc_id long, log_w double")
    got = dsir_resample(scored, k=1).collect()[0]
    import hashlib

    h = int(hashlib.md5(b"dsir#5").hexdigest()[17:32], 16)
    u = (h + 0.5) / float(1 << 60)
    assert got["gumbel_key"] == pytest.approx(
        round(0.25 - math.log(-math.log(u)), 9), abs=1e-9
    )


def test_scoring_plan_is_broadcast_and_jvm_only(spark):
    raw = _docs(spark, [(i, f"w{i} w{i+1}") for i in range(30)])
    target = _docs(spark, [(99, "w1 w2")])
    model, consts = dsir_log_ratios(raw, target, n_buckets=256)
    plan = dsir_scores(raw, model, consts, n_buckets=256)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_corpus_raises(spark):
    raw = _docs(spark, [(1, "a b")])
    empty = _docs(spark, []).where(F.lit(False))
    model, consts = dsir_log_ratios(raw, empty, n_buckets=64)
    with pytest.raises(Exception, match="no density|raise_error|DSIR|dsir"):
        model.collect()
