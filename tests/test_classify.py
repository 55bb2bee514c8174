"""NB hashed-unigram linear classifier: separability, model bounds,
foreign-bucket behavior, plan shape."""

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.classify import (
    nb_self_classify,
    score_nb,
    train_nb,
)


def _corpus(spark):
    # disjoint vocab across classes → a linear model must separate it
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta " * 3, True))
    for i in range(40, 80):
        rows.append((i, "uno dos tres cuatro " * 3, False))
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_separable_corpus_classifies_perfectly(spark):
    docs = _corpus(spark)
    out = nb_self_classify(docs, F.col("y"), n_buckets=256)
    rows = out.collect()
    assert len(rows) == 80
    assert all(r["predicted"] == r["label"] for r in rows)
    # scores are signed log-odds: positive class strictly above negative
    pos = min(r["score"] for r in rows if r["label"])
    neg = max(r["score"] for r in rows if not r["label"])
    assert pos > 0 > neg


def test_model_is_bounded_and_finite(spark):
    docs = _corpus(spark)
    model, bias = train_nb(docs, F.col("y"), n_buckets=64)
    rows = model.collect()
    assert len(rows) <= 64
    assert all(abs(r["weight"]) < 64 for r in rows)
    assert abs(bias.first()["bias"]) < 64


def test_foreign_tokens_score_at_bias(spark):
    """A doc whose tokens hit no trained bucket scores exactly the class
    prior (mean weight 0), not NULL."""
    docs = _corpus(spark)
    model, bias = train_nb(docs, F.col("y"), n_buckets=256)
    foreign = spark.createDataFrame(
        [(999, "zzz qqq xxx")], "doc_id long, text string"
    )
    row = score_nb(foreign, model, bias, n_buckets=256).first()
    b = bias.first()["bias"]
    assert row["score"] == round(b, 4)
    assert row["n_tokens"] == 3


def test_single_class_corpus_fails_loudly(spark):
    docs = _corpus(spark).where(F.col("y"))
    model, bias = train_nb(docs, F.col("y"), n_buckets=64)
    with pytest.raises(Exception):
        bias.collect()  # log2(0) under ANSI — no silent degenerate model


def test_null_text_docs_are_excluded(spark):
    docs = _corpus(spark).withColumn(
        "text", F.when(F.col("doc_id") < 2, F.lit(None)).otherwise(F.col("text"))
    )
    out = nb_self_classify(docs, F.col("y"), n_buckets=256)
    assert out.count() == 78
