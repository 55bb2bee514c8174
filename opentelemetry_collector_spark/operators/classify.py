"""One-pass linear text classifier over hashed unigrams (fastText-shaped).

Corpus curation needs trainable quality/language classifiers, not just
fixed heuristics (the fastText lang-id / quality-filter step of web
pipelines). Iterative optimizers (SGD, LBFGS) don't belong in a
one-pass columnar engine, but Naive-Bayes log-odds ARE a linear text
classifier trained in a SINGLE aggregation: per hashed-token-bucket
weight = log-odds ratio of class-conditional token frequencies, plus a
class-prior bias. NB weights are the classic closed-form init for
linear text models (and fastText's unigram mode approaches exactly
this shape); here they are the whole model, so training is one shuffle
and scoring is scan speed.

Feature hashing (the "hashing trick"): token → md5-derived 60-bit int →
``n_buckets`` bucket (:func:`~.dedup.md5_long`, the engine-independent
md5 bridge the DuckDB oracle replays exactly). The model is therefore
bounded at ``n_buckets`` rows REGARDLESS of corpus vocabulary — the
broadcast stays small at any scale; collisions are the usual
hashing-trick tradeoff and ``n_buckets`` is the knob.

Scale: training is explode → ONE groupBy(bucket) with map-side partial
aggregation (≤ ``n_buckets`` rows cross the wire) + one tiny totals
aggregate; the model and totals broadcast back. Scoring is explode →
broadcast join → one per-doc aggregate: the corpus never shuffles on
the token key, same shape as the LM-perplexity scorer
(textstats.unigram_logperplexity). Cross-engine float parity follows
the house pattern: per-bucket weights 9-dp rounded in both engines
before the per-doc mean, outputs 4-dp.

Reference analog: the curation-side classifiers referenced from
docs/performance.md's pipeline inventory; the collector itself carries
no trainable models, so the parity surface is the oracle, not a Go file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long, tokenize


def token_buckets(text: Column, n_buckets: int) -> Column:
    """Token array → hashed bucket ids (the feature extractor)."""
    return F.transform(tokenize(text), lambda t: md5_long(t) % n_buckets)


def train_nb(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train NB log-odds weights for boolean ``label`` over ``docs``.

    Returns ``(model, bias)``: ``model`` is ``(bucket, weight)`` with
    ≤ ``n_buckets`` rows (weight = smoothed log2 odds ratio, 9-dp);
    ``bias`` is a 1-row frame ``(bias,)`` holding the class-prior
    log-odds. Both are tiny by construction — broadcast them. A corpus
    with an empty class has no decision boundary: the bias raises
    (``raise_error``) rather than emitting a degenerate NULL model.
    """
    base = docs.where(F.col(text_col).isNotNull()).select(
        label.cast("boolean").alias("__y"), F.col(text_col).alias("__t")
    )
    toks = base.select(
        "__y", F.explode(token_buckets(F.col("__t"), n_buckets)).alias("bucket")
    )
    counts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("double").alias("__pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("double").alias("__neg"),
    )
    totals = counts.agg(
        F.sum("__pos").alias("__pt"), F.sum("__neg").alias("__nt")
    )
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * n_buckets)
    model = counts.crossJoin(F.broadcast(totals)).select(
        F.col("bucket"),
        F.round(
            F.log2((F.col("__pos") + a) / (F.col("__pt") + ab))
            - F.log2((F.col("__neg") + a) / (F.col("__nt") + ab)),
            9,
        ).alias("weight"),
    )
    pos_docs = F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("double")
    neg_docs = F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("double")
    # log2(0) is silently NULL in Spark — guard explicitly so an
    # empty class raises instead of emitting a degenerate NULL model
    bias = base.agg(pos_docs.alias("__p"), neg_docs.alias("__n")).select(
        F.when(
            (F.col("__p") > 0) & (F.col("__n") > 0),
            F.round(F.log2(F.col("__p")) - F.log2(F.col("__n")), 9),
        )
        .otherwise(
            F.raise_error(
                F.lit("train_nb: a label class is empty — no decision boundary")
            )
        )
        .alias("bias")
    )
    return model, bias


def score_nb(
    docs: DataFrame,
    model: DataFrame,
    bias: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score ``docs`` under a trained model: ``(id, *carry, n_tokens,
    score, predicted)`` where score = bias + mean bucket weight (4-dp)
    and predicted = score ≥ 0. Buckets unseen in training (foreign
    corpora) score 0 — the no-evidence weight, not a NULL that would
    poison the mean. ``carry_cols`` ride the explode and the per-doc
    aggregate (``id_col`` is unique per doc, so extra keys don't change
    the grouping) — never a second doc-keyed join."""
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(token_buckets(F.col(text_col), n_buckets)).alias("bucket"),
    )
    scored = toks.join(F.broadcast(model), "bucket", "left").withColumn(
        "__w", F.coalesce(F.col("weight"), F.lit(0.0))
    )
    return (
        scored.groupBy(id_col, *carry_cols)
        .agg(F.count("*").cast("long").alias("n_tokens"), F.avg("__w").alias("__m"))
        .crossJoin(F.broadcast(bias))
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.col("n_tokens"),
            F.round(F.col("bias") + F.col("__m"), 4).alias("score"),
            (F.col("bias") + F.col("__m") >= 0).alias("predicted"),
        )
    )


def nb_self_classify(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Train on ``docs`` and score the same corpus (the self-supervised
    curation demo: fit the lang/quality boundary on the corpus being
    curated). The true ``label`` column rides the scoring aggregate so
    downstream filters can read agreement directly."""
    model, bias = train_nb(docs, label, text_col=text_col, n_buckets=n_buckets)
    labeled = docs.withColumn("label", label.cast("boolean"))
    return score_nb(
        labeled,
        model,
        bias,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        carry_cols=("label",),
    )
