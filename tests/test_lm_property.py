"""Property test: the columnar bigram LM equals a pure-Python reference
implementation of the same JM-interpolated model on random corpora."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.operators.textstats import bigram_logperplexity

_WORD = st.sampled_from(["a", "b", "c", "dd", "ee", "fff"])
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)


def _reference(docs: list[str], vocab_size: int, lam: float) -> dict[int, float]:
    """Pure-Python replication of the documented semantics."""
    toks = {i: d.split() for i, d in enumerate(docs)}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    vocab = {
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    }
    mapped = {i: [t if t in vocab else "<unk>" for t in ts] for i, ts in toks.items()}
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for ts in mapped.values():
        for j, w in enumerate(ts):
            uni[w] = uni.get(w, 0) + 1
            if j > 0:
                bi[(ts[j - 1], w)] = bi.get((ts[j - 1], w), 0) + 1
                ctx[ts[j - 1]] = ctx.get(ts[j - 1], 0) + 1
    total = sum(uni.values())
    out = {}
    for i, ts in mapped.items():
        lps = []
        for j, w in enumerate(ts):
            pb = (
                bi.get((ts[j - 1], w), 0) / ctx[ts[j - 1]]
                if j > 0 and ts[j - 1] in ctx
                else 0.0
            )
            p = lam * pb + (1.0 - lam) * (uni[w] / total)
            lps.append(round(math.log2(p), 9))
        out[i] = round(-sum(lps) / len(lps), 4)
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    docs=st.lists(_DOC, min_size=1, max_size=6),
    vocab_size=st.sampled_from([2, 4, 1000]),
)
def test_bigram_lm_matches_python_reference(spark, docs, vocab_size):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["bigram_bits"]
        for r in bigram_logperplexity(df, vocab_size=vocab_size).collect()
    }
    want = _reference(docs, vocab_size, 0.7)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-4), f"doc {i}"
