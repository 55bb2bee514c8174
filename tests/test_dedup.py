"""Dedup operator tests: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Mirrors the reference's unit-test style (consumertest.LogsSink analog:
collect to memory, assert counts/sets; SURVEY.md §5) over tiny controlled
corpora with planted duplicates.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.dedup import (
    dedup_exact,
    jaccard_pairs,
    lsh_candidate_pairs,
    md5_long,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_array,
    simhash,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different text about spark pipelines and logs"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_md5_long_matches_python(spark):
    import hashlib

    df = spark.createDataFrame([("abc",)], ["s"])
    got = df.select(md5_long(F.col("s")).alias("h")).collect()[0]["h"]
    expect = int(hashlib.md5(b"abc").hexdigest()[17:32], 16)
    assert got == expect


def test_shingle_array_short_text(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "a b c d")], ["doc_id", "text"])
    rows = {r["doc_id"]: r["sh"] for r in df.select("doc_id", shingle_array(F.col("text")).alias("sh")).collect()}
    assert rows[0] == []  # fewer tokens than n → no shingles
    assert rows[1] == ["a b c", "b c d"]


def test_dedup_exact(docs):
    out = dedup_exact(docs).collect()
    by_doc = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_doc[0] == 2  # doc 3 collapsed into doc 0
    assert 3 not in by_doc
    assert by_doc[1] == 1


def test_jaccard_pairs_finds_planted_neardup(docs):
    pairs = {(r["d1"], r["d2"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0
    assert all(d not in (2, 4) for p in pairs for d in p)


def test_minhash_lsh_matches_exact(docs):
    exact = {(r["d1"], r["d2"]) for r in jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh == exact


def test_minhash_signature_is_deterministic(docs):
    a = minhash_signatures(docs).orderBy("doc_id").collect()
    b = minhash_signatures(docs).orderBy("doc_id").collect()
    assert a == b


def test_lsh_exact_dups_share_all_bands(docs):
    sigs = minhash_signatures(docs)
    cands = {(r["d1"], r["d2"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 3) in cands


def test_connected_components_multi_hop(spark):
    """A chain 1-2, 2-3, 5-6 plus isolate 9 must yield components
    {1,2,3}→1, {5,6}→5 — labels propagate across hops, not just pairs."""
    from opentelemetry_collector_spark.operators.dedup import (
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["d1", "d2"])
    comps = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    docs = spark.createDataFrame([(i, f"t{i}") for i in (1, 2, 3, 5, 6, 9)], ["doc_id", "text"])
    out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dedup_clusters(docs, pairs).collect()}
    assert out[9] == (9, True)  # singleton keeps itself
    assert out[3] == (1, False) and out[1] == (1, True)
    assert sum(1 for c, k in out.values() if k) == 3  # one keeper per cluster


def test_simhash_identical_for_exact_dups(docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fps[0] == fps[3]
    assert 0 <= fps[0] < 2**32


def test_simhash_pairs_hamming_zero_for_dups(docs):
    pairs = {(r["d1"], r["d2"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((0, 3)) == 0


# --- paragraph-level boilerplate dedup (CCNet-style) ---


def test_paragraph_dedup_drops_cross_doc_boilerplate(spark):
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nunique alpha\nfooter"),
            (2, "cookie banner\nunique beta\nfooter"),
            (3, "cookie banner\nunique gamma"),
            (4, "solo document\nwith its own lines"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique alpha"
    assert out[2]["clean_text"] == "unique beta"
    assert out[3]["clean_text"] == "unique gamma"
    assert out[4]["clean_text"] == "solo document\nwith its own lines"
    assert out[1]["n_paras"] == 3 and out[1]["n_dropped"] == 2
    assert out[4]["n_dropped"] == 0


def test_paragraph_dedup_self_repeat_is_not_boilerplate(spark):
    """A doc repeating its own paragraph must NOT cross the threshold —
    the count is per distinct document."""
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "echo\necho\necho"), (2, "other text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, min_docs=2).collect()}
    assert out[1]["clean_text"] == "echo\necho\necho"
    assert out[1]["n_dropped"] == 0


def test_paragraph_dedup_all_boilerplate_doc_survives_empty(spark):
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "banner"), (2, "banner"), (3, "banner\nreal content")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, min_docs=2).collect()}
    assert len(out) == 3  # no doc lost to an anti-join
    assert out[1]["clean_text"] == "" and out[1]["n_dropped"] == 1
    assert out[3]["clean_text"] == "real content"


def test_paragraph_dedup_preserves_order_and_empty_paras(spark):
    from opentelemetry_collector_spark.operators.dedup import paragraph_dedup

    # empty paragraphs ('\n\n') are shared across docs → dropped as
    # boilerplate; surviving order must match the original
    docs = spark.createDataFrame(
        [(1, "z last?\n\na first\nm middle\n"), (2, "x\n\ny\n")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, min_docs=2).collect()}
    assert out[1]["clean_text"] == "z last?\na first\nm middle"
    assert out[2]["clean_text"] == "x\ny"


def test_incremental_dedup_drops_seen_and_within_batch(spark):
    from opentelemetry_collector_spark.operators.dedup import (
        dedup_exact,
        dedup_incremental,
    )

    prior = spark.createDataFrame(
        [(1, "already crawled"), (2, "also crawled")], "doc_id long, text string"
    )
    snapshot = dedup_exact(prior).select("digest")
    batch = spark.createDataFrame(
        [
            (10, "already crawled"),  # seen in snapshot → dropped
            (11, "brand new page"),
            (12, "brand new page"),  # within-batch dup → folded into 11
            (13, "another new one"),
        ],
        "doc_id long, text string",
    )
    survivors, updated = dedup_incremental(batch, snapshot)
    got = {r["doc_id"]: r["n_copies"] for r in survivors.collect()}
    assert got == {11: 2, 13: 1}
    # snapshot grows by exactly the survivor digests, stays distinct
    digs = [r["digest"] for r in updated.collect()]
    assert len(digs) == len(set(digs)) == 4


def test_incremental_dedup_replay_is_idempotent(spark):
    from opentelemetry_collector_spark.operators.dedup import dedup_incremental

    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "digest string")
    survivors, updated = dedup_incremental(batch, empty)
    assert survivors.count() == 2
    # the continuous-pipeline resume property: replaying the SAME batch
    # against its own updated snapshot yields zero survivors
    replay, _ = dedup_incremental(batch, updated)
    assert replay.count() == 0


def test_minhash_filter_new_drops_seen_neardups(spark, docs):
    """Ingestion-time near-dup filter: a batch doc with a verified
    near-dup in the seen corpus is dropped; fresh docs survive; the
    filter catches EDITED text an exact-digest snapshot would miss."""
    from opentelemetry_collector_spark.operators.dedup import minhash_filter_new

    seen = docs.where(F.col("doc_id").isin(0, 2))
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact vs 0
            (11, "the quick brown fox jumps over the lazy cat"),  # near vs 0
            (12, "some brand new text never seen before today ok"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        r["doc_id"]
        for r in minhash_filter_new(batch, seen, threshold=0.5).collect()
    )
    assert got == [12]


def test_minhash_filter_new_empty_seen_keeps_all(spark, docs):
    from opentelemetry_collector_spark.operators.dedup import minhash_filter_new

    seen = docs.where(F.lit(False))
    assert minhash_filter_new(docs, seen).count() == docs.count()


def test_span_dedup_merges_overlapping_windows(spark):
    """A 10-token passage shared by two docs yields 3 duplicated 8-word
    windows whose merged interval covers exactly 10 tokens — the fold
    must union overlaps, not sum window lengths (3×8=24 would be the
    bug)."""
    from opentelemetry_collector_spark.operators.dedup import span_dedup

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    df = spark.createDataFrame(
        [
            (1, shared + " one two three"),
            (2, "zzz " + shared + " qqq"),
            (3, "totally unique words here nothing shared at all with others"),
            (4, "tiny doc"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_dedup(df, k=8).collect()}
    assert got[1]["n_dup_windows"] == 3 and got[1]["covered_tokens"] == 10
    assert got[1]["coverage_frac"] == round(10 / 13, 4)
    assert got[2]["n_dup_windows"] == 3 and got[2]["covered_tokens"] == 10
    assert got[3]["n_dup_windows"] == 0 and got[3]["coverage_frac"] == 0.0
    assert got[4]["n_windows"] == 0 and got[4]["covered_tokens"] == 0
    assert 5 not in got  # null text excluded, matching the oracle


def test_span_dedup_catches_chunk_boundary_straddle(spark):
    """A duplicated passage straddling the fixed k-chunk boundary is
    invisible to chunk_dedup but fully covered by span_dedup — the
    reason overlapping windows exist."""
    from opentelemetry_collector_spark.operators.dedup import (
        chunk_dedup,
        span_dedup,
    )

    # 8 tokens of unique prefix push the shared 8-token run across the
    # doc-2 chunk boundary (chunks [0:8) and [8:16) each mix unique+shared)
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = spark.createDataFrame(
        [
            (1, shared),
            (2, "u1 u2 u3 u4 " + shared + " v1 v2 v3 v4"),
        ],
        "doc_id long, text string",
    )
    chunks = {r["doc_id"]: r for r in chunk_dedup(df, k=8).collect()}
    assert chunks[2]["n_dup_chunks"] == 0  # straddle: chunks see nothing
    spans = {r["doc_id"]: r for r in span_dedup(df, k=8).collect()}
    assert spans[2]["n_dup_windows"] == 1 and spans[2]["covered_tokens"] == 8
    assert spans[1]["covered_tokens"] == 8 and spans[1]["coverage_frac"] == 1.0


def test_span_dedup_disjoint_spans_sum(spark):
    """Two disjoint duplicated passages in one doc each contribute their
    full length (no spurious merge across the gap)."""
    from opentelemetry_collector_spark.operators.dedup import span_dedup

    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = spark.createDataFrame(
        [
            (1, a + " gap1 gap2 gap3 " + b),
            (2, a),
            (3, b),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_dedup(df, k=8).collect()}
    assert got[1]["covered_tokens"] == 16 and got[1]["n_dup_windows"] == 2


# ---------------------------------------------------------------------------
# Bloom-gated incremental dedup
# ---------------------------------------------------------------------------


def test_bloom_gate_is_exact_for_every_size(spark):
    """The bloom gate must never change RESULTS — only the anti-join
    input size. Survivors and snapshot equal the ungated path for a
    well-sized filter, an absurdly small one (false positives on nearly
    every row), and k=1."""
    from opentelemetry_collector_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_bloom,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}" if i % 5 else "common dup text") for i in range(300)],
        "doc_id long, text string",
    )
    seen = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    batch = docs.where(F.col("doc_id") % 3 != 0)
    ref, ref_snap = dedup_incremental(batch, seen)
    want = sorted(map(tuple, ref.collect()))
    want_snap = sorted(r["digest"] for r in ref_snap.collect())
    for m_bits, k in ((1 << 16, 5), (64, 2), (128, 1)):
        got, snap = dedup_incremental_bloom(batch, seen, m_bits=m_bits, k=k)
        assert sorted(map(tuple, got.collect())) == want, (m_bits, k)
        assert sorted(r["digest"] for r in snap.collect()) == want_snap


def test_bloom_gate_bypasses_definite_new_rows(spark):
    """On a mostly-new batch a well-sized filter routes ~(dup_rate + p)
    of rows into the exact join; the rest bypass map-side."""
    from opentelemetry_collector_spark.operators.dedup import (
        bloom_build,
        bloom_might_contain,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}" if i % 5 else "common dup text") for i in range(500)],
        "doc_id long, text string",
    )
    seen = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    batch = docs.where(F.col("doc_id") % 3 != 0)
    bl = bloom_build(seen, m_bits=1 << 16, k=5)
    gated = (
        batch.select(F.md5("text").alias("digest"))
        .crossJoin(F.broadcast(bl))
        .select(bloom_might_contain(F.col("digest"), 1 << 16, 5).alias("m"))
    )
    maybe_frac = gated.where("m").count() / gated.count()
    # true dup rate of the batch vs seen is 1/5; FPR at n=101,m=65536,k=5
    # is ~1e-9 — anything beyond 25% means the gate is broken
    assert 0.15 <= maybe_frac <= 0.25, maybe_frac


def test_bloom_build_no_false_negatives_and_plan_is_jvm(spark):
    """Every inserted digest must test positive (no false negatives —
    the exactness proof's load-bearing half), and both build and gate
    stay in JVM expressions (no Python eval nodes)."""
    from opentelemetry_collector_spark.operators.dedup import (
        bloom_build,
        bloom_might_contain,
    )

    seen = spark.createDataFrame(
        [(f"item number {i}",) for i in range(137)], "v string"
    ).select(F.md5("v").alias("digest"))
    bl = bloom_build(seen, m_bits=1 << 12, k=3)
    checked = (
        seen.crossJoin(F.broadcast(bl))
        .select(bloom_might_contain(F.col("digest"), 1 << 12, 3).alias("m"))
    )
    assert checked.where(~F.col("m")).count() == 0
    plan = checked._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    # empty seen set: filter of all-zero words, every probe is definite-new
    empty = bloom_build(seen.where(F.lit(False)), m_bits=1 << 12, k=3)
    gated = (
        seen.crossJoin(F.broadcast(empty))
        .select(bloom_might_contain(F.col("digest"), 1 << 12, 3).alias("m"))
    )
    assert gated.where("m").count() == 0


def test_bloom_build_rejects_bad_m():
    from opentelemetry_collector_spark.operators.dedup import bloom_build

    with pytest.raises(ValueError):
        bloom_build(None, m_bits=100, k=3)


def test_span_dedup_clean_removes_covered_tokens(spark):
    """clean=True removes exactly the covered tokens, preserving the
    order of survivors; a fully-duplicated doc survives with empty
    text (not dropped)."""
    from opentelemetry_collector_spark.operators.dedup import span_dedup

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    df = spark.createDataFrame(
        [
            (1, shared + " one two three"),
            (2, "zzz " + shared + " qqq"),
            (3, shared),  # fully covered → empty clean_text
            (4, "all original words kept intact here none are shared"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_dedup(df, k=8, clean=True).collect()}
    assert got[1]["clean_text"] == "one two three"
    assert got[2]["clean_text"] == "zzz qqq"
    assert got[3]["clean_text"] == "" and got[3]["coverage_frac"] == 1.0
    assert got[4]["clean_text"] == "all original words kept intact here none are shared"
    # clean=False output is the measurement-only schema, unchanged
    assert "clean_text" not in span_dedup(df, k=8).columns
