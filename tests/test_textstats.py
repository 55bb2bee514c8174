"""Text-analysis operator tests: token stats, quality, lang-id, fingerprints."""

from __future__ import annotations

import hashlib

import pytest

from opentelemetry_collector_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
    winnowing_fingerprints,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "der hund und die katze"),
    (2, "le chat est dans la maison"),
    (3, "xyzzy qwerty plugh"),
    (4, "a1 b2! c3?"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_stats(docs):
    rows = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert rows[0]["ws_tokens"] == 6
    assert rows[0]["n_chars"] == len(DOCS[0][1])
    # "a1 b2! c3?" → a,1,b,2,!,c,3,? = 8 BPE-ish tokens
    assert rows[4]["bpe_tokens"] == 8


def test_quality_score_ranks_stopworded_text_higher(docs):
    rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert rows[0]["stopword_ratio"] > 0  # 'the' twice, 'on' once
    assert rows[3]["stopword_ratio"] == 0.0
    assert rows[0]["quality"] > rows[4]["quality"]
    assert 0.0 <= rows[0]["alpha_ratio"] <= 1.0


def test_lang_id(docs):
    rows = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert rows[0] == "en"
    assert rows[1] == "de"
    assert rows[2] == "fr"
    assert rows[3] == "und"


def test_fingerprint_md5(docs):
    rows = {r["doc_id"]: r for r in fingerprint(docs).collect()}
    assert rows[0]["md5_raw"] == hashlib.md5(DOCS[0][1].encode()).hexdigest()
    # normalization: case/extra-space insensitive
    assert rows[0]["md5_norm"] == hashlib.md5(DOCS[0][1].lower().encode()).hexdigest()


def test_winnowing_overlap_detection(spark):
    a = "abcdefghijklmnopqrstuvwxyz0123456789"
    b = "XX" + a[2:]  # large shared suffix
    c = "entirely unrelated content here!!"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["doc_id", "text"])
    rows = {r["doc_id"]: set(r["fingerprints"]) for r in winnowing_fingerprints(df).collect()}
    shared_ab = len(rows[0] & rows[1]) / len(rows[0] | rows[1])
    shared_ac = len(rows[0] & rows[2]) / len(rows[0] | rows[2])
    assert shared_ab > shared_ac
    assert shared_ab > 0.5


def test_hash_sample_deterministic_and_proportional(spark):
    import hashlib

    from opentelemetry_collector_spark.operators.textstats import hash_sample

    df = spark.createDataFrame([(i, f"doc {i}") for i in range(2000)], ["doc_id", "text"])
    s1 = {r["doc_id"] for r in hash_sample(df, 0.10).collect()}
    s2 = {r["doc_id"] for r in hash_sample(df, 0.10).collect()}
    assert s1 == s2  # reproducible across runs
    assert 120 <= len(s1) <= 280  # ~10% of 2000, hash-uniform
    # matches the reference Python computation exactly (engine-independent)
    def keep(i):
        h = int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[17:32], 16)
        return h % 10_000 < 1000
    assert s1 == {i for i in range(2000) if keep(i)}
    # a larger pct is a superset (nested samples, same salt)
    s20 = {r["doc_id"] for r in hash_sample(df, 0.20).collect()}
    assert s1 <= s20
    # different salt gives an independent sample
    other = {r["doc_id"] for r in hash_sample(df, 0.10, salt="other").collect()}
    assert other != s1


def test_repetition_signals_hand_computed(spark):
    """Repetition quality signals against a hand-computed document."""
    from opentelemetry_collector_spark.operators.textstats import repetition_signals

    # 6 words: "a b a b c a" → distinct 3, 2-grams: ab,ba,ab,bc,ca → 5 total 4 distinct
    df = spark.createDataFrame([(1, "a b a b c a")], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    assert r["n_words"] == 6
    assert r["dup_word_frac"] == round(1 - 3 / 6, 4)
    assert r["dup_2gram_frac"] == round(1 - 4 / 5, 4)
    assert r["top_word_frac"] == round(3 / 6, 4)  # 'a' appears 3×
    assert r["mean_word_len"] == 1.0
    # single-word doc: no 2-grams, fraction pinned to 0 (not an error)
    one = repetition_signals(
        spark.createDataFrame([(2, "word")], "doc_id long, text string")
    ).collect()[0]
    assert one["dup_2gram_frac"] == 0.0 and one["n_words"] == 1


def test_chunk_dedup_marks_repeated_chunks(spark):
    """Chunk-level dedup: the second doc repeating the first doc's 8-word
    run has that chunk marked duplicate; order (doc_id, chunk_idx) decides
    the canonical occurrence."""
    from opentelemetry_collector_spark.operators.dedup import chunk_dedup

    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [
            (1, run + " x1 x2 x3 x4 x5 x6 x7 x8"),
            (2, run + " y1 y2 y3 y4 y5 y6 y7 y8"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in chunk_dedup(df, k=8).collect()}
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 0
    assert got[2]["n_chunks"] == 2 and got[2]["n_dup_chunks"] == 1
    assert got[2]["dup_frac"] == 0.5
    assert 3 not in got  # no full chunk → no row (consistent with oracle)


def test_url_host_ops(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.urls import (
        host_stats,
        registered_domain,
        url_host,
    )

    df = spark.createDataFrame(
        [
            ("https://A.Sub.Example.COM/path?q=1", "hello", "en"),
            ("https://a.sub.example.com/other", "hello", "en"),
            ("http://plain.org/x", "world", "de"),
        ],
        "url string, text string, lang string",
    )
    hosts = df.select(url_host(F.col("url")).alias("h")).collect()
    assert [r["h"] for r in hosts] == ["a.sub.example.com", "a.sub.example.com", "plain.org"]
    doms = df.select(registered_domain(url_host(F.col("url"))).alias("d")).collect()
    assert [r["d"] for r in doms] == ["example.com", "example.com", "plain.org"]
    stats = {r["host"]: r for r in host_stats(df).collect()}
    assert stats["a.sub.example.com"]["n_docs"] == 2
    assert stats["a.sub.example.com"]["n_unique_texts"] == 1  # exact dup
    assert stats["a.sub.example.com"]["dup_rate"] == 0.5
    assert stats["plain.org"]["dup_rate"] == 0.0


def test_sample_stratified_deterministic_quota(spark):
    from opentelemetry_collector_spark.operators.textstats import sample_stratified

    df = spark.createDataFrame(
        [(i, ["en", "de"][i % 2]) for i in range(40)], "doc_id long, lang string"
    )
    s1 = sample_stratified(df, group_col="lang", n_per_group=5)
    rows = s1.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {len(v) for v in by_lang.values()} == {5}  # exact quota per group
    # deterministic: same corpus → same sample
    s2 = sample_stratified(df, group_col="lang", n_per_group=5)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, s2.collect()))


def test_contamination_overlap_flags_benchmark_copies(spark):
    from opentelemetry_collector_spark.operators.textstats import contamination_overlap

    bench_text = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    df = spark.createDataFrame(
        [
            (1, bench_text),                       # verbatim benchmark copy
            (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),     # clean
            (3, "x " + bench_text),                # shifted copy, partial overlap
            (4, "too short"),                      # < n words → no shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in contamination_overlap(df, bench, n=8).collect()}
    assert got[1]["contamination_frac"] == 1.0
    assert got[2]["contamination_frac"] == 0.0
    assert 0.0 < got[3]["contamination_frac"] < 1.0
    assert got[4]["n_shingles"] == 0 and got[4]["contamination_frac"] == 0.0


def test_unigram_logperplexity_hand_computed(spark):
    import math

    from opentelemetry_collector_spark.operators.textstats import unigram_logperplexity

    # corpus tokens: a,a,b,a,c → counts a=3,b=1,c=1; total=5.
    # vocab_size=2 keeps a and b (tie b/c broken by tok ASC) → c is OOV.
    df = spark.createDataFrame([(0, "a a b"), (1, "a c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logperplexity(df, vocab_size=2).collect()}
    lp_a = round(math.log2(3 / 5), 9)
    lp_b = round(math.log2(1 / 5), 9)
    oov = round(math.log2(0.5 / 5), 9)
    bits0 = -(lp_a + lp_a + lp_b) / 3
    bits1 = -(lp_a + oov) / 2
    assert got[0]["n_tokens"] == 3
    assert got[0]["bits_per_token"] == round(bits0, 4)
    assert got[0]["perplexity"] == round(2.0**bits0, 4)
    assert got[1]["bits_per_token"] == round(bits1, 4)
    # a doc full of OOV gibberish scores strictly worse than in-vocab text
    assert got[1]["bits_per_token"] > got[0]["bits_per_token"]


def test_unigram_logperplexity_foreign_model_and_empty(spark):
    from opentelemetry_collector_spark.operators.textstats import unigram_logperplexity

    df = spark.createDataFrame([(0, "a z")], "doc_id long, text string")
    model = spark.createDataFrame(
        [("a", -1.0), ("b", -3.0)], "tok string, logp double"
    )
    # foreign model without an explicit floor: OOV = min(logp) - 1 = -4
    got = unigram_logperplexity(df, model=model).collect()[0]
    assert got["bits_per_token"] == round((1.0 + 4.0) / 2, 4)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_logperplexity(empty).count() == 0


def test_redact_pii(spark):
    from opentelemetry_collector_spark.operators.redact import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server at 10.0.255.3 and 192.168.1.1 up"),
            (3, "call +44 (020) 7946-0958 or +1 555-012-3456"),
            (4, "nothing here in 2024, not 1.2 nor v1.2.3"),
            (5, "u@10.0.0.1.example.net mixed"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> now"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[2]["clean_text"] == "server at <IP> and <IP> up"
    assert out[2]["n_ips"] == 2
    assert out[3]["clean_text"] == "call <PHONE> or <PHONE>"
    assert out[3]["n_phones"] == 2
    assert out[4]["clean_text"] == out[4]["text"]  # prose digits untouched
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)
    # email redacted FIRST, so its IP-shaped host never leaks an <IP> token
    assert out[5]["clean_text"] == "<EMAIL> mixed"


def test_filter_blocked_hosts_broadcast_anti(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.urls import filter_blocked_hosts

    pages = spark.createDataFrame(
        [
            ("https://spam.example.com/a", "x", "en"),
            ("https://Spam.example.com/b", "y", "en"),
            ("https://good.example.org/c", "z", "de"),
        ],
        "url string, text string, lang string",
    )
    blocked = spark.createDataFrame([("spam.example.com",)], "host string")
    kept = filter_blocked_hosts(pages, blocked)
    rows = kept.collect()
    assert [r["host"] for r in rows] == ["good.example.org"]
    assert set(kept.columns) == {"url", "text", "lang", "host"}
    # scale contract: anti join broadcasts the blocklist; the page side
    # must not hash-shuffle
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_ccnet_perplexity_buckets_tiers_are_ordered(spark):
    from opentelemetry_collector_spark.operators.textstats import (
        ccnet_perplexity_buckets,
    )

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ccnet_perplexity_buckets(docs).collect()
    assert len(out) == docs.where(F.col("text").isNotNull()).count()
    per_lang: dict[str, dict[str, list[float]]] = {}
    for r in out:
        per_lang.setdefault(r["lang"], {}).setdefault(r["ppl_bucket"], []).append(
            r["bits_per_token"]
        )
    for lang, buckets in per_lang.items():
        # all three tiers populated, and strictly ordered by perplexity:
        # head (≤ c1) < middle (≤ c2) < tail
        assert set(buckets) == {"head", "middle", "tail"}, lang
        assert max(buckets["head"]) <= min(buckets["middle"])
        assert max(buckets["middle"]) <= min(buckets["tail"])
        # tertile cuts put roughly a third in each tier
        n = sum(len(v) for v in buckets.values())
        for tier in ("head", "middle", "tail"):
            assert len(buckets[tier]) >= n // 4


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from opentelemetry_collector_spark.operators.textstats import tfidf_top_terms

    # 4 docs, 2 sources; 'rare' appears in 1 of 4 docs, only in s1
    df = spark.createDataFrame(
        [
            (0, "s1", "common rare common"),
            (1, "s1", "common common"),
            (2, "s2", "common other"),
            (3, "s2", "other other common"),
        ],
        "doc_id long, source string, text string",
    )
    out = {(r["source"], r["rank"]): r for r in tfidf_top_terms(df, k=2).collect()}
    idf_rare = round(math.log(4 / 1), 9)
    idf_other = round(math.log(4 / 2), 9)
    # s1: rare tf=1 score≈1.386 beats common (idf=0); s2: other tf=3
    r = out[("s1", 1)]
    assert r["term"] == "rare" and r["tf"] == 1
    assert r["score"] == round(round(1 * idf_rare, 9), 4)
    assert out[("s1", 2)]["term"] == "common"  # idf 0 ⇒ score 0
    r2 = out[("s2", 1)]
    assert r2["term"] == "other" and r2["tf"] == 3
    assert r2["score"] == round(round(3 * idf_other, 9), 4)
    # exactly k rows per source, ranks contiguous
    assert {k for k in out} == {("s1", 1), ("s1", 2), ("s2", 1), ("s2", 2)}


def test_canonicalize_url(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.urls import canonicalize_url

    cases = [
        # (input, expected)
        ("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=1&a=2#frag",
         "https://www.example.com/a/b?a=2&z=1"),
        ("http://host.example.com:80", "http://host.example.com/"),
        ("http://host.example.com:8080/p", "http://host.example.com:8080/p"),
        ("https://h.example.org/p?gclid=abc&fbclid=d&ref=rss",
         "https://h.example.org/p"),
        ("https://h.example.org/p?b=2&a=1&a=0",
         "https://h.example.org/p?a=0&a=1&b=2"),
        ("https://h.example.org/#only-frag", "https://h.example.org/"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_enrich_asof_picks_version_active_at_event_time(spark):
    from opentelemetry_collector_spark.operators.enrich import enrich_asof

    recs = spark.createDataFrame(
        [(0, "a", 5), (1, "a", 15), (2, "a", 25), (3, "b", 10), (4, "a", 1), (5, "zz", 50)],
        "rid long, k string, ts long",
    )
    dim = spark.createDataFrame(
        [("a", 2, "a-v1"), ("a", 10, "a-v2"), ("a", 20, "a-v3"), ("b", 0, "b-v1")],
        "k string, valid_from long, label string",
    )
    out = {r["rid"]: r["label"] for r in enrich_asof(recs, dim, key="k", ts_col="ts").collect()}
    assert out == {0: "a-v1", 1: "a-v2", 2: "a-v3", 3: "b-v1", 4: None, 5: None}
    # exactly one output row per record (the interval join can't fan out)
    assert enrich_asof(recs, dim, key="k", ts_col="ts").count() == 6
    # plan: dim broadcast, fact never shuffles
    plan = (
        enrich_asof(recs, dim, key="k", ts_col="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_char_entropy_hand_computed(spark):
    import math

    from opentelemetry_collector_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [(0, "aab"), (1, "abab"), (2, "aaaa"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    e_aab = -(
        round((2 / 3) * math.log2(2 / 3), 9) + round((1 / 3) * math.log2(1 / 3), 9)
    )
    assert got[0]["entropy_bits_per_char"] == round(e_aab, 4)
    assert got[1]["entropy_bits_per_char"] == 1.0
    # zero entropy, never -0.0
    assert str(got[2]["entropy_bits_per_char"]) == "0.0"
    assert got[3]["entropy_bits_per_char"] == 0.0 and got[3]["n_chars"] == 0
    assert got[4]["entropy_bits_per_char"] == 0.0 and got[4]["n_chars"] == 0


def test_mixture_weights_hand_computed(spark):
    from opentelemetry_collector_spark.operators.textstats import mixture_weights

    df = spark.createDataFrame(
        [(0, "a b c", "x"), (1, "d e", "x"), (2, "f g h i j", "y")],
        "doc_id long, text string, source string",
    )
    # x: 5 tokens (share .5), y: 5 tokens (share .5)
    got = {r["source"]: r for r in mixture_weights(df, {"x": 0.8, "y": 0.2}).collect()}
    assert got["x"]["n_tokens"] == 5 and got["x"]["share"] == 0.5
    assert got["x"]["weight"] == round(0.8 / 0.5, 4)
    assert got["y"]["weight"] == round(0.2 / 0.5, 4)
    # a group absent from the target gets weight 0 (dropped at sampling)
    got2 = mixture_weights(df, {"x": 1.0}).collect()
    assert {r["source"]: r["weight"] for r in got2} == {"x": 2.0, "y": 0.0}


def test_pack_sequences_contiguous_and_budgeted(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.textstats import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=100, partitions=7).orderBy("doc_id").collect()
    off = 0
    for r in out:
        # the token stream is contiguous in id order regardless of how
        # the range partitioner split the ids
        assert r["start_offset"] == off
        assert r["pack_id"] == off // 100
        off += r["n_tokens"]
    assert out[-1]["pack_id"] > 0
    # determinism across partition widths
    again = pack_sequences(docs, budget=100, partitions=3).orderBy("doc_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


# ---------------------------------------------------------------------------
# merged signal operators ≡ their standalone constituents
# ---------------------------------------------------------------------------


def test_text_signals_matches_individual_operators(docs):
    from opentelemetry_collector_spark.operators.textstats import text_signals

    merged = {r["doc_id"]: r.asDict() for r in text_signals(docs).collect()}
    for op in (token_stats, quality_score, lang_id, fingerprint):
        for r in op(docs).collect():
            for k, v in r.asDict().items():
                if k == "doc_id":
                    continue
                assert merged[r["doc_id"]][k] == v, (op.__name__, k)


def test_shuffle_shards_deterministic_permutation(spark):
    import hashlib

    from opentelemetry_collector_spark.operators.textstats import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(df, n_shards=8).collect()
    }
    assert len(got) == 500
    # positions are contiguous 0..n-1 within every shard
    by_shard = {}
    for s, p in got.values():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) <= set(range(8))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))
    # engine-independent: matches the reference Python permutation exactly
    def key(i):
        return int(hashlib.md5(f"0#{i}".encode()).hexdigest()[17:32], 16)
    for s in by_shard:
        want = sorted((i for i in range(500) if key(i) % 8 == s), key=lambda i: (key(i), i))
        assert [i for i, (sh, p) in sorted(got.items(), key=lambda kv: kv[1][1]) if sh == s] == want
    # different parallelism → identical assignment (resumable manifests)
    again = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(df.repartition(3), n_shards=8).collect()
    }
    assert again == got
    # a different seed is an independent permutation
    other = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(df, n_shards=8, seed=1).collect()
    }
    assert other != got
    with pytest.raises(ValueError):
        shuffle_shards(df, n_shards=0)


def test_shard_manifest_detects_order_and_membership(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.textstats import (
        shard_manifest,
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    sharded = shuffle_shards(df, n_shards=4)
    m1 = {
        r["shard_id"]: (r["n_docs"], r["manifest_md5"])
        for r in shard_manifest(sharded).collect()
    }
    # a re-run (restarted export) reproduces the manifest exactly
    m2 = {
        r["shard_id"]: (r["n_docs"], r["manifest_md5"])
        for r in shard_manifest(shuffle_shards(df, n_shards=4)).collect()
    }
    assert m1 == m2
    assert sum(n for n, _ in m1.values()) == 100
    # moving the first doc of shard 0 to the end changes shard 0's digest
    # and ONLY shard 0's (order is part of the contract)
    first = sharded.where((F.col("shard_id") == 0) & (F.col("pos_in_shard") == 0))
    moved_id = first.collect()[0]["doc_id"]
    reordered = sharded.withColumn(
        "pos_in_shard",
        F.when(F.col("doc_id") == moved_id, F.lit(10_000)).otherwise(
            F.col("pos_in_shard")
        ),
    )
    m3 = {
        r["shard_id"]: (r["n_docs"], r["manifest_md5"])
        for r in shard_manifest(reordered).collect()
    }
    assert m3[0] != m1[0] and all(m3[s] == m1[s] for s in m1 if s != 0)


def test_boilerplate_lines_host_scoped(spark):
    from opentelemetry_collector_spark.operators.textstats import boilerplate_lines

    nav = "Nav | Home | About"
    rows = [
        ("h1", 1, nav + "\ncontent one\n© h1"),
        ("h1", 2, nav + "\ncontent two\n© h1"),
        ("h1", 3, nav + "\ncontent three\n© h1\nextra"),
        ("h2", 4, nav + "\nother host keeps its nav"),
    ]
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    got = {r["doc_id"]: r for r in boilerplate_lines(df).collect()}
    # nav + © ride 100% of h1's 3 pages → stripped; per-page content and
    # the 1/3-page 'extra' line (< 50%) survive in original order
    assert got[1]["clean_text"] == "content one"
    assert got[1]["n_lines"] == 3 and got[1]["n_boiler_lines"] == 2
    assert got[3]["clean_text"] == "content three\nextra"
    # single-page host: below min_pages, nothing stripped
    assert got[4]["clean_text"] == rows[3][2] and got[4]["n_boiler_lines"] == 0
    # a page that is ALL boilerplate survives as an empty page, not a lost row
    rows2 = [("h3", 10, nav), ("h3", 11, nav)]
    got2 = {
        r["doc_id"]: r
        for r in boilerplate_lines(
            spark.createDataFrame(rows2, "host string, doc_id long, text string")
        ).collect()
    }
    assert got2[10]["clean_text"] == "" and got2[10]["n_boiler_lines"] == 1
    # exactly-2-page host with UNIQUE content: the fraction threshold
    # alone is n_pages*0.5 = 1.0, which every single-page line meets —
    # the ≥2-shared-pages floor must keep unique lines out of the
    # boilerplate set (regression: both pages used to come back empty)
    rows3 = [("h4", 20, "alpha\nbravo"), ("h4", 21, "charlie\ndelta")]
    got3 = {
        r["doc_id"]: r
        for r in boilerplate_lines(
            spark.createDataFrame(rows3, "host string, doc_id long, text string")
        ).collect()
    }
    assert got3[20]["clean_text"] == "alpha\nbravo"
    assert got3[20]["n_boiler_lines"] == 0
    assert got3[21]["clean_text"] == "charlie\ndelta"


def test_encoding_signals_hand_computed(spark):
    from opentelemetry_collector_spark.operators.textstats import encoding_signals

    rows = [
        (1, "plain ascii text."),
        (2, "CafÃ© on the corner"),  # latin-1 double-decode: 1 mojibake hit
        (3, "itâ€™s â€œquotedâ€"),  # cp1252 smart quotes
        (4, "bad�decode�"),  # two replacement chars
        (5, "ctrl\u0007here\u0000too"),  # BEL + NUL (C0, not \t\n\r)
        (6, "tabs\tand\nnewlines\rok"),  # whitelisted controls stay clean
        (7, "français récit déjà"),  # legit non-ascii: low ratio, still ok
        (8, ""),  # empty: fully ascii by definition
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in encoding_signals(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert got[1]["encoding_ok"] and got[1]["ascii_ratio"] == 1.0
    assert got[2]["mojibake_seqs"] == 1 and not got[2]["encoding_ok"]
    # "â€™" and "â€œ" each match; the bare "â€" + U+009D trailer matches
    # the [ÂÃ] form zero times (â is not a lead char) but U+009D is a C1
    # char — outside CTRL_CHAR_RE (C0+DEL), so it only lowers ascii_ratio
    assert got[3]["mojibake_seqs"] == 2 and got[3]["ctrl_chars"] == 0
    assert got[4]["repl_chars"] == 2 and not got[4]["encoding_ok"]
    assert got[5]["ctrl_chars"] == 2 and got[5]["repl_chars"] == 0
    assert got[6]["encoding_ok"] and got[6]["ctrl_chars"] == 0
    assert got[7]["encoding_ok"] and got[7]["mojibake_seqs"] == 0
    assert got[7]["ascii_ratio"] < 1.0
    assert got[8]["encoding_ok"] and got[8]["ascii_ratio"] == 1.0
    # ratio is exact: doc 2 has 2 non-ascii chars (Ã, ©) in 19 chars
    assert got[2]["ascii_ratio"] == round((19 - 2) / 19, 4)


def test_encoding_block_rides_text_signals(docs):
    from opentelemetry_collector_spark.operators.textstats import (
        encoding_signals,
        text_signals,
    )

    fused = {r["doc_id"]: r.asDict() for r in text_signals(docs).collect()}
    for r in encoding_signals(docs).collect():
        for k, v in r.asDict().items():
            if k in ("doc_id", "n_chars"):
                continue
            assert fused[r["doc_id"]][k] == v, k


def test_doc_signals_matches_individual_operators(docs):
    from opentelemetry_collector_spark.operators.textstats import (
        char_entropy,
        doc_signals,
        repetition_signals,
    )

    merged = {r["doc_id"]: r.asDict() for r in doc_signals(docs).collect()}
    for op in (repetition_signals, char_entropy):
        for r in op(docs).collect():
            for k, v in r.asDict().items():
                if k == "doc_id":
                    continue
                assert merged[r["doc_id"]][k] == v, (op.__name__, k)


# ---------------------------------------------------------------------------
# merge-table BPE: columnar replace-chain ≡ canonical encoder loop
# ---------------------------------------------------------------------------


def _bpe_reference(word: str, merges) -> list[str]:
    """Canonical BPE encode: repeatedly merge ALL occurrences of the
    lowest-rank pair present (left-to-right, non-overlapping)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        best = min((ranks[p] for p in pairs if p in ranks), default=None)
        if best is None:
            break
        a, b = merges[best]
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_encode_matches_canonical_reference(spark):
    from opentelemetry_collector_spark.operators.textstats import (
        DEFAULT_BPE_MERGES,
        bpe_encode,
    )

    rows = [
        (0, "the theatre then"),          # th/the chains
        (1, "standing understanding"),    # st/an/and/in/ing interplay
        (2, "aaaa bbbb erer ananan"),     # overlapping same-pair runs
        (3, "to tot tout outer"),         # t+o, o+u chains
        (4, ""),                          # empty text
        (5, "x"),                         # single char
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bpe_encode(df).collect()}
    for doc_id, text in rows:
        words = [w for w in text.strip().split(" ") if w]
        ref = [_bpe_reference(w, DEFAULT_BPE_MERGES) for w in words]
        assert got[doc_id]["n_words"] == len(words)
        assert got[doc_id]["bpe_tokens"] == sum(len(t) for t in ref), (doc_id, ref)
        if words:
            assert got[doc_id]["enc_head"] == "|".join(ref[0]), (doc_id, ref[0])


def test_bpe_feeds_pack_sequences(spark):
    # the BPE token count composes with the packing operator: same
    # two-phase cumsum, counts swapped in upstream
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.textstats import (
        bpe_encode,
        pack_sequences,
    )

    rows = [(i, "the cat and the hat " * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df).collect()}
    packed = pack_sequences(
        df.join(
            bpe_encode(df).select("doc_id", F.col("bpe_tokens")), "doc_id"
        ).select("doc_id", F.col("bpe_tokens").cast("string").alias("text")),
        budget=64,
    )
    # offsets over a 1-token-per-"word" text equal a running doc index —
    # instead verify the packing invariant directly on the real counts:
    # start_offset is the exclusive prefix sum of n_tokens in doc order
    out = pack_sequences(df, budget=64).orderBy("doc_id").collect()
    run = 0
    for r in out:
        assert r["start_offset"] == run
        assert r["pack_id"] == run // 64
        run += r["n_tokens"]
    assert packed.count() == len(rows)
    assert counts[5] > counts[0]


def test_apply_mixture_copy_counts_track_weights(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.textstats import (
        apply_mixture,
        mixture_weights,
    )

    rows = [(i, "en" if i % 4 else "de", "w " * 20) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    target = {"de": 0.8, "en": 0.2}
    w = {r["lang"]: r["weight"] for r in
         mixture_weights(df, target, group_col="lang").collect()}
    out = apply_mixture(df, target, group_col="lang")
    per = {
        r["lang"]: (r["docs"], r["copies"])
        for r in out.groupBy("lang")
        .agg(F.count("*").alias("docs"), F.sum("n_copies").alias("copies"))
        .collect()
    }
    for lang, (docs, copies) in per.items():
        # expected copies = weight × docs, within Bernoulli noise
        assert abs(copies - w[lang] * docs) <= 0.15 * docs + 2, (lang, copies)
    # determinism: the salted draw gives identical counts on re-run
    again = apply_mixture(df, target, group_col="lang")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # a group outside the target drops to zero copies
    df2 = df.union(spark.createDataFrame([(9999, "zz", "x y z")], df.columns))
    zz = apply_mixture(df2, target, group_col="lang").where(F.col("lang") == "zz")
    assert [r["n_copies"] for r in zz.collect()] == [0]


def test_gopher_filter_reasons_and_keep(spark):
    from opentelemetry_collector_spark.operators.textstats import (
        doc_signals,
        gopher_filter,
    )

    clean = " ".join(f"word{i}xy" for i in range(60))  # 60 distinct words
    repeated = " ".join(["spam"] * 80)  # dup words + top-word + short words
    short = "tiny doc"
    docs = spark.createDataFrame(
        [(1, clean), (2, repeated), (3, short)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_filter(doc_signals(docs)).collect()}
    assert out[1]["keep"] and out[1]["fail_reasons"] == ""
    assert not out[2]["keep"]
    reasons2 = out[2]["fail_reasons"].split(",")
    assert "dup_words" in reasons2 and "top_word" in reasons2
    assert not out[3]["keep"]
    assert "word_count" in out[3]["fail_reasons"].split(",")


def test_normalize_text_canonicalizes_for_dedup(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.dedup import dedup_exact
    from opentelemetry_collector_spark.operators.textstats import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),       # same after normalization
            (3, "HELLO --- WORLD??"), # same after normalization
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    norm = docs.select("doc_id", normalize_text(F.col("text")).alias("text"))
    vals = {r["doc_id"]: r["text"] for r in norm.collect()}
    assert vals[1] == vals[2] == vals[3] == "hello world"
    out = {r["doc_id"]: r["n_copies"] for r in dedup_exact(norm).collect()}
    assert out == {1: 3, 4: 1}


def test_bigram_logperplexity_hand_computed(spark):
    """JM-interpolated bigram LM against a hand-replicated computation."""
    import math

    from opentelemetry_collector_spark.operators.textstats import (
        bigram_logperplexity,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logperplexity(docs).collect()}

    lam, om = 0.7, 1.0 - 0.7
    pu = {"a": 3 / 6, "b": 2 / 6, "c": 1 / 6}
    pb = {("a", "b"): 2 / 3, ("b", "a"): 1.0, ("a", "c"): 1 / 3}

    def lp(w, prev):
        p = lam * pb.get((prev, w), 0.0) + om * pu[w]
        return round(math.log2(p), 9)

    d1 = [lp("a", None), lp("b", "a"), lp("a", "b"), lp("b", "a")]
    assert out[1]["n_tokens"] == 4
    assert out[1]["bigram_bits"] == pytest.approx(round(-sum(d1) / 4, 4), abs=1e-4)
    d2 = [lp("a", None), lp("c", "a")]
    assert out[2]["bigram_bits"] == pytest.approx(round(-sum(d2) / 2, 4), abs=1e-4)
    # fluent text (seen bigrams) scores lower bits than shuffled text
    assert out[1]["bigram_bits"] < out[2]["bigram_bits"]


def test_bigram_lm_unk_mapping_bounds_the_model(spark):
    from opentelemetry_collector_spark.operators.textstats import (
        bigram_logperplexity,
    )

    # vocab_size=2 → only the two most frequent tokens stay; the rest
    # map to <unk> BEFORE counting, so rare tokens share statistics
    docs = spark.createDataFrame(
        [(1, "x x x y y z1"), (2, "x y z2"), (3, "z3 z4")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logperplexity(docs, vocab_size=2).collect()}
    assert set(out) == {1, 2, 3}
    # doc3 is all-<unk>: both tokens share the <unk> stats, finite score
    assert out[3]["bigram_bits"] > 0


def test_robots_rules_and_enforcement(spark):
    """RFC 9309 prefix subset: * group extraction (consecutive ua lines
    share a group), comment stripping, longest-match allow-vs-disallow."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.urls import (
        apply_robots,
        robots_star_rules,
    )

    txt = (
        "User-agent: googlebot\n"
        "Disallow: /g\n"
        "\n"
        "User-agent: friendly\n"
        "User-agent: *\n"          # consecutive ua lines: one group
        "Disallow: /private\n"
        "Allow: /private/ok  # but this subtree is fine\n"
        "Disallow:\n"              # empty = allow-all, dropped
        "\n"
        "User-agent: other\n"
        "Disallow: /\n"
    )
    robots = spark.createDataFrame([("site.com", txt), ("open.org", "# nothing\n")],
                                   "host string, robots_txt string")
    rules = robots_star_rules(robots)
    got = {(r["host"], r["allow"], r["prefix"]) for r in rules.collect()}
    assert got == {
        ("site.com", False, "/private"),
        ("site.com", True, "/private/ok"),
    }

    pages = spark.createDataFrame(
        [
            ("https://site.com/public/a",),
            ("https://site.com/private/x",),
            ("https://site.com/private/ok/y",),
            ("https://site.com/g/googlebot-only",),  # * group doesn't block /g
            ("https://open.org/anything",),
        ],
        "url string",
    )
    out = {r["url"]: r["robots_blocked"] for r in apply_robots(pages, rules).collect()}
    assert out["https://site.com/public/a"] is False
    assert out["https://site.com/private/x"] is True
    assert out["https://site.com/private/ok/y"] is False  # longer Allow wins
    assert out["https://site.com/g/googlebot-only"] is False
    assert out["https://open.org/anything"] is False


def test_c4_line_filter_rules(spark):
    from opentelemetry_collector_spark.operators.textstats import c4_line_filter

    good = (
        "This is a proper sentence with enough words.\n"
        "Another complete line that ends with a question mark?\n"
        'A third quoted line with plenty of words here."\n'
        "too short.\n"                       # < 5 words → dropped
        "no terminal punctuation at all"     # no punct → dropped
    )
    docey = {
        1: good,
        2: "function f() { return 1; }\nA fine sentence with enough words.",
        3: "Lorem Ipsum dolor sit amet and then some.\nMore words in this line here.",
        4: "One good sentence with five words.\nonly line kept here today.",
    }
    df = spark.createDataFrame(list(docey.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 3
    assert out[1]["doc_ok"] is True
    assert out[1]["clean_text"].count("\n") == 2
    assert out[2]["doc_ok"] is False  # brace page
    assert out[3]["doc_ok"] is False  # lorem ipsum page
    assert out[4]["doc_ok"] is False  # only 2 kept lines < 3
    assert out[4]["n_kept"] == 2


def test_badwords_filter_whole_token_case_insensitive(spark):
    from opentelemetry_collector_spark.operators.textstats import badwords_filter

    docs = {
        1: "a perfectly clean page of text",
        2: "contains BlockedAlpha mid sentence",          # case-insensitive hit
        3: "embblockedalphadded is not a whole token",    # substring must NOT fire
        4: "blockedalpha and blockedbeta, blockedalpha",  # distinct count = 2
        5: "punct-wrapped (blockedbeta) fires too",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_bad_terms"], r["ok"])
        for r in badwords_filter(df, ["blockedalpha", "blockedbeta"]).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (1, False)
    assert out[3] == (0, True)
    assert out[4] == (2, False)
    assert out[5] == (1, False)


# ---------------------------------------------------------------------------
# BPE: Arrow (canonical) path ≡ columnar path; columnar refuses big tables
# ---------------------------------------------------------------------------


def _valid_random_merges(rng, alphabet: str, n: int) -> tuple:
    """A VALID merge table, constructed like training constructs one:
    every rule's constituents are single chars or outputs of EARLIER
    rules (an arbitrary random table can legally diverge between the
    pass-per-rank and canonical forms; a trained table cannot)."""
    tokens = list(alphabet)
    merges, seen = [], set()
    while len(merges) < n:
        a, b = rng.choice(tokens), rng.choice(tokens)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        merges.append((a, b))
        tokens.append(a + b)
    return tuple(merges)


def _bpe_rows(spark):
    rows = [
        (0, "the theatre then standing"),
        (1, "aaaa bbbb erer ananan outer"),
        (2, ""),
        (3, "x"),
        (4, "  padded   runs  of   spaces  "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bpe_arrow_matches_columnar_default_table(spark):
    from opentelemetry_collector_spark.operators.textstats import (
        DEFAULT_BPE_MERGES,
        bpe_encode,
        bpe_encode_arrow,
    )

    df = _bpe_rows(spark)
    col = {r["doc_id"]: r.asDict() for r in bpe_encode(df).collect()}
    arr = {
        r["doc_id"]: r.asDict()
        for r in bpe_encode_arrow(df, DEFAULT_BPE_MERGES).collect()
    }
    assert col == arr


def test_bpe_columnar_refuses_production_table_and_auto_dispatches(spark):
    import random

    import pytest as _pytest

    from opentelemetry_collector_spark.operators.textstats import (
        _COLUMNAR_MAX_MERGES,
        bpe_canonical_word,
        bpe_encode,
    )

    rng = random.Random(7)
    big = _valid_random_merges(rng, "abcdefghijklmnopqrstuvwxyz", 200)
    assert len(big) > _COLUMNAR_MAX_MERGES
    df = _bpe_rows(spark)
    with _pytest.raises(ValueError, match="columnar BPE caps"):
        bpe_encode(df, big, engine="columnar").collect()
    # auto dispatch takes the Arrow path and matches the canonical
    # reference computed driver-side
    got = {r["doc_id"]: r for r in bpe_encode(df, big, engine="auto").collect()}
    ranks = {p: i for i, p in enumerate(big)}
    for doc_id, text in [(r["doc_id"], r["text"]) for r in df.collect()]:
        words = [w for w in text.strip(" ").split() if w]
        encs = [bpe_canonical_word(w, ranks) for w in words]
        assert got[doc_id]["n_words"] == len(encs)
        assert got[doc_id]["bpe_tokens"] == sum(len(e) for e in encs)


def test_bpe_property_paths_agree_on_random_valid_tables(spark):
    import random

    from opentelemetry_collector_spark.operators.textstats import (
        bpe_encode,
        bpe_encode_arrow,
    )

    rng = random.Random(1234)
    for trial in range(4):
        merges = _valid_random_merges(rng, "abcde", rng.randint(1, 24))
        words = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            [(i, " ".join(words[: i + 1])) for i in range(8)],
            ["doc_id", "text"],
        )
        col = {r["doc_id"]: r.asDict() for r in bpe_encode(df, merges).collect()}
        arr = {
            r["doc_id"]: r.asDict()
            for r in bpe_encode_arrow(df, merges).collect()
        }
        assert col == arr, (trial, merges)


def test_chunk_documents_sliding_windows(spark):
    """Chunks start every stride tokens, share `overlap` tokens with the
    previous chunk, and the final chunk clips to the doc end; a doc
    shorter than one stride yields exactly one chunk; overlap ≥ chunk
    raises."""
    import pytest as _pytest

    from opentelemetry_collector_spark.operators.textstats import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, toks), (2, "a b"), (3, None)], "doc_id long, text string"
    )
    rows = sorted(
        map(tuple, chunk_documents(df, chunk_tokens=4, overlap=1).collect())
    )
    assert rows == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (1, 3, 9, 1, "t9"),
        (2, 0, 0, 2, "a b"),
    ]
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_bm25_topk_hand_computed(spark):
    import math

    import pytest as _pytest

    from opentelemetry_collector_spark.operators.textstats import bm25_topk

    df = spark.createDataFrame(
        [
            (0, "spark join spark"),          # tf(spark)=2, tf(join)=1, dl=3
            (1, "window window window join"),  # tf(window)=3, tf(join)=1, dl=4
            (2, "other words only here"),      # no query term → excluded
            (3, "spark"),                      # tf(spark)=1, dl=1
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            bm25_topk(df, ["spark", "window", "join"], k=10).collect()}
    assert 2 not in rows  # zero-score docs excluded
    n, avgdl, k1, b = 4.0, (3 + 4 + 4 + 1) / 4.0, 1.2, 0.75

    def idf(dfreq):
        return round(math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5)), 9)

    def ts(tf, dl, dfreq):
        return idf(dfreq) * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    # df: spark→2 docs, window→1, join→2
    exp = {
        0: ts(2, 3, 2) + ts(1, 3, 2),
        1: ts(3, 4, 1) + ts(1, 4, 2),
        3: ts(1, 1, 2),
    }
    for d, s in exp.items():
        assert rows[d]["score"] == round(round(s, 9), 4)
    # ranks follow the 9-dp score ordering, contiguous from 1
    got = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert sorted((r["score"] for r in got), reverse=True) == [r["score"] for r in got]
    with _pytest.raises(ValueError):
        bm25_topk(df, [])
    with _pytest.raises(ValueError):
        bm25_topk(df, ["spark", "spark"])


def test_bm25_topk_limits_and_ties(spark):
    from opentelemetry_collector_spark.operators.textstats import bm25_topk

    # 12 identical docs: identical scores, rank ties broken by doc_id ASC,
    # k caps the result
    df = spark.createDataFrame(
        [(i, "alpha beta") for i in range(12)], "doc_id long, text string"
    )
    got = bm25_topk(df, ["alpha"], k=5).collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]
    assert len({r["score"] for r in got}) == 1
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
