"""Regression tests for boundary semantics (r2 advisor findings):

- ns→µs conversion must use integer division (ns epochs exceed 2^53, so a
  double-precision /1000 rounds sub-ms digits — pdata Timestamp is uint64
  ns, pdata/pcommon/timestamp.go:21-24);
- split_head's head/rest partition invariant must hold for NULL order keys
  (anti-join conditions never match NULL without eqNullSafe);
- AsString of a SQL NULL double stays NULL (Arrow folds nulls into NaN
  inside the UDF, so nullity is decided at the Column level);
- extract_patterns sets a named group that legitimately captures '' once
  the full pattern matches;
- connected_components refuses to return silently-wrong labels when the
  component diameter exceeds max_iters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# a ns epoch where float(ns)/1000 truncates to the WRONG microsecond
NASTY_NS = 1768037415580038837  # → 1768037415580038 µs (double div gives ...039)


def test_ns_to_micros_integer_division(spark):
    from opentelemetry_collector_spark.functions.values import ns_to_micros

    df = spark.createDataFrame([(NASTY_NS,)], "ns long")
    got = df.select(ns_to_micros(F.col("ns")).alias("us")).collect()[0]["us"]
    assert got == NASTY_NS // 1000 == 1768037415580038


def test_otlp_json_roundtrip_preserves_sub_ms_observed_ts(spark):
    from opentelemetry_collector_spark.functions.otlp_json import roundtrip
    from opentelemetry_collector_spark.schemas import LOG_RECORDS_SCHEMA

    row = {
        "url": "https://example.com/a",
        "time_unix_nano": NASTY_NS,
        "observed_ts": __import__("datetime").datetime(
            2026, 1, 10, 9, 30, 15, 580038
        ),
        "severity_number": 9,
        "severity_text": "INFO",
        "body": "b",
        "attributes": {"k": "v"},
        "trace_id": "a" * 32,
        "span_id": "b" * 16,
        "flags": 1,
        "dropped_attributes_count": 0,
        "resource": {"host": "example.com", "lang": "en"},
        "line_no": 1,
    }
    df = spark.createDataFrame([row], LOG_RECORDS_SCHEMA)
    out = roundtrip(df).collect()[0]
    assert out["observed_ts"] == row["observed_ts"]  # µs preserved exactly
    assert out["time_unix_nano"] == NASTY_NS


def test_split_head_null_keys_partition_invariant(spark):
    from opentelemetry_collector_spark.operators.batch import split_head

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 2), (None, 3), ("c", 4)],
        "url string, line_no int",
    )
    head, rest = split_head(df, 3, order_by=["url", "line_no"])
    h = head.collect()
    r = rest.collect()
    assert len(h) == 3
    # invariant: head ∪ rest == df exactly, no overlap, NULL keys included
    assert len(h) + len(r) == df.count()
    hs = {(x["url"], x["line_no"]) for x in h}
    rs = {(x["url"], x["line_no"]) for x in r}
    assert hs.isdisjoint(rs)


def test_as_string_null_double_stays_null(spark):
    from opentelemetry_collector_spark.functions.values import es6_double_col

    df = spark.createDataFrame(
        [(1.5,), (None,), (float("nan"),)], "v double"
    )
    got = [r["s"] for r in df.select(es6_double_col(F.col("v")).alias("s")).collect()]
    assert got[0] == "1.5"
    assert got[1] is None  # SQL NULL preserved
    assert got[2] == "json: unsupported value: NaN"  # genuine NaN still renders


def test_extract_patterns_sets_empty_capture_on_match(spark):
    from opentelemetry_collector_spark.operators.ottl import compile_statements

    df = spark.createDataFrame(
        [(1, {"ua": "X42"})], "id long, attributes map<string,string>"
    )
    run = compile_statements(
        ['extract_patterns(attributes["ua"], "(?<a>[a-z]*)X(?<b>[0-9]+)")']
    )
    attrs = run(df).collect()[0]["attributes"]
    # full pattern matches with group a capturing '' — it is SET, not dropped
    assert attrs["a"] == "" and attrs["b"] == "42"


def test_connected_components_nonconvergence_raises(spark):
    from opentelemetry_collector_spark.operators.dedup import connected_components

    # a path graph 0-1-2-...-9: min-label needs ~9 rounds to reach the end
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "d1 int, d2 int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)
    # and with enough rounds it converges to the single min label
    labels = connected_components(pairs, max_iters=20).collect()
    assert {r["label"] for r in labels} == {0}


# --- r3 review findings ------------------------------------------------------


def test_enrich_lang_family_overwrites_existing_keys(spark):
    """A kv log line like 'lang_family=x rtl=y' puts those keys into
    attributes before enrichment; map_concat on the duplicate would abort
    the job under the session's mapKeyDedupPolicy=EXCEPTION default.
    Enrichment must overwrite instead (ottl set() semantics)."""
    from opentelemetry_collector_spark.operators.enrich import enrich_lang_family

    records = spark.createDataFrame(
        [({"lang_family": "stale", "rtl": "maybe", "k": "v"}, ("h", "en"))],
        "attributes map<string,string>, resource struct<host:string,lang:string>",
    )
    dim = spark.createDataFrame(
        [("en", "indo-european", False)],
        "lang string, lang_family string, rtl boolean",
    )
    out = enrich_lang_family(records, dim).collect()[0]["attributes"]
    assert out == {"lang_family": "indo-european", "rtl": "false", "k": "v"}

    # lookup MISS: set(nil) is a no-op — pre-existing keys must SURVIVE,
    # not be stripped with nothing to replace them
    miss = spark.createDataFrame(
        [({"lang_family": "kept", "k": "v"}, ("h", "zz"))],
        "attributes map<string,string>, resource struct<host:string,lang:string>",
    )
    out_miss = enrich_lang_family(miss, dim).collect()[0]["attributes"]
    assert out_miss == {"lang_family": "kept", "k": "v"}


def test_cosine_zero_norm_is_null_not_error(spark):
    """ANSI mode is on: x/0.0 aborts the job. A zero-norm (all-zero)
    embedding must yield NULL cosine, not a DIVIDE_BY_ZERO."""
    from opentelemetry_collector_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] is None
    assert got[1] == pytest.approx(1.0)


def test_cosine_topk_skips_zero_norm_vectors(spark):
    """A degenerate all-zero corpus vector must neither abort the job nor
    surface as a fake rank-1 hit (NULL would sort first in the top-k
    struct sort)."""
    from opentelemetry_collector_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.8, 0.6])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(10, [1.0, 0.0])], "query_id long, embedding array<double>")
    rows = cosine_topk(emb, q, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in rows] == [1, 3]  # vec 2 skipped entirely


def test_as_string_null_bool_stays_null(spark):
    """NULL boolean → NULL string, not a fabricated 'false' (every other
    as_string branch preserves NULL)."""
    from opentelemetry_collector_spark.functions.values import as_string

    df = spark.createDataFrame([(None,), (True,), (False,)], "b boolean")
    got = [
        r["s"]
        for r in df.select(as_string(F.col("b"), T.BooleanType()).alias("s")).collect()
    ]
    assert got == [None, "true", "false"]


def test_compile_condition_rejects_trailing_tokens(spark):
    """'a == 1 b == 2' (missing 'and') must raise, not silently compile to
    just the first comparison and mis-route records."""
    from opentelemetry_collector_spark.operators.ottl import (
        OTTLSyntaxError,
        compile_condition,
    )

    with pytest.raises(OTTLSyntaxError, match="trailing"):
        compile_condition('severity_number >= 17 severity_number == 1')
    compile_condition("severity_number >= 17 and severity_number <= 20")  # still fine


def test_otlp_json_unmarshal_nullfills_uint64_overflow(spark):
    """A foreign payload with timeUnixNano above int64 max (valid proto3
    JSON uint64) null-fills the field instead of aborting the ANSI cast."""
    from opentelemetry_collector_spark.functions.otlp_json import (
        logs_to_otlp_json,
        otlp_json_to_logs,
    )
    from opentelemetry_collector_spark.schemas import LOG_RECORDS_SCHEMA

    row = {
        "url": "https://example.com/a",
        "time_unix_nano": 1700000000000000000,
        "observed_ts": __import__("datetime").datetime(2026, 1, 10, 9, 30, 15),
        "severity_number": 9,
        "severity_text": "INFO",
        "body": "b",
        "attributes": {"k": "v"},
        "trace_id": "a" * 32,
        "span_id": "b" * 16,
        "flags": 1,
        "dropped_attributes_count": 0,
        "resource": {"host": "example.com", "lang": "en"},
        "line_no": 1,
    }
    marshaled = logs_to_otlp_json(spark.createDataFrame([row], LOG_RECORDS_SCHEMA))
    poisoned = marshaled.select(
        F.regexp_replace(
            F.regexp_replace(
                "request_json", '"timeUnixNano":"1700000000000000000"',
                '"timeUnixNano":"18446744073709551615"',
            ),
            '"observedTimeUnixNano":"[0-9]+"',
            '"observedTimeUnixNano":"18446744073709551615"',
        ).alias("request_json")
    )
    out = otlp_json_to_logs(poisoned).collect()
    assert len(out) == 1
    assert out[0]["time_unix_nano"] is None
    assert out[0]["observed_ts"] is None  # ns_to_micros try_casts too
    assert out[0]["body"] == "b"
