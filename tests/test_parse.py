"""Parse operator tests — unit + golden-style invariants
(batch_processor_test.go / otlptext golden analog, SURVEY.md §5)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.fixtures import synthesize_pages
from opentelemetry_collector_spark.fixtures.pages import generate_pages_pandas
from opentelemetry_collector_spark.operators.parse import explode_lines, parse_pages
from opentelemetry_collector_spark.schemas import LOG_RECORDS_SCHEMA

N = 600


@pytest.fixture(scope="module")
def pages(spark):
    return synthesize_pages(spark, N).persist()


@pytest.fixture(scope="module")
def records(spark, pages):
    return parse_pages(pages, engine="sql").persist()


def test_schema(records):
    got = [(f.name, f.dataType.simpleString()) for f in records.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in LOG_RECORDS_SCHEMA.fields]
    assert got == want


def test_byte_identical_body_per_url(spark, records):
    """Per-row invariant (BASELINE.json): reassembling bodies by (url,
    line_no) must reproduce the source text byte-identically."""
    rebuilt = (
        records.groupBy("url")
        .agg(F.concat_ws("\n", F.array_sort(F.collect_list(F.struct("line_no", "body")))
             .getField("body")).alias("rebuilt"))
    )
    src = synthesize_pages(spark, N).select("url", "text").where(F.length("text") > 0)
    joined = src.join(rebuilt, "url", "left")
    bad = joined.where(
        F.col("rebuilt").isNull() | (F.encode("rebuilt", "utf-8") != F.encode("text", "utf-8"))
    )
    assert bad.count() == 0


def test_line_numbers_contiguous(records):
    chk = records.groupBy("url").agg(
        F.count("*").alias("n"), (F.max("line_no") + 1).alias("m")
    )
    assert chk.where(F.col("n") != F.col("m")).count() == 0


def test_empty_pages_produce_no_records(records):
    # ids divisible by 97 have empty text
    empties = [f"p/{i}" for i in range(0, N, 97)]
    got = records.where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") % 97 == 0
    ).count()
    assert got == 0 and len(empties) > 0


def test_severity_mapping(records):
    sev = records.where(F.col("severity_text") != "").select("severity_text", "severity_number")
    bad = sev.where(
        ~(
            ((F.col("severity_text") == "TRACE") & (F.col("severity_number") == 1))
            | ((F.col("severity_text") == "DEBUG") & (F.col("severity_number") == 5))
            | ((F.col("severity_text") == "INFO") & (F.col("severity_number") == 9))
            | ((F.col("severity_text") == "WARN") & (F.col("severity_number") == 13))
            | ((F.col("severity_text") == "ERROR") & (F.col("severity_number") == 17))
            | ((F.col("severity_text") == "FATAL") & (F.col("severity_number") == 21))
        )
    )
    assert bad.count() == 0


def test_access_attributes(records):
    acc = records.where(F.element_at("attributes", "method").isNotNull())
    assert acc.count() > 0
    bad = acc.where(
        ~F.element_at("attributes", "status").rlike(r"^\d{3}$")
        | ~F.element_at("attributes", "ip").rlike(r"^\d+\.\d+\.\d+\.\d+$")
        | (F.col("time_unix_nano") <= 0)
    )
    assert bad.count() == 0


def test_applog_trace_ids(records):
    app = records.where(F.col("severity_number") > 0)
    bad = app.where(~F.col("trace_id").rlike("^[0-9a-f]{32}$") | ~F.col("span_id").rlike("^[0-9a-f]{16}$"))
    assert bad.count() == 0


def test_kv_attributes(records):
    kv = records.where(F.element_at("attributes", "key1").isNotNull())
    assert kv.count() > 0
    bad = kv.where(~F.element_at("attributes", "key2").startswith("quoted val"))
    assert bad.count() == 0


def test_noise_falls_through(records):
    noise = records.where(F.col("body").startswith("free text noise"))
    assert noise.count() > 0
    assert noise.where((F.col("severity_number") != 0) | (F.size("attributes") != 0)).count() == 0


def test_engines_agree(spark, pages):
    """SQL (columnar) and Arrow (pandas UDF) parse engines are byte-equal."""
    cols = [
        "url", "line_no", "time_unix_nano", "severity_number", "severity_text",
        "body", "trace_id", "span_id",
        F.to_json("attributes").alias("attrs"), F.to_json("resource").alias("res"),
    ]
    a = parse_pages(pages, engine="sql").select(cols)
    b = parse_pages(pages, engine="arrow").select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_poison_rows_do_not_throw(spark):
    """Malformed timestamps / garbage lines must not raise (permanent-error
    analog, consumer/consumererror/permanent.go:27-43): they fall through as
    severity-0 records with body preserved."""
    rows = [
        ("https://x.example.com/p/a", np.datetime64("2024-01-01", "us").item(),
         b"<html>", '999.999.999.999 - - [99/Zzz/2024:99:99:99 +0000] "GET /x HTTP/1.1" 200 10', "en"),
        ("https://x.example.com/p/b", np.datetime64("2024-01-01", "us").item(),
         b"<html>", "2024-13-45T99:99:99Z ERROR [c] broken ts", "en"),
        ("https://x.example.com/p/c", np.datetime64("2024-01-01", "us").item(),
         None, None, None),
    ]
    from opentelemetry_collector_spark.schemas import PAGES_SCHEMA

    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = parse_pages(pages).collect()
    assert len(out) == 2
    for r in out:
        # malformed timestamps parse to 0, never raise; grammar-level
        # classification (severity) is independent of ts validity
        assert r.time_unix_nano == 0
        assert r.body in rows[0][3] + rows[1][3]


def test_engines_agree_on_unicode_wordlike_chars(spark):
    """Java regex \\w is ASCII-only; Python's is Unicode-aware. The Arrow
    engine compiles with re.ASCII so a line like '²=' (superscript digit —
    Python-\\w but not Java-\\w) parses identically in both engines
    (hypothesis-found divergence, pinned)."""
    import datetime as dt

    from opentelemetry_collector_spark.schemas import PAGES_SCHEMA

    rows = [
        ("https://host0001.example.com/p/0", dt.datetime(2024, 1, 1), None, "²=\n key=v", "en")
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)

    def canon(df):
        return sorted(
            (r["line_no"], r["body"], tuple(sorted(r["attributes"].items())))
            for r in df.collect()
        )

    got_sql = canon(parse_pages(pages, engine="sql"))
    got_arrow = canon(parse_pages(pages, engine="arrow"))
    assert got_sql == got_arrow


def test_engines_agree_on_r3_review_edges(spark):
    """Pinned r3 review divergences: duplicate kv keys (DUPLICATED_MAP_KEY
    abort in the SQL engine's map_from_entries), multi-quote value tails
    (one-quote-per-end strip vs str.strip('"')), and 7-digit fractional
    seconds (ns-precision pandas vs µs-precision unix_micros)."""
    import datetime as dt

    from opentelemetry_collector_spark.schemas import PAGES_SCHEMA

    text = "\n".join(
        [
            "a=1 a=2 b=3",
            'k=abc"" q="x"',
            "2024-01-01T00:00:00.1234567Z INFO [comp-1] msg",
            'dup=x dup="x y" dup=z',
        ]
    )
    pages = spark.createDataFrame(
        [("https://host0001.example.com/p/0", dt.datetime(2024, 1, 1), None, text, "en")],
        PAGES_SCHEMA,
    )
    cols = [
        "url", "line_no", "time_unix_nano", "severity_number", "severity_text",
        "body", "trace_id", "span_id",
        F.to_json("attributes").alias("attrs"), F.to_json("resource").alias("res"),
    ]
    a = parse_pages(pages, engine="sql").select(cols)
    b = parse_pages(pages, engine="arrow").select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    rows = {r["body"]: r for r in parse_pages(pages, engine="sql").collect()}
    assert rows["a=1 a=2 b=3"]["attributes"] == {"a": "2", "b": "3"}  # last wins
    assert rows['k=abc"" q="x"']["attributes"] == {"k": 'abc"', "q": "x"}
    assert rows["dup=x dup=\"x y\" dup=z"]["attributes"] == {"dup": "z"}
    assert rows["2024-01-01T00:00:00.1234567Z INFO [comp-1] msg"]["time_unix_nano"] % 1000 == 0
