"""JSONL boundary: columnar round trip, corrupt-line accounting, and
real-file write/read through plain .jsonl text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.jsonl import (
    DOCUMENTS_JSONL_SCHEMA,
    from_jsonl,
    read_jsonl,
    to_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip_escapes_hostile_text(spark):
    """Embedded newlines, quotes, backslashes, tabs, and multi-byte
    UTF-8 survive one-object-per-line framing byte-exactly; null fields
    round-trip as nulls."""
    rows = [
        (1, 'line1\nline2 "quoted" \\backslash\\ \ttab', "en", "s", 40),
        (2, "emoji \U0001f600 and accents éüß", "de", "t", 25),
        (3, None, "fr", "u", 0),
        (4, "", "xx", "v", 0),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_JSONL_SCHEMA)
    lines = to_jsonl(docs)
    # one-object-per-LINE really holds: no raw newline inside any value
    assert all("\n" not in r["value"] for r in lines.collect())
    rt = from_jsonl(lines, DOCUMENTS_JSONL_SCHEMA)
    got = sorted(
        map(tuple, rt.select("doc_id", "text", "lang", "source", "n_chars").collect())
    )
    assert got == sorted(rows)
    assert rt.where("NOT _ok").count() == 0


def test_jsonl_malformed_lines_accounted_not_thrown(spark):
    bad = spark.createDataFrame(
        [("{broken",), ('{"doc_id": 7, "text": "ok fine"}',), ("",)],
        "value string",
    )
    out = {r["_raw"]: (r["_ok"], r["doc_id"]) for r in from_jsonl(bad, DOCUMENTS_JSONL_SCHEMA).collect()}
    assert out["{broken"][0] is False
    assert out['{"doc_id": 7, "text": "ok fine"}'] == (True, 7)


def test_jsonl_file_write_read(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}\nsecond line", "en", "s", 10) for i in range(50)],
        DOCUMENTS_JSONL_SCHEMA,
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA)
    assert back.where("NOT _ok").count() == 0
    assert sorted(
        map(tuple, back.select("doc_id", "text").collect())
    ) == sorted((i, f"text {i}\nsecond line") for i in range(50))


def test_from_jsonl_does_not_mutate_caller_schema(spark):
    # StructType.add mutates in place — reusing one schema object across
    # calls used to stack duplicate _corrupt fields and corrupt the
    # caller's schema for any other use
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from opentelemetry_collector_spark.sources.jsonl import from_jsonl, to_jsonl

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    lines = to_jsonl(df)
    first = from_jsonl(lines, schema)
    second = from_jsonl(lines, schema)  # same OBJECT, second use
    assert [f.name for f in schema.fields] == ["doc_id", "text"]
    assert first.columns == second.columns
    assert second.where(F.col("_ok")).count() == 2
