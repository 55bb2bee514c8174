"""OTTL-subset compiler tests (docs/processing.md statement forms)."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.fixtures import synthesize_pages
from opentelemetry_collector_spark.operators.ottl import (
    OTTLSyntaxError,
    compile_condition,
    compile_statements,
    glob_to_regex,
    parse_statement,
)
from opentelemetry_collector_spark.operators.parse import parse_pages


@pytest.fixture(scope="module")
def records(spark):
    return parse_pages(synthesize_pages(spark, 300)).persist()


def test_parser_shapes():
    s = parse_statement('set(attributes["a"], "b") where severity_number >= 17')
    assert s.editor.name == "set" and s.where is not None
    with pytest.raises(OTTLSyntaxError):
        compile_statements(["drop()"])  # missing where
    with pytest.raises(OTTLSyntaxError):
        parse_statement("nonsense(")
    with pytest.raises(OTTLSyntaxError):
        compile_statements(["frobnicate(attributes)"])  # unknown editor


def test_glob_to_regex():
    assert glob_to_regex("/r/4*") == "^/r/4.*$"
    assert glob_to_regex("a?.c") == r"^a.\.c$"


def test_set_and_delete(records):
    run = compile_statements(
        [
            'set(attributes["source"], "web")',
            'delete(attributes["bytes"])',
        ]
    )
    out = run(records)
    assert out.where(F.element_at("attributes", "source") != "web").count() == 0
    assert out.where(F.element_at("attributes", "bytes").isNotNull()).count() == 0


def test_set_where_condition(records):
    run = compile_statements(
        ['set(attributes["err"], "1") where severity_number >= 17']
    )
    out = run(records)
    hi = out.where(F.col("severity_number") >= 17)
    lo = out.where(F.col("severity_number") < 17)
    assert hi.where(F.element_at("attributes", "err").isNull()).count() == 0
    assert lo.where(F.element_at("attributes", "err").isNotNull()).count() == 0


def test_keep_keys(records):
    run = compile_statements(['keep_keys(attributes, "ip", "status")'])
    out = run(records)
    bad = out.where(
        F.exists(F.map_keys("attributes"), lambda k: ~k.isin("ip", "status"))
    )
    assert bad.count() == 0
    # access rows keep exactly ip+status
    assert out.where(F.size("attributes") == 2).count() > 0


def test_replace_match_cardinality_reduction(records):
    run = compile_statements(
        ['replace_match(attributes["path"], "/r/4*", "/r/4xx")']
    )
    out = run(records)
    assert out.where(F.element_at("attributes", "path").rlike("^/r/4[0-9]")).count() == 0
    assert out.where(F.element_at("attributes", "path") == "/r/4xx").count() > 0
    # non-matching paths unchanged
    before = records.where(F.element_at("attributes", "path").rlike("^/r/1")).count()
    after = out.where(F.element_at("attributes", "path").rlike("^/r/1")).count()
    assert before == after


def test_drop_where(records):
    run = compile_statements(['drop() where attributes["status"] == "404"'])
    out = run(records)
    assert out.where(F.element_at("attributes", "status") == "404").count() == 0
    kept = records.where(
        F.element_at("attributes", "status").isNull()
        | (F.element_at("attributes", "status") != "404")
    ).count()
    assert out.count() == kept


def test_keep_where_and_ismatch(records):
    run = compile_statements(
        ['keep() where IsMatch(body, "^free text noise.*") or severity_number >= 21']
    )
    out = run(records)
    assert out.count() > 0
    bad = out.where(
        ~F.col("body").rlike("^free text noise.*") & (F.col("severity_number") < 21)
    )
    assert bad.count() == 0


def test_condition_compiler(records):
    cond = compile_condition('resource.host == "host0000.example.com" and severity_number > 0')
    got = records.where(cond).count()
    want = records.where(
        (F.col("resource.host") == "host0000.example.com") & (F.col("severity_number") > 0)
    ).count()
    assert got == want and got > 0


def test_truncate_all(records):
    run = compile_statements(["truncate_all(attributes, 3)"])
    out = run(records)
    assert out.where(
        F.exists(F.map_values("attributes"), lambda v: F.length(v) > 3)
    ).count() == 0


def test_hash_extract_limit_editors(spark):
    """attributesprocessor hash / ExtractPatterns / limit actions."""
    import hashlib

    df = spark.createDataFrame(
        [(1, {"k": "42", "ua": "Browser/42", "type": "view"})],
        "id long, attributes map<string,string>",
    )
    run = compile_statements(
        [
            'set(attributes["k_hash"], SHA256(attributes["k"]))',
            'extract_patterns(attributes["ua"], "(?<browser>[A-Za-z]+)/(?<major>[0-9]+)")',
            "limit(attributes, 4)",
        ]
    )
    attrs = run(df).collect()[0]["attributes"]
    # limit keeps the 4 smallest keys: browser, k, k_hash, major
    assert sorted(attrs) == ["browser", "k", "k_hash", "major"]
    assert attrs["browser"] == "Browser" and attrs["major"] == "42"
    assert attrs["k_hash"] == hashlib.sha256(b"42").hexdigest()


def test_extract_patterns_no_match_leaves_map(spark):
    df = spark.createDataFrame(
        [(1, {"ua": "no-slash-here"})], "id long, attributes map<string,string>"
    )
    run = compile_statements(
        ['extract_patterns(attributes["ua"], "(?<browser>[A-Za-z]+)/(?<major>[0-9]+)")']
    )
    attrs = run(df).collect()[0]["attributes"]
    assert sorted(attrs) == ["ua"]  # no groups upserted on miss


def test_named_group_scanner():
    from opentelemetry_collector_spark.operators.ottl import _named_groups

    # unnamed group consumes index 1; class/lookbehind don't
    assert _named_groups(r"([a-z(]+)-(?<x>\d+)(?:z)(?<y>\w)") == {"x": 2, "y": 3}
    assert _named_groups(r"(?<=pre)(?<only>\d+)") == {"only": 1}


def test_filter_pushdown_through_parse(spark, tmp_path):
    """A compiled drop()/keep() predicate on a scan column must reach the
    parquet reader as a pushed filter (SURVEY.md §4: OTTL compiles to
    built-in expressions precisely so Catalyst can push them)."""
    p = str(tmp_path / "pages")
    synthesize_pages(spark, 200).write.parquet(p)
    pages = spark.read.parquet(p)
    keep_lang = compile_condition('lang == "en"')
    plan = pages.where(keep_lang).select("url")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_set_creates_new_column_and_nil_noop(records):
    # set() on a column path that doesn't exist yet must CREATE it (the
    # nil-no-op coalesce resolves at apply time, so it cannot reference
    # the not-yet-existing old value)
    out = compile_statements(['set(brand_new, "x")'])(records)
    assert out.where(F.col("brand_new") != "x").count() == 0
    # conditional create: non-matching rows fall back to NULL
    out = compile_statements(['set(also_new, "y") where severity_text == "ERROR"'])(
        records
    )
    assert (
        out.where(F.col("also_new").isNotNull()).count()
        == records.where(F.col("severity_text") == "ERROR").count()
    )
    # nil value on an EXISTING column keeps the old value (reference
    # set() takes "no action" on nil): a lookup of an absent attribute
    # key is nil for every row
    out = compile_statements(['set(severity_text, attributes["no_such_key"])'])(
        records
    )
    n = records.count()
    assert out.where(F.col("severity_text").isNull()).count() == 0
    assert out.count() == n


def test_converter_functions(spark):
    df = spark.createDataFrame(
        [
            (
                0,
                1704067200_123456789,
                "  padded  ",
                "a,b,c",
                '{"k": "v", "n": 2}',
                "requestCount",
            ),
            (1, 999, "x", "solo", "not json", "already_snake"),
        ],
        "id long, t long, pad string, csv string, js string, name string",
    )
    out = compile_statements(
        [
            "set(sec, UnixSeconds(t))",
            "set(ms, UnixMilli(t))",
            "set(us, UnixMicro(t))",
            'set(bucket, TruncateTime(t, "1h"))',
            "set(trimmed, Trim(pad))",
            'set(parts, Split(csv, ","))',
            "set(parsed, ParseJSON(js))",
            'set(snake, ConvertCase(name, "snake"))',
        ]
    )(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[0]["sec"] == 1704067200
    assert r[0]["ms"] == 1704067200_123
    assert r[0]["us"] == 1704067200_123456
    assert r[0]["bucket"] == 1704067200 * 10**9  # 00:00 UTC is on the hour
    assert r[0]["trimmed"] == "padded"
    assert r[0]["parts"] == ["a", "b", "c"]
    assert r[0]["parsed"] == {"k": "v", "n": "2"}
    assert r[0]["snake"] == "request_count"
    # sub-second epoch: integer division truncates toward zero
    assert r[1]["sec"] == 0 and r[1]["us"] == 0
    assert r[1]["parts"] == ["solo"]
    # unparseable JSON → nil → set() keeps the old value (none: column
    # created as NULL on that row)
    assert r[1]["parsed"] is None
    assert r[1]["snake"] == "already_snake"


def test_converter_errors():
    with pytest.raises(OTTLSyntaxError, match="unsupported mode"):
        compile_statements(['set(x, ConvertCase(body, "studly"))'])
    with pytest.raises(OTTLSyntaxError, match="duration"):
        compile_statements(['set(x, TruncateTime(t, "1d"))'])


def test_converter_functions_round5(spark):
    df = spark.createDataFrame(
        [
            (
                0,
                (1704067200 + 3 * 3600 + 25 * 60 + 45) * 10**9 + 123456789,
                "255",
                "aGVsbG8=",
                "k1=v1 k2=v2",
                "12",
                "12.5",
                "TRUE",
                {"a": "1", "b": "2"},
            )
        ],
        "id long, t long, num string, b64 string, kv string, i string,"
        " d string, bl string, attrs map<string,string>",
    )
    out = compile_statements(
        [
            "set(y, Year(t))",
            "set(mo, Month(t))",
            "set(dd, Day(t))",
            "set(hh, Hour(t))",
            "set(mi, Minute(t))",
            "set(ss, Second(t))",
            'set(dur, Duration("1h30m"))',
            "set(mins, Minutes(dur))",
            "set(hx, Hex(num))",
            "set(dec, Base64Decode(b64))",
            "set(pkv, ParseKeyValue(kv))",
            "set(is_i, IsInt(i))",
            "set(not_i, IsInt(d))",
            "set(is_d, IsDouble(d))",
            "set(is_b, IsBool(bl))",
            "set(is_s, IsString(num))",
            "set(ks, Keys(attrs))",
            "set(vs, Values(attrs))",
            "set(lg, Log(num))",
            "set(sq, Sqrt(num))",
            "set(h512, SHA512(num))",
        ]
    )(df)
    r = out.collect()[0]
    assert (r["y"], r["mo"], r["dd"]) == (2024, 1, 1)
    assert (r["hh"], r["mi"], r["ss"]) == (3, 25, 45)
    assert r["dur"] == 5400 * 10**9
    assert r["mins"] == 90
    assert r["hx"] == "ff"
    assert r["dec"] == "hello"
    assert r["pkv"] == {"k1": "v1", "k2": "v2"}
    assert r["is_i"] is True and r["not_i"] is False
    assert r["is_d"] is True and r["is_b"] is True and r["is_s"] is True
    assert sorted(r["ks"]) == ["a", "b"] and sorted(r["vs"]) == ["1", "2"]
    import math

    assert math.isclose(r["lg"], math.log(255.0))
    assert math.isclose(r["sq"], math.sqrt(255.0))
    import hashlib

    assert r["h512"] == hashlib.sha512(b"255").hexdigest()
