"""Grok compiler tests: expansion, typing, match gating, nesting."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.grok import (
    GrokError,
    compile_grok,
    grok_extract,
)

ACCESS = (
    r'^%{IPV4:client} - - \[%{HTTPDATE:ts}\] '
    r'"%{HTTPMETHOD:method} %{NOTSPACE:path} HTTP/%{NUMBER:httpver}" '
    r'%{INT:status:int} %{INT:bytes:int}$'
)


def test_compile_expansion_and_field_order():
    regex, fields = compile_grok("%{INT:a:int} %{WORD} %{NOTSPACE:b}")
    assert fields == [("a", "long"), ("b", None)]
    # named → capturing, unnamed → non-capturing, literal text verbatim
    assert regex == r"([+-]?\d+) (?:\w+) (\S+)"


def test_compile_errors():
    with pytest.raises(GrokError, match="unknown grok pattern"):
        compile_grok("%{NOPE:x}")
    with pytest.raises(GrokError, match="unknown grok cast"):
        compile_grok("%{INT:x:decimal}")
    with pytest.raises(GrokError, match="too deep"):
        compile_grok("%{A:x}", custom={"A": "%{B}", "B": "%{A}"})


def test_custom_pattern_nesting_flattens_groups():
    # a custom body with its OWN named refs must not shift outer groups
    custom = {"HOSTPORT": r"%{HOSTNAME:h}:%{INT:p}"}
    regex, fields = compile_grok("%{HOSTPORT:addr} %{INT:n:int}", custom)
    assert [f for f, _ in fields] == ["addr", "n"]
    m = __import__("re").match(regex, "db-1.example.com:5432 7")
    assert m.group(1) == "db-1.example.com:5432"
    assert m.group(2) == "7"


def test_grok_extract_typed_and_null_gated(spark):
    df = spark.createDataFrame(
        [
            (0, '1.2.3.4 - - [02/Jan/2024:03:04:05 +0000] "GET /a?q=1 HTTP/1.1" 200 512'),
            (1, "not an access log line"),
        ],
        "id long, line string",
    )
    out = {r["id"]: r for r in grok_extract(df, ACCESS, "line").collect()}
    r = out[0]
    assert r["client"] == "1.2.3.4"
    assert r["method"] == "GET" and r["path"] == "/a?q=1"
    assert r["status"] == 200 and isinstance(r["status"], int)
    assert r["bytes"] == 512 and r["httpver"] == "1.1"
    # non-matching row: every capture NULL (not ''), other columns intact
    bad = out[1]
    assert bad["line"].startswith("not ")
    for f in ("client", "ts", "method", "path", "httpver", "status", "bytes"):
        assert bad[f] is None, f


def test_grok_matches_handwritten_access_parse(spark):
    """The grok-compiled access pattern agrees with the hand-written
    ACCESS_RE on the fixture grammar (same fields, same values)."""
    from opentelemetry_collector_spark.fixtures.pages import generate_pages_pandas
    from opentelemetry_collector_spark.operators.parse import ACCESS_RE

    import numpy as np

    pdf = generate_pages_pandas(np.arange(0, 40, dtype=np.uint64))
    lines = (
        spark.createDataFrame(pdf[["url", "text"]])
        .select("url", F.explode(F.split("text", "\n")).alias("line"))
        .where(F.col("line").rlike(ACCESS_RE))
    )
    n = lines.count()
    assert n > 0
    got = grok_extract(lines, ACCESS, "line")
    # every access line matches the grok pattern with identical captures
    assert got.where(F.col("client").isNull()).count() == 0
    mismatch = got.where(
        (F.regexp_extract("line", ACCESS_RE, 1) != F.col("client"))
        | (F.regexp_extract("line", ACCESS_RE, 3) != F.col("method"))
        | (F.regexp_extract("line", ACCESS_RE, 4) != F.col("path"))
        | (F.regexp_extract("line", ACCESS_RE, 5).cast("long") != F.col("status"))
        | (F.regexp_extract("line", ACCESS_RE, 6).cast("long") != F.col("bytes"))
    )
    assert mismatch.count() == 0


def test_user_capturing_groups_do_not_shift_field_binding():
    """A bare (...) in the raw-regex portion must not steal a group
    number from the declared fields (the fuzz-found mis-binding)."""
    import re as _re

    regex, fields = compile_grok(r"(\d+)-%{WORD:w} (x|y)%{INT:n:int}")
    assert [f for f, _ in fields] == ["w", "n"]
    m = _re.fullmatch(regex, "12-abc x7", _re.ASCII)
    assert m is not None
    assert m.group(1) == "abc" and m.group(2) == "7"


def test_round5_pattern_additions(spark):
    """The syslog family + common scalars parse real lines in BOTH
    engines' regex subset (the whole pattern library is RE2∩Java)."""
    from opentelemetry_collector_spark.operators.grok import grok_extract

    df = spark.createDataFrame(
        [
            (
                "Jan  2 15:04:05 myhost sshd[4242]: "
                "Accepted publickey for admin from 10.0.0.7 "
                "mac aa:bb:cc:dd:ee:ff mail ops@example.com v -3.25",
            )
        ],
        "line string",
    )
    pat = (
        "%{SYSLOGTIMESTAMP:ts} %{HOSTNAME:host} %{SYSLOGPROG:prog}: "
        "Accepted publickey for %{USERNAME:user} from %{IP:ip} "
        "mac %{MAC:mac} mail %{EMAILADDRESS:mail} v %{BASE10NUM:v:double}"
    )
    r = grok_extract(df, pat, text_col="line").collect()[0]
    assert r["ts"] == "Jan  2 15:04:05"
    assert r["host"] == "myhost"
    assert r["prog"] == "sshd[4242]"
    assert r["user"] == "admin" and r["ip"] == "10.0.0.7"
    assert r["mac"] == "aa:bb:cc:dd:ee:ff"
    assert r["mail"] == "ops@example.com"
    assert r["v"] == -3.25
