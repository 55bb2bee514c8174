"""Property-based engine parity: the SQL and Arrow parse engines must
produce identical records for arbitrary (including adversarial) text.

Complements the fixture-based `test_engines_agree` with generated inputs:
almost-matching grammar prefixes, unicode, quotes, regex metacharacters,
the packing delimiter, huge tokens.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.operators.parse import parse_pages
from opentelemetry_collector_spark.schemas import PAGES_SCHEMA

# line fragments that probe grammar boundaries
_EDGES = st.sampled_from(
    [
        '1.2.3.4 - - [01/Jan/2024:00:00:00 +0000] "GET /x HTTP/1.1" 200 1',
        '999.2.3.4 - - [01/Jan/2024:00:00:00 +0000] "GET /x HTTP/1.1" 200 1',
        '1.2.3.4 - - [31/Foo/2024:99:99:99 +0000] "GET /x HTTP/1.1" 200 1',
        "2024-01-01T00:00:00Z INFO [comp-1] msg trace_id=0123456789abcdef0123456789abcdef span_id=0123456789abcdef",
        "2024-01-01T00:00:00Z INFO2 [comp-1] msg",
        "2024-01-01T99:00:00Z INFO [comp-1] msg",
        # header-only applog (no trailing message) — ADVICE r1 crash case
        "2024-01-01T00:00:00Z INFO [comp-1]",
        # header + trailing space (empty message, tail group participates)
        "2024-01-01T00:00:00Z INFO [comp-1] ",
        # valid prefix but junk glued to the bracket — NOT an applog record
        "2024-01-01T00:00:00Z INFO [comp-1]junk",
        # trace_id inside the component must not be extracted as an id
        "2024-01-01T00:00:00Z INFO [trace_id=0123456789abcdef0123456789abcdef] x",
        'key1=val key2="quoted val" status=7',
        'key1= key2=""',
        "a=b c=d=e",
        # r3 review edges: duplicate keys (last-wins fold, not
        # map_from_entries), multi-quote tails, sub-µs fractional seconds
        "a=1 a=2 b=3",
        'k=abc"" q="x"',
        "2024-01-01T00:00:00.1234567Z INFO [comp-1] msg",
        "\x01",
        "line with \x01 delimiter inside",
        '1.2.3.4 - - [01/Jan/2024:00:00:00 +0000] "GET /\x01 HTTP/1.1" 200 1',
        "ünïcödé ✓ 中文 🎉",
        "(((((", "$1$2$3", "\\d+\\s*", "a" * 500,
    ]
)
_RANDOM = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n"),
    max_size=80,
)
_LINE = st.one_of(_EDGES, _RANDOM)


def _canon(rows):
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        d["attributes"] = tuple(sorted(d["attributes"].items()))
        d["resource"] = tuple(sorted(d["resource"].items()))
        out.append(tuple(sorted(d.items())))
    return sorted(out)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(lines=st.lists(_LINE, min_size=1, max_size=30))
def test_sql_and_arrow_engines_agree(spark, lines):
    text = "\n".join(lines)
    rows = [
        ("https://host0001.example.com/p/0", dt.datetime(2024, 1, 1), None, text, "en")
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    got_sql = _canon(parse_pages(pages, engine="sql").collect())
    got_arrow = _canon(parse_pages(pages, engine="arrow").collect())
    assert got_sql == got_arrow
