"""extract_text_any: generic FOREIGN-HTML extraction (markup the engine
didn't write) — adversarial hand-written cases with exact expected
strings, plus property parity against a pure-Python reference of the
documented semantics. The receiver-boundary analog: the unmarshal path
must accept any payload, not just its own (reference
receiver/otlpreceiver/otlp.go:42-279)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.htmltext import (
    _AMP_SENTINEL,
    _ATTRS,
    _BLOCK_TAGS,
    _CONTENT_STRIP_TAGS,
    _NAMED_ENTITIES,
    extract_text_any,
)


# ---------------------------------------------------------------------------
# pure-Python reference of the documented semantics
# ---------------------------------------------------------------------------

def _valid(n: int) -> bool:
    return 1 <= n <= 0x10FFFF and not (0xD800 <= n <= 0xDFFF)


def _chrfix(n: int) -> str:
    return _AMP_SENTINEL if n == 38 else chr(n)


def py_extract(s: str) -> str:
    s = re.sub(r"(?s)<!--.*?-->", "", s)
    for t in _CONTENT_STRIP_TAGS:
        s = re.sub(rf"(?is)<{t}\b{_ATTRS}>.*?</{t}\s*>", "", s)
    s = re.sub(rf"(?i)</?(?:{_BLOCK_TAGS})\b{_ATTRS}>", "\n", s)
    s = re.sub(rf"</?[a-zA-Z!]{_ATTRS}>", "", s)
    s = s.replace("&amp;", _AMP_SENTINEL)
    parts = s.split("&#")
    out = [parts[0]]
    for seg in parts[1:]:
        m = re.match(r"([0-9]{1,7});", seg)
        h = re.match(r"[xX]([0-9a-fA-F]{1,6});", seg)
        if m and _valid(int(m.group(1))):
            out.append(_chrfix(int(m.group(1))) + seg[m.end():])
        elif h and _valid(int(h.group(1), 16)):
            out.append(_chrfix(int(h.group(1), 16)) + seg[h.end():])
        else:
            out.append("&#" + seg)
    s = "".join(out)
    for name, repl in _NAMED_ENTITIES:
        s = s.replace(f"&{name};", repl)
    s = s.replace(_AMP_SENTINEL, "&")
    s = s.replace("­", "")
    s = re.sub("[\t\x0b\x0c\r   ]", " ", s)
    lines = [re.sub(" {2,}", " ", l).strip(" ") for l in s.split("\n")]
    return "\n".join(l for l in lines if l)


def _spark_extract(spark, pages: list[str]) -> list[str]:
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "id int, page string"
    )
    rows = (
        df.select("id", extract_text_any(F.encode("page", "UTF-8")).alias("t"))
        .orderBy("id")
        .collect()
    )
    return [r["t"] for r in rows]


# ---------------------------------------------------------------------------
# hand-written adversarial cases: (html, expected)
# ---------------------------------------------------------------------------

CASES: list[tuple[str, str]] = [
    # script body containing markup AND a fake close inside a string —
    # paired strip is non-greedy to the first real </script>
    (
        '<p>before</p><script>if (a < b && c > d) { w("</script>x<p>after</p>',
        'before\nx\nafter',
    ),
    # style/noscript/template content all stripped
    (
        "<style>body { color: red; }</style><p>kept</p><noscript>no js</noscript>"
        "<template><li>ghost</li></template>",
        "kept",
    ),
    # a commented-out <script> opener must not eat visible text
    (
        "<!-- <script> -->visible<script>gone()</script> tail",
        "visible tail",
    ),
    # comments spanning lines, with fake tags inside
    ("A<!-- <p>fake</p>\n more -->B", "AB"),
    # broken nesting + inline tags glue their text
    ("<b><i>bold-italic</b></i> next<span>inline</span>glued", "bold-italic nextinlineglued"),
    # block tags break lines; empty lines drop; runs collapse
    ("<div>one</div><div></div><div>two  three</div>", "one\ntwo three"),
    # unclosed trailing block tag
    ("<p>trailing", "trailing"),
    # single-pass entity decode: &amp;lt; is a LITERAL &lt;
    ("&amp;lt; &lt;real&gt; &quot;q&quot; &apos;a&apos;", "&lt; <real> \"q\" 'a'"),
    # numeric entities: 2-byte, 3-byte, 4-byte UTF-8; &#38; can't re-decode
    ("caf&#233; &#8364;5 &#x1F600; A&#38;lt;B", "café €5 😀 A&lt;B"),
    # invalid numerics stay literal: NUL, surrogate, out-of-range, 8 digits
    ("&#0; &#xD800; &#1114112; &#12345678; &#x110000;", "&#0; &#xD800; &#1114112; &#12345678; &#x110000;"),
    # dangling forms stay literal
    ("a&#12 b&# c&#x; d&unknown; e&", "a&#12 b&# c&#x; d&unknown; e&"),
    # named zoo + nbsp to space + soft hyphen dropped
    ("x&nbsp;y em&mdash;dash soft&shy;hyphen &copy;2024 &hellip;", "x y em—dash softhyphen ©2024 …"),
    # CRLF + tabs + NBSP normalize; <br> breaks the line
    ("line one\r\nline\ttwo<br>line three", "line one\nline two\nline three"),
    # DOCTYPE and attribute-heavy tags vanish; math '<' survives when not tag-like
    ('<!DOCTYPE html><a href="u" data-x="1 > 0">link</a> 1 < 2', "link 1 < 2"),
    # all boilerplate -> ''
    ("<html><head><script>x()</script></head><body><!-- only --></body></html>", ""),
    # title is a block tag: its text gets its own line
    ("<head><title>The Title</title></head><body><p>body text</p></body>", "The Title\nbody text"),
]


def test_adversarial_cases(spark):
    got = _spark_extract(spark, [h for h, _ in CASES])
    for (html, want), g in zip(CASES, got):
        assert g == want, f"html={html!r}\n  want={want!r}\n  got={g!r}"
        assert py_extract(html) == want, f"py reference diverges on {html!r}"


def test_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, b"")], "id int, html binary")
    rows = df.select("id", extract_text_any(F.col("html")).alias("t")).orderBy("id").collect()
    assert rows[0]["t"] is None
    assert rows[1]["t"] == ""


def test_plan_is_narrow_and_python_free(spark):
    df = spark.range(10).select(
        F.encode(F.concat(F.lit("<p>row "), F.col("id"), F.lit("</p>")), "UTF-8").alias("html")
    )
    plan = (
        df.select(extract_text_any(F.col("html")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


_FRAGMENTS = st.sampled_from(
    [
        "plain words here.",
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<span>", "</span>",
        "<script>", "</script>", "<style a=b>", "</style>",
        "<!--", "-->", "<b>", "</i>",
        "&amp;", "&lt;", "&nbsp;", "&#233;", "&#x1F600;", "&#xD800;", "&#38;",
        "&#", ";", "&unknown;", "&",
        "\r\n", "\t", " ", "  double  space", "é漢😀",
        "1 < 2 > 0", '<a href="u">', "</a>", "<li>", "</li>", "<title>", "</title>",
    ]
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_FRAGMENTS, min_size=0, max_size=24).map("".join))
def test_property_matches_python_reference(spark, page):
    assert _spark_extract(spark, [page]) == [py_extract(page)]
