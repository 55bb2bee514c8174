"""Property test: the columnar C4 line filter equals a pure-Python
reference implementation of the same rules on random multi-line pages."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.operators.textstats import c4_line_filter

# fragments chosen to straddle every rule boundary: terminal punctuation
# (or not), exactly-5 vs 4 words, leading/trailing whitespace that trim
# must strip, braces, the lorem-ipsum flag, and empty lines
_LINE = st.sampled_from(
    [
        "This line has exactly five words.",
        "Four words only here.",
        "no terminal punctuation on this line",
        'quoted ending with enough words here."',
        "  padded line with five good words!  ",
        "Multiple   spaces  between   five   words?",
        "short.",
        "",
        "   ",
        "code { inside } braces here now.",
        "Lorem Ipsum dolor sit amet today.",
        "Tab\tseparated words do not split here.",
        "unicode line separator stays glued to five words. ",
    ]
)
# pages join their lines with \n or \r\n — CRLF pages must behave
# byte-identically to LF pages (the \r is part of the SEPARATOR, never
# a trailing character the $-anchor quietly forgives)
_SEP = st.sampled_from(["\n", "\r\n"])
_PAGE = st.tuples(st.lists(_LINE, min_size=1, max_size=8), _SEP).map(
    lambda t: t[1].join(t[0])
)


def _reference(pages: dict[int, str], min_words: int = 5, min_kept: int = 3):
    """Pure-Python replication of the documented semantics: lines split
    on \\r?\\n (CRLF == LF); a line is kept when its trimmed form ends in
    [.!?"] at TRUE end-of-string (\\Z — no line-terminator forgiveness)
    AND splitting the trimmed form on runs of spaces yields >= min_words
    pieces (java/ducks' trim strips SPACES only, exactly like Spark's
    ``trim``); page flags scan the RAW text; the kept array carries the
    ORIGINAL untrimmed lines."""
    out = {}
    for i, text in pages.items():
        lines = re.split(r"\r?\n", text)
        kept = []
        for line in lines:
            t = line.strip(" ")
            if re.search(r'[.!?"]\Z', t) and len(re.split(" +", t)) >= min_words:
                kept.append(line)
        ok = (
            len(kept) >= min_kept
            and "{" not in text
            and "}" not in text
            and "lorem ipsum" not in text.lower()
        )
        out[i] = (len(lines), len(kept), ok, "\n".join(kept))
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pages=st.lists(_PAGE, min_size=1, max_size=6))
def test_c4_line_filter_matches_python_reference(spark, pages):
    pagemap = dict(enumerate(pages))
    df = spark.createDataFrame(list(pagemap.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["doc_ok"], r["clean_text"])
        for r in c4_line_filter(df).collect()
    }
    want = _reference(pagemap)
    assert got == want
