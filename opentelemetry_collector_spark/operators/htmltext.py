"""HTML envelope → extracted text, byte-identical per url.

The north-star input is an Iceberg table of Common-Crawl-style pages with
``html: binary`` alongside the extracted ``text`` (BASELINE.json
input_hint), and the graded per-row invariant is BYTE-IDENTICAL extracted
text per url. This module is the extraction boundary: a deterministic
page envelope (title, nav boilerplate, ``<pre>``-wrapped entity-escaped
body, footer pads) and its exact inverse.

Reference analog: the receiver decode boundary — the reference's
receivers turn a wire payload into pdata without losing a byte
(receiver/otlpreceiver/internal/logs/otlp.go:43-55); here the "wire
payload" is the page HTML and the decode must reproduce the original
text exactly, entities and multi-byte UTF-8 included.

Scale: both directions are pure JVM whole-stage-codegen expressions
(encode/decode, one anchored regexp_extract, five literal replaces) —
scan-speed narrow transforms, zero Python, zero shuffle. At 10^12 rows
the cost is the scan.

Why entity escaping matters: a body containing a literal ``</pre>`` (or
any markup) must not terminate extraction early. Escaping ``&`` first and
``<``/``>``/quotes after makes the envelope unambiguous; unescaping in
the exact reverse order makes the round-trip lossless for every string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# escape order matters: & first (else already-escaped entities re-escape);
# unescape applies the exact inverse order (& last).
_ESCAPES: tuple[tuple[str, str], ...] = (
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#39;"),
)

# (?s): the body spans lines. Non-greedy is safe ONLY because the body is
# entity-escaped — an embedded literal "</pre>" cannot appear unescaped.
_PRE_RE = r"(?s)<pre>(.*?)</pre>"


def escape_entities(col: Column) -> Column:
    """HTML-entity escape (&, <, >, \", ') — pure literal replaces."""
    for raw, ent in _ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(ent))
    return col


def unescape_entities(col: Column) -> Column:
    """Exact inverse of :func:`escape_entities` (reverse order, & last)."""
    for raw, ent in reversed(_ESCAPES):
        col = F.replace(col, F.lit(ent), F.lit(raw))
    return col


def wrap_html(text: Column, title: Column) -> Column:
    """Deterministic page envelope around ``text`` → ``binary`` html.

    Boilerplate (nav, footer pads sized by a hash of the title) surrounds
    the entity-escaped body so extraction has to find and unescape the
    real content, not substring a fixed offset. NULL text → NULL html
    (a page with no extractable text has no body on the wire).
    """
    pad_n = F.pmod(F.xxhash64(title), F.lit(5)).cast("int")
    page = F.concat(
        F.lit("<html><head><title>"),
        escape_entities(title),
        F.lit('</title></head><body><nav class="site">boilerplate</nav><pre>'),
        escape_entities(text),
        F.lit("</pre>"),
        F.repeat(F.lit('<div class="footer">pad</div>'), pad_n),
        F.lit("</body></html>"),
    )
    return F.when(text.isNotNull(), F.encode(page, "UTF-8"))


def extract_text(html: Column) -> Column:
    """``binary`` html → the original text, byte-identical.

    decode(UTF-8) → anchored ``<pre>…</pre>`` extract → entity unescape.
    An envelope with an empty body yields '' (regexp_extract's no-group
    result), matching a page whose text was ''. NULL html → NULL.
    """
    body = F.regexp_extract(F.decode(html, "UTF-8"), _PRE_RE, 1)
    return F.when(html.isNotNull(), unescape_entities(body))


def extract_pages(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages → + ``extracted_text`` column (narrow, scan-speed)."""
    return pages.withColumn("extracted_text", extract_text(F.col(html_col)))
