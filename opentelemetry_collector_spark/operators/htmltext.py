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


# ---------------------------------------------------------------------------
# Generic FOREIGN-HTML extraction — markup the engine didn't write
# ---------------------------------------------------------------------------
#
# extract_text above is the exact inverse of wrap_html's own envelope; a
# real Common-Crawl ``html: binary`` column contains arbitrary markup.
# extract_text_any is the general boundary: like the reference's receiver
# unmarshal path it must accept any payload, not just its own
# (receiver/otlpreceiver/otlp.go:42-279 — the unmarshal path is not an
# inverse of the marshal path). The semantics are DEFINED (not "whatever a
# browser does") so a SQL twin can replicate them exactly:
#
#   1. strip comments ``<!-- … -->`` (non-greedy, spans lines);
#   2. strip paired script/style/noscript/template ELEMENTS including
#      their content (per-tag patterns — the RE2 twin has no backrefs;
#      an unpaired opener is left for the generic tag strip);
#   3. block-level tags (open or close) → newline;
#   4. any remaining tag → '' (inline tags glue their text);
#   5. single-pass entity decode: ``&amp;`` is sentineled FIRST so its
#      decode output can never be re-interpreted (``&amp;lt;`` → literal
#      ``&lt;``), then numeric entities (decimal ≤7 digits / hex ≤6,
#      invalid codepoints — 0, surrogates, >0x10FFFF, overlong digit
#      runs — stay literal; ``&#38;`` decodes through the sentinel too),
#      then a bounded named-entity table, then the sentinel → ``&``;
#   6. whitespace: soft hyphen dropped; tab/VT/FF/CR/NBSP/LS/PS → space;
#      lines split on \n, space-runs collapsed, lines trimmed, empty
#      lines dropped, joined with \n.
#
# Every step is a JVM codegen expression (regexp_replace / replace /
# split / transform / filter / array_join) — zero Python, zero shuffle;
# at 10^12 rows the cost is the scan, same class as extract_text.

# comments are stripped BEFORE script/style pairing: a commented-out
# ``<script>`` opener must not capture visible text up to a later real
# ``</script>`` (the converse pathology — a comment opener inside a
# script body — loses only script content, which is stripped anyway).
_COMMENT_RE = r"(?s)<!--.*?-->"

_CONTENT_STRIP_TAGS: tuple[str, ...] = ("script", "style", "noscript", "template")

# attribute run that tolerates '>' INSIDE quoted values ("1 > 0") —
# alternatives are disjoint by first character, so both Java and RE2
# match it deterministically with no backreference
_ATTRS = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"

_BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|td|th|thead|tbody"
    "|tfoot|table|caption|blockquote|pre|section|article|header|footer"
    "|nav|aside|main|figure|figcaption|form|fieldset|address|center|title"
)
_BLOCK_TAG_RE = rf"(?i)</?(?:{_BLOCK_TAGS})\b{_ATTRS}>"
_ANY_TAG_RE = rf"</?[a-zA-Z!]{_ATTRS}>"

# decoded '&' must not be re-interpretable by the named-entity replaces
# that follow — route it through a private-use sentinel restored last
_AMP_SENTINEL = ""

# bounded named-entity table (beyond the five the envelope uses); output
# strings never contain '&' so the chain order is immaterial
_NAMED_ENTITIES: tuple[tuple[str, str], ...] = (
    ("lt", "<"), ("gt", ">"), ("quot", '"'), ("apos", "'"),
    ("nbsp", " "), ("shy", "­"),
    ("mdash", "—"), ("ndash", "–"), ("hellip", "…"),
    ("lsquo", "‘"), ("rsquo", "’"),
    ("ldquo", "“"), ("rdquo", "”"),
    ("copy", "©"), ("reg", "®"), ("trade", "™"),
    ("deg", "°"), ("middot", "·"),
    ("laquo", "«"), ("raquo", "»"),
    ("euro", "€"), ("pound", "£"), ("yen", "¥"),
    ("cent", "¢"), ("sect", "§"), ("para", "¶"),
    ("bull", "•"), ("times", "×"), ("divide", "÷"),
    ("plusmn", "±"),
)

_DEC_ENT_RE = r"^[0-9]{1,7};"
_HEX_ENT_RE = r"^[xX][0-9a-fA-F]{1,6};"

# characters normalized to a single space before line handling
_WS_CLASS = "[\t\x0b\x0c\r   ]"


def _utf8_chr(n: Column) -> Column:
    """Codepoint → its character, via arithmetic UTF-8 byte construction
    (hex-format each byte → unhex → decode); there is no full-codepoint
    chr() builtin in Spark. Caller guarantees a valid codepoint.
    ``&#38;`` routes through the amp sentinel like the named table."""

    def b(x: Column) -> Column:
        return F.lpad(F.hex(x.cast("long")), 2, "0")

    six = F.lit(63)
    one = b(n)
    two = F.concat(b(F.shiftright(n, 6) + 192), b(n.bitwiseAND(six) + 128))
    three = F.concat(
        b(F.shiftright(n, 12) + 224),
        b(F.shiftright(n, 6).bitwiseAND(six) + 128),
        b(n.bitwiseAND(six) + 128),
    )
    four = F.concat(
        b(F.shiftright(n, 18) + 240),
        b(F.shiftright(n, 12).bitwiseAND(six) + 128),
        b(F.shiftright(n, 6).bitwiseAND(six) + 128),
        b(n.bitwiseAND(six) + 128),
    )
    hexstr = (
        F.when(n < 0x80, one)
        .when(n < 0x800, two)
        .when(n < 0x10000, three)
        .otherwise(four)
    )
    return F.when(n == 38, F.lit(_AMP_SENTINEL)).otherwise(
        F.decode(F.unhex(hexstr), "UTF-8")
    )


def _codepoint_valid(n: Column) -> Column:
    return (n >= 1) & (n <= 0x10FFFF) & ~((n >= 0xD800) & (n <= 0xDFFF))


def _decode_numeric_entities(s: Column) -> Column:
    """Split on ``&#``; each tail segment either starts with a valid
    ``digits;`` / ``[xX]hex;`` run (decode + keep the rest) or the
    literal ``&#`` is restored. Pure array expressions."""

    def seg_decode(seg: Column) -> Column:
        n_dec = F.regexp_extract(seg, "^([0-9]{1,7});", 1).cast("long")
        n_hex = F.conv(
            F.regexp_extract(seg, "^[xX]([0-9a-fA-F]{1,6});", 1), 16, 10
        ).cast("long")
        return (
            F.when(
                seg.rlike(_DEC_ENT_RE) & _codepoint_valid(n_dec),
                F.concat(_utf8_chr(n_dec), F.regexp_replace(seg, _DEC_ENT_RE, "")),
            )
            .when(
                seg.rlike(_HEX_ENT_RE) & _codepoint_valid(n_hex),
                F.concat(_utf8_chr(n_hex), F.regexp_replace(seg, _HEX_ENT_RE, "")),
            )
            .otherwise(F.concat(F.lit("&#"), seg))
        )

    segs = F.split(s, "&#", -1)
    return F.concat(
        F.element_at(segs, 1),
        F.array_join(
            F.transform(
                F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0))),
                seg_decode,
            ),
            "",
        ),
    )


def extract_text_any(html: Column) -> Column:
    """``binary`` FOREIGN html → extracted plain text (semantics above).

    NULL html → NULL; a page that is all boilerplate → ''.
    """
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _COMMENT_RE, "")
    for tag in _CONTENT_STRIP_TAGS:
        s = F.regexp_replace(s, rf"(?is)<{tag}\b{_ATTRS}>.*?</{tag}\s*>", "")
    s = F.regexp_replace(s, _BLOCK_TAG_RE, "\n")
    s = F.regexp_replace(s, _ANY_TAG_RE, "")
    s = F.replace(s, F.lit("&amp;"), F.lit(_AMP_SENTINEL))
    s = _decode_numeric_entities(s)
    for name, repl in _NAMED_ENTITIES:
        s = F.replace(s, F.lit(f"&{name};"), F.lit(repl))
    s = F.replace(s, F.lit(_AMP_SENTINEL), F.lit("&"))
    s = F.replace(s, F.lit("­"), F.lit(""))
    s = F.regexp_replace(s, _WS_CLASS, " ")
    lines = F.split(s, "\n", -1)
    lines = F.transform(lines, lambda l: F.trim(F.regexp_replace(l, " {2,}", " ")))
    lines = F.filter(lines, lambda l: l != F.lit(""))
    return F.when(html.isNotNull(), F.array_join(lines, "\n"))


# anchor href: double- or single-quoted attribute value anywhere in the
# <a ...> open tag (case-insensitive; attributes may precede href)
_HREF_RE = r"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"']*)["']"""


def extract_links(html: Column) -> Column:
    """``binary`` FOREIGN html → ``array<string>`` of anchor hrefs, in
    document order, ``&amp;``-unescaped (URLs legally embed ``&`` as
    ``&amp;`` in HTML attributes).

    This is the link-graph extraction boundary: hrefs feed
    :func:`opentelemetry_collector_spark.operators.urls.pagerank` after
    resolution against the page URL's host. One vectorized
    ``regexp_extract_all`` at scan speed — zero Python, zero shuffle;
    NULL html → NULL, no anchors → empty array.
    """
    s = F.decode(html, "UTF-8")
    links = F.regexp_extract_all(s, F.lit(_HREF_RE), 1)
    return F.transform(links, lambda u: F.replace(u, F.lit("&amp;"), F.lit("&")))
