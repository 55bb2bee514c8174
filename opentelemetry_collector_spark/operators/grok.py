"""Grok pattern compiler: ``%{NAME:field:type}`` → typed Spark columns.

The north-star pipeline parses web/log text with "grok/regex" rules; this
module supplies the grok half as a compiler from the familiar pattern
syntax (popularised by Logstash's grok filter — the syntax itself, not
its code) to a single Java/RE2-compatible regex plus typed
``regexp_extract`` projections.  The pattern library below is hand-
written against that public syntax with every alternative chosen from the
RE2∩java.util.regex common subset (ASCII classes only — both engines
treat ``\\w``/``\\d``/``\\s`` as ASCII, unlike Python), so a compiled
pattern behaves identically in Spark and in the DuckDB oracle.

Grok semantics implemented:

- ``%{NAME}`` expands to a non-capturing group of the library regex;
- ``%{NAME:field}`` captures it as ``field`` (string);
- ``%{NAME:field:int|long|float|double}`` adds a numeric cast;
- text outside ``%{}`` is passed through verbatim (it IS regex, per grok
  convention — escape literals yourself);
- custom patterns may reference library or other custom patterns;
  expansion is recursive with a depth guard (cycles raise).

Scale: :func:`grok_extract` is a narrow per-row projection — no shuffle,
no Python; it runs at scan speed and the match predicate pushes down like
any other filter.  Each captured field is one ``regexp_extract`` over the
same compiled regex (Java regex has no multi-group extract built-in);
for very wide patterns the Arrow parse engine
(``parse._parse_lines_arrow``) is the single-pass alternative.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class GrokError(ValueError):
    """Bad grok pattern: unknown name, cycle, or malformed reference."""


# Standard grok pattern names, re-expressed in the RE2∩Java-safe subset.
# (No backreferences, no lookaround, no possessive quantifiers, ASCII
# classes only — the exact regex text runs unchanged in both engines.)
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"[0-9a-fA-F]+",
    "POSINT": r"[1-9]\d*",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",  # v4 only: v6 zone syntax is not engine-portable
    "HOSTNAME": r"[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)*",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    # single linear form, NOT (?:/[^\s?#]*)+ — the inner class matches
    # '/' so segment boundaries are ambiguous and a failing match
    # backtracks exponentially (2^segments); this is match-equivalent
    "PATH": r"/[^\s?#]*",
    "URIPARAM": r"\?[^\s#]*",
    "QS": r'"[^"]*"',
    "QUOTEDSTRING": r'"[^"]*"',
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|CRITICAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "MONTH": r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "TIME": r"(?:2[0123]|[01]?\d):[0-5]\d:(?:[0-5]\d)(?:\.\d+)?",
    "MAC": r"(?:[0-9a-fA-F]{2}:){5}[0-9a-fA-F]{2}",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    # syslog's classic "Jan  2 15:04:05" (day may be space-padded)
    "SYSLOGTIMESTAMP": (
        r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
        r" +(?:0?[1-9]|[12]\d|3[01]) (?:2[0123]|[01]?\d):[0-5]\d:[0-5]\d"
    ),
    "SYSLOGPROG": r"[\w._/-]+(?:\[\d+\])?",
}

_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double"}

# %{NAME}, %{NAME:field}, %{NAME:field:type} — compiled with re.ASCII so
# Python's \w agrees with the Java/RE2 ASCII semantics of the output
_REF_RE = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}", re.ASCII)


def compile_grok(
    pattern: str, custom: dict[str, str] | None = None, _depth: int = 0
) -> tuple[str, list[tuple[str, str | None]]]:
    """Expand a grok pattern to ``(regex, fields)``.

    ``fields`` is the ordered list of ``(name, cast)`` for the capture
    groups, so field i binds to regex group i+1.  ONLY ``%{NAME:field}``
    references capture: expanded bodies and any capturing groups a user
    writes in the raw-regex portion are rewritten non-capturing (a bare
    ``(...)`` would otherwise shift every later field's group number and
    silently mis-bind it — matching semantics are unchanged, and a
    backreference to such a group turns into a loud compile error).
    """
    if _depth > 16:
        raise GrokError("grok expansion too deep (pattern cycle?)")
    library = dict(GROK_PATTERNS)
    if custom:
        library.update(custom)
    fields: list[tuple[str, str | None]] = []
    out: list[str] = []
    pos = 0

    def _noncapture(chunk: str) -> str:
        # rewrite capturing '(' to '(?:' — but only OUTSIDE character
        # classes ('[(]' must stay a literal paren class, not become
        # '[(?:]') and never when escaped
        out_chars: list[str] = []
        in_class = escaped = False
        i = 0
        while i < len(chunk):
            ch = chunk[i]
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif in_class:
                if ch == "]":
                    in_class = False
            elif ch == "[":
                in_class = True
            elif ch == "(" and chunk[i + 1 : i + 2] != "?":
                out_chars.append("(?:")
                i += 1
                continue
            out_chars.append(ch)
            i += 1
        return "".join(out_chars)

    for m in _REF_RE.finditer(pattern):
        out.append(_noncapture(pattern[pos : m.start()]))
        pos = m.end()
        name, field, cast = m.group(1), m.group(2), m.group(3)
        if name not in library:
            raise GrokError(f"unknown grok pattern %{{{name}}}")
        if cast is not None and cast not in _CASTS:
            raise GrokError(f"unknown grok cast :{cast} (use int/long/float/double)")
        body, _inner = compile_grok(library[name], custom, _depth + 1)
        body = _noncapture(body)
        if field:
            fields.append((field, _CASTS.get(cast) if cast else None))
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
    out.append(_noncapture(pattern[pos:]))
    regex = "".join(out)
    try:
        # FutureWarning→error: a pattern whose meaning Python reserves
        # for future semantics ("[[" nested-set / "--" set-difference
        # candidates) is ambiguous across engines TODAY — reject it like
        # any other invalid pattern instead of emitting a warning that a
        # future interpreter turns into different match behavior
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            compiled = re.compile(regex, re.ASCII)
    except (re.error, FutureWarning) as e:
        raise GrokError(f"expanded grok regex invalid: {e}") from e
    if compiled.groups != len(fields):
        # enforced invariant: an unneutralized capture (e.g. behind a
        # double backslash) must fail loudly, never mis-bind fields
        raise GrokError(
            f"grok group accounting mismatch: {compiled.groups} regex groups "
            f"for {len(fields)} fields in {pattern!r}"
        )
    return regex, fields


def grok_columns(
    text: Column, pattern: str, custom: dict[str, str] | None = None
) -> dict[str, Column]:
    """Compiled grok as a dict of typed Columns over ``text``.

    Non-matching rows yield NULL for every field (``regexp_extract``'s
    bare '' would be indistinguishable from a real empty capture, so the
    match is gated explicitly — same rlike gate as OTTL extract_patterns).
    """
    regex, fields = compile_grok(pattern, custom)
    matched = text.rlike(regex)
    cols: dict[str, Column] = {}
    for i, (name, cast) in enumerate(fields, start=1):
        c = F.when(matched, F.regexp_extract(text, regex, i))
        cols[name] = c.cast(cast) if cast else c
    return cols


def grok_extract(
    df: DataFrame,
    pattern: str,
    text_col: str = "line",
    custom: dict[str, str] | None = None,
) -> DataFrame:
    """Append one typed column per named grok capture to ``df``.

    Existing columns with the same name are replaced (withColumns
    semantics).  Rows that don't match keep their other columns and get
    NULL captures — filter on any capture's nullity (or pre-filter with
    ``df.where(F.col(text_col).rlike(regex))`` to push the match to the
    scan) to drop them.
    """
    return df.withColumns(grok_columns(F.col(text_col), pattern, custom))
