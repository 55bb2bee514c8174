"""OTTL-subset compiler: transformation statements → Spark Column expressions.

The reference's query language is the OTTL design (docs/processing.md) —
statements like::

    set(attributes["source"], "web")
    delete(attributes["http.user_agent"])
    keep_keys(attributes, "ip", "status")
    replace_match(attributes["path"], "/r/4*", "/r/4xx")
    drop() where attributes["status"] == "404"
    keep() where severity_number >= 17

(docs/processing.md:96-135 statement forms, 147-167 set/delete, 173-191
replace_match, 118-135/205-209 drop-where.)

We compile each statement to *built-in* Spark SQL expressions — never a
UDF — so Catalyst can constant-fold, push filters below the parse's
explode, and keep everything inside whole-stage codegen. A compiled
``drop() where status == "404"`` is exactly ``df.filter(...)`` and shows up
as a PushedFilter when it reaches a scan. This mirrors the reference's
design split: OTTL is the surface syntax, the collector compiles it to its
execution primitives (there: closures over pdata; here: Catalyst
expressions).

Grammar (recursive descent, no dependencies)::

    statement  := editor "(" args ")" [ "where" orexpr ]
    orexpr     := andexpr { "or" andexpr }
    andexpr    := unary { "and" unary }
    unary      := "not" unary | "(" orexpr ")" | comparison
    comparison := term [ ("==" | "!=" | ">=" | "<=" | ">" | "<") term ]
    term       := literal | funccall | path
    funccall   := NAME "(" args ")"
    path       := NAME { "." NAME } [ "[" STRING "]" ]

Paths resolve against the flat log_records model: ``attributes["k"]`` →
``element_at(attributes, 'k')``; ``resource.host`` → ``resource.host``;
bare names → top-level columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- tokenizer ---------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<op>==|!=|>=|<=|>|<)
  | (?P<punct>[()\[\],.])
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass
class Token:
    kind: str
    text: str


def _tokenize(s: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise OTTLSyntaxError(f"unexpected character at {pos}: {s[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Token(kind, m.group()))
    return out


class OTTLSyntaxError(ValueError):
    pass


# --- AST ---------------------------------------------------------------------

@dataclass
class Lit:
    value: object


@dataclass
class Path:
    parts: tuple[str, ...]
    key: str | None = None  # attributes["key"]


@dataclass
class Call:
    name: str
    args: list


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class NotOp:
    operand: object


@dataclass
class Statement:
    editor: Call
    where: object | None


# --- parser ------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Token | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise OTTLSyntaxError("unexpected end of statement")
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        t = self.next()
        if t.text != text:
            raise OTTLSyntaxError(f"expected {text!r}, got {t.text!r}")

    def parse_statement(self) -> Statement:
        editor = self.parse_call()
        where = None
        t = self.peek()
        if t is not None and t.text == "where":
            self.next()
            where = self.parse_or()
        if self.peek() is not None:
            raise OTTLSyntaxError(f"trailing tokens: {self.peek().text!r}")
        return Statement(editor, where)

    def parse_call(self) -> Call:
        name = self.next()
        if name.kind != "name":
            raise OTTLSyntaxError(f"expected function name, got {name.text!r}")
        self.expect("(")
        args = []
        if self.peek() and self.peek().text != ")":
            args.append(self.parse_or())
            while self.peek() and self.peek().text == ",":
                self.next()
                args.append(self.parse_or())
        self.expect(")")
        return Call(name.text, args)

    def parse_or(self):
        left = self.parse_and()
        while self.peek() and self.peek().text == "or":
            self.next()
            left = BinOp("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_unary()
        while self.peek() and self.peek().text == "and":
            self.next()
            left = BinOp("and", left, self.parse_unary())
        return left

    def parse_unary(self):
        t = self.peek()
        if t and t.text == "not":
            self.next()
            return NotOp(self.parse_unary())
        if t and t.text == "(":
            self.next()
            inner = self.parse_or()
            self.expect(")")
            return self.parse_cmp_tail(inner)
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_term()
        return self.parse_cmp_tail(left)

    def parse_cmp_tail(self, left):
        t = self.peek()
        if t and t.kind == "op":
            self.next()
            right = self.parse_term()
            return BinOp(t.text, left, right)
        return left

    def parse_term(self):
        t = self.peek()
        if t is None:
            raise OTTLSyntaxError("unexpected end in expression")
        if t.kind == "string":
            self.next()
            return Lit(_unquote(t.text))
        if t.kind == "number":
            self.next()
            return Lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "name":
            if t.text in ("true", "false"):
                self.next()
                return Lit(t.text == "true")
            if t.text == "nil":
                self.next()
                return Lit(None)
            # lookahead: function call vs path
            if self.i + 1 < len(self.toks) and self.toks[self.i + 1].text == "(":
                return self.parse_call()
            return self.parse_path()
        if t.text == "(":
            self.next()
            inner = self.parse_or()
            self.expect(")")
            return inner
        raise OTTLSyntaxError(f"unexpected token {t.text!r}")

    def parse_path(self) -> Path:
        parts = [self.next().text]
        while self.peek() and self.peek().text == ".":
            self.next()
            parts.append(self.next().text)
        key = None
        if self.peek() and self.peek().text == "[":
            self.next()
            kt = self.next()
            if kt.kind != "string":
                raise OTTLSyntaxError("map index must be a string literal")
            key = _unquote(kt.text)
            self.expect("]")
        return Path(tuple(parts), key)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace('\\"', '"').replace("\\\\", "\\")


def parse_statement(text: str) -> Statement:
    return _Parser(_tokenize(text)).parse_statement()


# --- compiler ----------------------------------------------------------------

def glob_to_regex(glob: str) -> str:
    """OTTL replace_match glob (docs/processing.md:173-191) → anchored regex."""
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


# expression-level OTTL functions (docs/processing.md:137-142 function registry)
_FUNCS: dict[str, Callable[..., Column]] = {
    "IsMatch": lambda target, pattern: _c(target).rlike(_lit_str(pattern)),
    "Len": lambda target: F.length(_c(target)),
    # try_cast, not cast: OTTL's Int()/Double() converters return nil on an
    # unconvertible value (the condition then evaluates false for that
    # row); under the session's ANSI mode a plain cast of e.g. "12x"
    # would abort the whole job instead
    "Int": lambda target: _c(target).try_cast("long"),
    "Double": lambda target: _c(target).try_cast("double"),
    "Concat": lambda sep, *parts: F.concat_ws(_lit_str(sep), *[_c(p) for p in parts]),
    "Lower": lambda target: F.lower(_c(target)),
    "Upper": lambda target: F.upper(_c(target)),
    "Substring": lambda target, start, length: F.substring(
        _c(target), _lit_int(start) + 1, _lit_int(length)
    ),
    "TraceID": lambda target: _c(target),  # identity in the hex-string model
    "SpanID": lambda target: _c(target),
    # attributesprocessor "hash" action analogs (attraction.go HASH)
    "SHA1": lambda target: F.sha1(_c(target).cast("binary")),
    "SHA256": lambda target: F.sha2(_c(target).cast("binary"), 256),
    "MD5": lambda target: F.md5(_c(target).cast("binary")),
    "Trim": lambda target: F.trim(_c(target)),
    # OTTL Split takes a literal delimiter (not a regex): \Q..\E quotes it
    # for the Java regex engine behind F.split; an embedded \E would
    # terminate the quoting early (classic injection), so it is split
    # out and matched as escaped literal characters
    "Split": lambda target, sep: F.split(
        _c(target),
        "\\Q" + _lit_str(sep).replace("\\E", "\\E\\\\E\\Q") + "\\E",
    ),
    # ParseJSON → the flat map model (nested values come back as their
    # JSON text; a non-object document yields nil, matching the
    # converter's error-becomes-no-op behavior under set())
    "ParseJSON": lambda target: F.from_json(_c(target), "map<string,string>"),
    "ConvertCase": lambda target, mode: _convert_case(_c(target), _lit_str(mode)),
    # the Unix* family over the model's ns-epoch longs; integer division
    # (ns exceeds 2^53 — a double /1e3 loses the microsecond)
    "UnixNano": lambda t: _c(t).cast("long"),
    "UnixMicro": lambda t: _ns_div(_c(t), 1_000),
    "UnixMilli": lambda t: _ns_div(_c(t), 1_000_000),
    "UnixSeconds": lambda t: _ns_div(_c(t), 1_000_000_000),
    # TruncateTime(t, "1h"): round DOWN to the duration bucket (pmod
    # floors for negative epochs too — Go Time.Truncate "rounds down",
    # so a pre-1970 instant lands in the bucket below zero, not above;
    # an oracle twin must floor likewise: t - ((t % s + s) % s))
    "TruncateTime": lambda t, d: _c(t).cast("long")
    - F.pmod(_c(t).cast("long"), F.lit(_parse_duration_ns(_lit_str(d)))),
    # calendar extractors over the model's ns-epoch longs (ottlfuncs
    # Year/Month/Day/Hour/Minute/Second over time.Time; session TZ is
    # pinned UTC so these match Go's t.UTC() components)
    "Year": lambda t: F.year(_ns_ts(t)),
    "Month": lambda t: F.month(_ns_ts(t)),
    "Day": lambda t: F.dayofmonth(_ns_ts(t)),
    "Hour": lambda t: F.hour(_ns_ts(t)),
    "Minute": lambda t: F.minute(_ns_ts(t)),
    "Second": lambda t: F.second(_ns_ts(t)),
    # Duration("1h30m") → ns long (the model's duration representation);
    # the *s converters then read components back out of a duration
    "Duration": lambda d: F.lit(_parse_duration_ns(_lit_str(d))),
    "Nanoseconds": lambda d: _c(d).cast("long"),
    "Microseconds": lambda d: _ns_div(_c(d), 1_000),
    "Milliseconds": lambda d: _ns_div(_c(d), 1_000_000),
    "Seconds": lambda d: _ns_div(_c(d), 1_000_000_000),
    "Minutes": lambda d: _ns_div(_c(d), 60 * 10**9),
    "Hours": lambda d: _ns_div(_c(d), 3600 * 10**9),
    # Hex: Go %x renders lowercase
    "Hex": lambda t: F.lower(F.hex(_c(t).cast("long"))),
    "SHA512": lambda target: F.sha2(_c(target).cast("binary"), 512),
    "Base64Decode": lambda t: F.unbase64(_c(t)).cast("string"),
    # type predicates over the flat string model: IsString is
    # non-NULL-ness (every stored scalar is a string here); Is{Int,
    # Double} probe convertibility the same way Int()/Double() do;
    # IsBool accepts the two JSON booleans case-insensitively
    "IsString": lambda t: _c(t).isNotNull(),
    "IsInt": lambda t: _c(t).try_cast("long").isNotNull(),
    "IsDouble": lambda t: _c(t).try_cast("double").isNotNull(),
    "IsBool": lambda t: F.lower(_c(t)).isin("true", "false"),
    # map converters (pcommon.Map analogs on the attributes column)
    "Keys": lambda m: F.map_keys(_c(m)),
    "Values": lambda m: F.map_values(_c(m)),
    # ParseKeyValue(target, kv_delimiter, pair_delimiter) — defaults per
    # ottlfuncs: "=" between key and value, " " between pairs
    "ParseKeyValue": lambda t, kv="=", pair=" ": F.str_to_map(
        _c(t), F.lit(_lit_str(pair)), F.lit(_lit_str(kv))
    ),
    "Log": lambda t: F.log(_c(t).try_cast("double")),
    "Sqrt": lambda t: F.sqrt(_c(t).try_cast("double")),
}


def _ns_ts(t) -> Column:
    """ns-epoch long → timestamp (µs precision, UTC session)."""
    return F.timestamp_micros(F.call_function("div", _c(t).cast("long"), F.lit(1_000)))


def _ns_div(col: Column, divisor: int) -> Column:
    return F.call_function("div", col.cast("long"), F.lit(divisor))


def _convert_case(col: Column, mode: str) -> Column:
    """OTTL ConvertCase modes over the engine-portable subset: lower,
    upper, and snake (camel/Pascal humps → underscored lowercase)."""
    if mode == "lower":
        return F.lower(col)
    if mode == "upper":
        return F.upper(col)
    if mode == "snake":
        return F.lower(F.regexp_replace(col, "([a-z0-9])([A-Z])", "$1_$2"))
    raise OTTLSyntaxError(f"ConvertCase: unsupported mode {mode!r}")


_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|ms|s|m|h)", re.ASCII)
_DUR_NS = {"ns": 1, "us": 1_000, "ms": 1_000_000, "s": 10**9, "m": 60 * 10**9, "h": 3600 * 10**9}


def _parse_duration_ns(text: str) -> int:
    """Go-style duration literal ("90s", "1h30m", "250ms") → nanoseconds."""
    pos, total = 0, 0
    for m in _DUR_RE.finditer(text):
        if m.start() != pos:
            raise OTTLSyntaxError(f"bad duration literal {text!r}")
        total += int(float(m.group(1)) * _DUR_NS[m.group(2)])
        pos = m.end()
    if pos != len(text) or total <= 0:
        raise OTTLSyntaxError(f"bad duration literal {text!r}")
    return total


def _lit_str(v) -> str:
    if isinstance(v, Column):
        raise OTTLSyntaxError("expected a string literal")
    return v


def _lit_int(v) -> int:
    if isinstance(v, Column):
        raise OTTLSyntaxError("expected an int literal")
    return int(v)


class OTTLCompiler:
    """Compiles parsed statements against the flat log_records model."""

    def __init__(self, attributes_col: str = "attributes"):
        self.attributes_col = attributes_col

    # -- expression compilation (returns Column or python literal) --

    def expr(self, node) -> object:
        if isinstance(node, Lit):
            return node.value
        if isinstance(node, Path):
            return self.path(node)
        if isinstance(node, Call):
            fn = _FUNCS.get(node.name)
            if fn is None:
                raise OTTLSyntaxError(f"unknown OTTL function {node.name!r}")
            return fn(*[self.expr(a) for a in node.args])
        if isinstance(node, NotOp):
            return ~self.to_column(self.expr(node.operand))
        if isinstance(node, BinOp):
            if node.op in ("and", "or"):
                l = self.to_column(self.expr(node.left))
                r = self.to_column(self.expr(node.right))
                return (l & r) if node.op == "and" else (l | r)
            l, r = self.expr(node.left), self.expr(node.right)
            lc = self._as_operand(l)
            if node.op == "==":
                return lc == r if not _is_nil(r) else lc.isNull()
            if node.op == "!=":
                return lc != r if not _is_nil(r) else lc.isNotNull()
            if node.op == ">":
                return lc > r
            if node.op == "<":
                return lc < r
            if node.op == ">=":
                return lc >= r
            if node.op == "<=":
                return lc <= r
        raise OTTLSyntaxError(f"cannot compile node {node!r}")

    def _as_operand(self, v) -> Column:
        return v if isinstance(v, Column) else F.lit(v)

    def to_column(self, v) -> Column:
        return v if isinstance(v, Column) else F.lit(v)

    def path(self, p: Path) -> Column:
        if p.parts[0] == self.attributes_col or p.parts == ("attributes",):
            if p.key is None:
                return F.col(self.attributes_col)
            return F.element_at(F.col(self.attributes_col), F.lit(p.key))
        if p.parts[0] == "resource":
            if len(p.parts) == 2:
                return F.col("resource").getField(p.parts[1])
            if p.key is not None and p.parts[-1] == "attributes":
                # resource.attributes["x"] — resource is a typed struct here
                return F.col("resource").getField(p.key)
            return F.col("resource")
        return F.col(".".join(p.parts))

    # -- statement compilation (returns DataFrame -> DataFrame) --

    def compile(self, text: str) -> Callable[[DataFrame], DataFrame]:
        stmt = parse_statement(text)
        ed = stmt.editor
        cond = self.to_column(self.expr(stmt.where)) if stmt.where is not None else None

        # OTTL condition semantics: a comparison against a missing key is
        # false, not NULL — so drop() keeps rows where cond is not TRUE
        # (SQL three-valued logic would otherwise drop NULL-cond rows too).
        if ed.name == "drop":
            if cond is None:
                raise OTTLSyntaxError("drop() requires a where clause")
            return lambda df: df.filter(~F.coalesce(cond, F.lit(False)))
        if ed.name == "keep":
            if cond is None:
                raise OTTLSyntaxError("keep() requires a where clause")
            return lambda df: df.filter(F.coalesce(cond, F.lit(False)))

        if ed.name == "set":
            target, value_node = ed.args[0], ed.args[1]
            value = self._as_operand(self.expr(value_node)).cast("string")
            if not isinstance(target, Path):
                raise OTTLSyntaxError("set() target must be a path")
            if target.key is not None:
                key = target.key
                # set(target, nil) is a NO-OP per the reference's set()
                # ("no action" on nil value): the map — including any
                # existing entry under this key — must pass through
                # untouched, not lose the key or gain a NULL-valued entry
                new_attrs = F.when(
                    value.isNotNull(),
                    F.map_concat(
                        F.map_filter(
                            F.col(self.attributes_col), lambda k, v: k != F.lit(key)
                        ),
                        F.map_from_arrays(F.array(F.lit(key)), F.array(value)),
                    ),
                ).otherwise(F.col(self.attributes_col))
                return self._apply_to_col(self.attributes_col, new_attrs, cond)
            col_name = ".".join(target.parts)
            operand = self._as_operand(self.expr(value_node))
            # same nil no-op for column targets — resolved at apply time
            # so set() can still CREATE a column that doesn't exist yet
            return self._apply_to_col(col_name, operand, cond, nil_keep_old=True)

        if ed.name == "delete" or ed.name == "delete_key":
            target = ed.args[0]
            if not isinstance(target, Path) or target.key is None:
                raise OTTLSyntaxError("delete() needs attributes[\"key\"]")
            key = target.key
            new_attrs = F.map_filter(F.col(self.attributes_col), lambda k, v: k != F.lit(key))
            return self._apply_to_col(self.attributes_col, new_attrs, cond)

        if ed.name == "keep_keys":
            target, keys = ed.args[0], [a.value for a in ed.args[1:]]
            if not isinstance(target, Path):
                raise OTTLSyntaxError("keep_keys() target must be a path")
            keys_arr = F.array(*[F.lit(k) for k in keys])
            new_attrs = F.map_filter(
                F.col(self.attributes_col), lambda k, v: F.array_contains(keys_arr, k)
            )
            return self._apply_to_col(self.attributes_col, new_attrs, cond)

        if ed.name == "replace_match":
            target, glob, repl = ed.args[0], ed.args[1].value, ed.args[2].value
            tcol = self.path(target)
            regex = glob_to_regex(glob)
            newval = F.when(tcol.rlike(regex), F.lit(repl)).otherwise(tcol)
            return self._set_path(target, newval, cond)

        if ed.name == "replace_pattern":
            target, pattern, repl = ed.args[0], ed.args[1].value, ed.args[2].value
            tcol = self.path(target)
            newval = F.regexp_replace(tcol, pattern, repl)
            return self._set_path(target, newval, cond)

        if ed.name == "truncate_all":
            limit = ed.args[1].value
            new_attrs = F.transform_values(
                F.col(self.attributes_col), lambda k, v: F.substring(v, 1, int(limit))
            )
            return self._apply_to_col(self.attributes_col, new_attrs, cond)

        if ed.name == "limit":
            # attributesprocessor limit action: keep at most n attributes.
            # pcommon.Map is insertion-ordered; our normalized map has no
            # order, so "first n" is defined as the n smallest keys —
            # deterministic and consistent with the sorted text renderer.
            n = int(ed.args[1].value)
            new_attrs = F.map_from_entries(
                F.slice(F.sort_array(F.map_entries(F.col(self.attributes_col))), 1, n)
            )
            return self._apply_to_col(self.attributes_col, new_attrs, cond)

        if ed.name == "extract_patterns":
            # upsert one attribute per named capture group on match
            # (transformprocessor ExtractPatterns); Java (?<name>...)
            # syntax — group names/indexes discovered with a scanner
            # (Python re only accepts (?P<name>), so no re.compile here)
            target, pattern = ed.args[0], ed.args[1].value
            tcol = self.path(target)
            groups = _named_groups(pattern)
            if not groups:
                raise OTTLSyntaxError("extract_patterns needs named capture groups")
            names_arr = F.array(*[F.lit(g) for g in groups])
            # gate on the full pattern matching (rlike): when it does, ALL
            # named groups are set — a group that legitimately captures ''
            # is upserted as '' instead of dropped; on a miss the map is
            # untouched. (regexp_extract cannot distinguish a
            # non-participating group from an empty match — both set '';
            # that residual deviation is inherent to the builtin.)
            matched = tcol.rlike(pattern)
            extracted = F.map_from_entries(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("key"),
                            F.regexp_extract(tcol, pattern, idx).alias("value"),
                        )
                        for name, idx in groups.items()
                    ]
                )
            )
            new_attrs = F.when(
                matched,
                F.map_concat(
                    F.map_filter(
                        F.col(self.attributes_col),
                        lambda k, v: ~F.array_contains(names_arr, k),
                    ),
                    extracted,
                ),
            ).otherwise(F.col(self.attributes_col))
            return self._apply_to_col(self.attributes_col, new_attrs, cond)

        raise OTTLSyntaxError(f"unknown editor {ed.name!r}")

    def _set_path(self, target: Path, value: Column, cond: Column | None):
        if target.key is not None:
            key = target.key
            new_attrs = F.map_concat(
                F.map_filter(F.col(self.attributes_col), lambda k, v: k != F.lit(key)),
                F.map_from_entries(
                    F.filter(
                        F.array(F.struct(F.lit(key).alias("key"), value.alias("value"))),
                        lambda s: s.getField("value").isNotNull(),
                    )
                ),
            )
            return self._apply_to_col(self.attributes_col, new_attrs, cond)
        return self._apply_to_col(".".join(target.parts), value, cond)

    def _apply_to_col(
        self,
        col_name: str,
        new_value: Column,
        cond: Column | None,
        nil_keep_old: bool = False,
    ):
        def apply(df: DataFrame) -> DataFrame:
            # column existence is only knowable at apply time; a set()
            # that CREATES a column must not reference the old value
            # (unresolved-column analysis error), so the nil-no-op
            # coalesce and the where-else branch fall back to NULL then
            exists = col_name in df.columns
            old = F.col(col_name) if exists else F.lit(None)
            val = (
                F.coalesce(new_value, old) if (nil_keep_old and exists) else new_value
            )
            if cond is not None:
                val = F.when(cond, val).otherwise(old)
            return df.withColumn(col_name, val)

        return apply


def _named_groups(pattern: str) -> dict[str, int]:
    """Java-regex named-group discovery: name → overall capture-group
    index. Skips escapes, character classes and (?: (?= (?! non-capturing
    constructs; unnamed capturing groups still consume an index."""
    out: dict[str, int] = {}
    idx = 0
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            if pattern.startswith("(?<", i) and not pattern.startswith("(?<=", i) and not pattern.startswith("(?<!", i):
                end = pattern.find(">", i)
                if end == -1:
                    # unterminated group name — malformed regex; the Java
                    # runtime will reject it, nothing to index here
                    i += 3
                    continue
                idx += 1
                out[pattern[i + 3 : end]] = idx
                i = end + 1
                continue
            if pattern.startswith("(?", i):
                i += 2  # non-capturing / lookaround: no index
                continue
            idx += 1
        i += 1
    return out


def _is_nil(v) -> bool:
    return v is None and not isinstance(v, Column)


def compile_statements(
    statements: list[str], attributes_col: str = "attributes"
) -> Callable[[DataFrame], DataFrame]:
    """Compile a list of OTTL statements into one DataFrame transform,
    applied in order (the reference applies transform statements
    sequentially within a processor)."""
    comp = OTTLCompiler(attributes_col)
    fns = [comp.compile(s) for s in statements]

    def run(df: DataFrame) -> DataFrame:
        for fn in fns:
            df = fn(df)
        return df

    return run


def compile_condition(text: str, attributes_col: str = "attributes") -> Column:
    """Compile a bare OTTL boolean expression (router predicates,
    filterprocessor-style conditions) to a Column."""
    comp = OTTLCompiler(attributes_col)
    parser = _Parser(_tokenize(text))
    node = parser.parse_or()
    if parser.peek() is not None:
        raise OTTLSyntaxError(f"trailing tokens: {parser.peek().text!r}")
    return comp.to_column(comp.expr(node))
