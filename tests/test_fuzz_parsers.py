"""Hypothesis fuzzing of the hand-written parsers: the OTTL compiler and
the config resolver must either succeed or raise their own typed error on
ANY input — never leak an unrelated exception (a malformed config/rule at
deploy time must produce a diagnosable ConfigError/OTTLSyntaxError, not a
stack trace from parser internals)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.operators.ottl import (
    OTTLSyntaxError,
    _named_groups,
    parse_statement,
)
from opentelemetry_collector_spark.plans.config import ConfigError, resolve_config

# adversarial fragments biased toward the grammars' tokens
_OTTL_FRAGMENTS = st.sampled_from(
    [
        "set", "drop", "keep", "(", ")", "[", "]", ",", '"x"', "attributes",
        '["k"]', "where", "==", "!=", "and", "or", "not", "1.5", "-3",
        'replace_match', "nil", ".", "resource", "body", '"unterminated',
        "\\", "€", " ",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_OTTL_FRAGMENTS, min_size=0, max_size=12).map("".join))
def test_ottl_parser_total(text):
    try:
        parse_statement(text)
    except OTTLSyntaxError:
        pass  # the one allowed failure mode


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_ottl_parser_total_random(text):
    try:
        parse_statement(text)
    except OTTLSyntaxError:
        pass


_CFG_FRAGMENTS = st.sampled_from(
    [
        "${env:", "${file:", "${yaml:", "}", "${", "$", "VAR", ":",
        "a: b\n", "- x\n", "{", "nested: {k: v}\n", "  ", "\t", '"', "€",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_CFG_FRAGMENTS, min_size=0, max_size=10).map("".join))
def test_resolver_total(text):
    try:
        resolve_config([text], env={"VAR": "1"})
    except ConfigError:
        pass  # the one allowed failure mode (yaml errors are wrapped)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc()[]<>?=!\\|*+.", max_size=40))
def test_named_group_scanner_total(pattern):
    out = _named_groups(pattern)
    assert all(isinstance(k, str) and isinstance(v, int) for k, v in out.items())


# --- grok compiler totality + soundness ---

_GROK_FRAGMENTS = st.sampled_from(
    [
        "%{", "}", "%{INT}", "%{WORD:w}", "%{NUMBER:n:float}", "%{NOPE}",
        "%{INT:x:decimal}", ":", "%", "{", "\\[", "(", ")", "[", "a-", " ",
        "literal", "\\d+", "^", "$", "|", "*",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_GROK_FRAGMENTS, min_size=0, max_size=10).map("".join))
def test_grok_compiler_total(pattern):
    """compile_grok either succeeds or raises GrokError — never an
    unrelated exception — and a success is always a valid ASCII regex
    whose capture-group count equals the field list."""
    import re as _re

    from opentelemetry_collector_spark.operators.grok import GrokError, compile_grok

    try:
        regex, fields = compile_grok(pattern)
    except GrokError:
        return
    compiled = _re.compile(regex, _re.ASCII)
    assert compiled.groups == len(fields)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["WORD", "INT", "NUMBER", "IPV4", "NOTSPACE", "UUID", "LOGLEVEL"]
        ),
        min_size=1,
        max_size=6,
        unique=True,
    )
)
def test_grok_field_binding_positions(names):
    """Every named capture binds to its own group, in declaration order,
    regardless of which library patterns surround it."""
    import re as _re

    from opentelemetry_collector_spark.operators.grok import compile_grok

    pattern = " ".join(f"%{{{n}:f{i}}}" for i, n in enumerate(names))
    regex, fields = compile_grok(pattern)
    assert [f for f, _ in fields] == [f"f{i}" for i in range(len(names))]
    samples = {
        "WORD": "abc_1",
        "INT": "-42",
        "NUMBER": "3.14",
        "IPV4": "10.0.0.255",
        "NOTSPACE": "a/b?c=d",
        "UUID": "123e4567-e89b-42d3-a456-426614174000",
        "LOGLEVEL": "WARN",
    }
    line = " ".join(samples[n] for n in names)
    m = _re.fullmatch(regex, line, _re.ASCII)
    assert m is not None
    for i, n in enumerate(names):
        assert m.group(i + 1) == samples[n]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="theinandorgstou", min_size=0, max_size=12),
        min_size=0,
        max_size=6,
    )
)
def test_bpe_columnar_equals_canonical_encoder(spark, words):
    """The chained-replace columnar BPE equals the canonical
    lowest-rank-pair encoder loop on arbitrary words over the merge
    alphabet (the equivalence argued in bpe_word_expr's docstring)."""
    from opentelemetry_collector_spark.operators.textstats import (
        DEFAULT_BPE_MERGES,
        bpe_encode,
    )
    from tests.test_textstats import _bpe_reference

    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = bpe_encode(df).first()
    clean = [w for w in text.strip().split(" ") if w]
    ref = [_bpe_reference(w, DEFAULT_BPE_MERGES) for w in clean]
    assert got["n_words"] == len(clean)
    assert got["bpe_tokens"] == sum(len(t) for t in ref)
    if clean:
        assert got["enc_head"] == "|".join(ref[0])
