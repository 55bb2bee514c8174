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
