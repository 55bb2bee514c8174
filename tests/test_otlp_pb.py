"""OTLP protobuf binary codec tests (pdata/plog/pb.go analog)."""

from __future__ import annotations

from opentelemetry_collector_spark.functions.otlp_pb import (
    _dec_request,
    _enc_request,
    _f_bytes,
    _f_msg,
    _f_string,
    _f_varint,
    _varint,
)

REC = dict(
    url="event://9",
    time_unix_nano=1581452773_000000789,
    observed_ns=1581452773_000000000,
    severity_number=17,
    severity_text="Error",
    body="boom",
    attributes={"event_type": "error", "k": "x"},
    trace_id="0af7651916cd43dd8448eb211c80319c",
    span_id="b7ad6b7169203331",
    flags=1,
    dropped_attributes_count=3,
    line_no=42,
)


def test_pb_roundtrip_identity():
    back = _dec_request(_enc_request("svc-2", "de", [REC]))
    assert len(back) == 1
    b = back[0]
    for k, v in REC.items():
        assert b[k] == v, k
    assert b["host"] == "svc-2" and b["lang"] == "de"


def test_pb_proto3_defaults_omitted_and_refilled():
    zero = dict(
        url="", time_unix_nano=0, observed_ns=0, severity_number=0,
        severity_text="", body="", attributes={}, trace_id="", span_id="",
        flags=0, dropped_attributes_count=0, line_no=0,
    )
    buf = _enc_request(None, None, [zero])
    back = _dec_request(buf)[0]
    for k, v in zero.items():
        if k == "attributes":
            assert back[k] == {}
        else:
            assert back[k] == v, k


def test_pb_unknown_fields_are_skipped():
    """Forward compat: a request carrying fields this codec doesn't know
    (here: an extra varint field 15 and a length-delimited field 12 on
    the LogRecord) must decode cleanly, not crash or mis-bind."""
    base = _enc_request("h", "l", [REC])
    # rebuild with extra unknown fields spliced into the record by
    # re-encoding: append unknowns to the record payload then re-wrap
    from opentelemetry_collector_spark.functions import otlp_pb as pb

    rec_payload = pb._enc_log_record(REC) + _f_varint(15, 99) + _f_string(12, "future")
    scope = _f_string(1, "s") + _f_string(2, "v")
    scope_logs = _f_msg(1, scope) + _f_msg(2, rec_payload)
    resource = _f_msg(1, pb._enc_kv("host", "h"))
    req = _f_msg(1, _f_msg(1, resource) + _f_msg(2, scope_logs))
    back = _dec_request(req)
    assert len(back) == 1 and back[0]["url"] == REC["url"]
    assert _dec_request(base)[0]["body"] == "boom"


def test_pb_varint_boundaries():
    import itertools

    from opentelemetry_collector_spark.functions.otlp_pb import _read_varint

    for n in itertools.chain((0, 1, 127, 128, 300, 2**32, 2**63 - 1)):
        v, i = _read_varint(_varint(n), 0)
        assert v == n and i == len(_varint(n))


def test_pb_bytes_fields_hex_bridge():
    r = dict(REC, trace_id="00ff", span_id="")
    back = _dec_request(_enc_request(None, None, [r]))[0]
    assert back["trace_id"] == "00ff" and back["span_id"] == ""


SPAN = dict(
    trace_id="0af7651916cd43dd8448eb211c80319c",
    span_id="b7ad6b7169203331",
    parent_span_id="",
    trace_state="ot=svc-1",
    name="error",
    kind=1,
    start_time_unix_nano=1581452772_000000321,
    end_time_unix_nano=1581452773_000000789,
    attributes={"peer": "db-1"},
    status_code=2,
    status_message="event processing failed",
    events=[
        {
            "time_unix_nano": 1581452772_000000500,
            "name": "exception",
            "attributes": {"exception.type": "PipelineError"},
        }
    ],
    links=[
        {
            "trace_id": "0af7651916cd43dd8448eb211c80319c",
            "span_id": "1112131415161718",
            "trace_state": "",
            "attributes": {"link.type": "trace_root"},
        }
    ],
)


def test_pb_span_roundtrip_identity():
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_trace_request,
        _enc_trace_request,
    )

    back = _dec_trace_request(_enc_trace_request("svc-1", [SPAN]))
    assert len(back) == 1
    b = back[0]
    for k, v in SPAN.items():
        assert b[k] == v, (k, v, b[k])
    assert b["service"] == "svc-1"


def test_pb_span_defaults():
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_trace_request,
        _enc_trace_request,
    )

    zero = dict(
        trace_id="", span_id="", parent_span_id="", trace_state="",
        name="", kind=0, start_time_unix_nano=0, end_time_unix_nano=0,
        attributes={}, status_code=0, status_message="", events=[], links=[],
    )
    b = _dec_trace_request(_enc_trace_request(None, [zero]))[0]
    for k, v in zero.items():
        assert b[k] == v, k


def test_pb_metrics_roundtrip_identity():
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_metrics_request,
        _enc_gauge_metric,
        _enc_histogram_metric,
        _enc_metrics_request,
        _enc_sum_metric,
    )

    dps = [
        dict(start_time_unix_nano=10**9, time_unix_nano=2 * 10**9,
             attributes={"event_type": "view"}, value_double=12.25),
        dict(start_time_unix_nano=0, time_unix_nano=3 * 10**9,
             attributes={"event_type": "error"}, value_double=0.0),
    ]
    back = _dec_metrics_request(
        _enc_metrics_request(_enc_sum_metric("m.sum", 1, True, dps))
    )
    assert [b["value_double"] for b in back] == [12.25, 0.0]
    assert back[0]["metric_type"] == 2 and back[0]["is_monotonic"] is True
    assert back[0]["aggregation_temporality"] == 1
    g = _dec_metrics_request(
        _enc_metrics_request(_enc_gauge_metric("m.g", dps))
    )
    assert g[0]["metric_type"] == 1

    hist = [
        dict(attr_key="view", hist_count=5, hist_sum=10.5, hist_min=0.5,
             hist_max=4.0, hist_bucket_counts=[1, 2, 2],
             hist_explicit_bounds=[1.0, 2.5]),
        dict(attr_key="err", hist_count=0, hist_sum=None, hist_min=None,
             hist_max=None, hist_bucket_counts=[], hist_explicit_bounds=[]),
    ]
    hb = _dec_metrics_request(
        _enc_metrics_request(_enc_histogram_metric("m.h", 1, hist, "event_type"))
    )
    assert hb[0]["hist_bucket_counts"] == [1, 2, 2]
    assert hb[0]["hist_explicit_bounds"] == [1.0, 2.5]
    assert hb[0]["attributes"]["event_type"] == "view"
    assert hb[1]["hist_sum"] is None and hb[1]["hist_bucket_counts"] == []


def test_pb_exphist_and_summary_roundtrip_identity():
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_metrics_request,
        _enc_exphist_metric,
        _enc_metrics_request,
        _enc_summary_metric,
    )

    dps = [
        dict(attr_key="view", dp_count=10, dp_sum=25.5, scale=2,
             zero_count=3, positive=[(-4, 2), (-1, 1), (0, 4)]),
        dict(attr_key="err", dp_count=0, dp_sum=None, scale=0,
             zero_count=0, positive=[]),
    ]
    back = _dec_metrics_request(
        _enc_metrics_request(_enc_exphist_metric("m.eh", 1, dps, "event_type"))
    )
    assert back[0]["metric_type"] == 4 and back[0]["scale"] == 2
    assert back[0]["positive"] == [(-4, 2), (-1, 1), (0, 4)]  # zigzag offset
    assert back[0]["zero_count"] == 3 and back[0]["dp_sum"] == 25.5
    assert back[1]["positive"] == [] and back[1]["dp_sum"] is None

    sm = [dict(attr_key="view", summary_count=9, summary_sum=18.0,
               quantiles=[(0.5, 1.0), (0.9, 3.5), (0.99, 4.25)])]
    sb = _dec_metrics_request(
        _enc_metrics_request(_enc_summary_metric("m.s", sm, "event_type"))
    )
    assert sb[0]["metric_type"] == 5
    assert sb[0]["quantiles"] == [(0.5, 1.0), (0.9, 3.5), (0.99, 4.25)]


# ---------------------------------------------------------------------------
# typed AnyValue union (pdata/pcommon/value.go:31-40): every oneof member
# survives the wire; flat boundary applies the reference's AsString
# ---------------------------------------------------------------------------


def test_pb_anyvalue_typed_union_roundtrip():
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_any,
        _enc_any,
    )

    cases = [
        "plain",
        "",                       # zero-value string_value: SET oneof, emitted
        True,
        False,                    # zero-value oneof must still be emitted
        0,
        -1,                       # 10-byte two's-complement varint
        (1 << 62),
        -(1 << 62),
        0.0,
        -4.5,
        1e300,
        b"",
        b"\x00\xffraw",
        [1, "a", False, None],
        {"x": 0, "y": "s", "z": [2.5, b"b"]},
        None,                     # the EMPTY AnyValue
    ]
    for v in cases:
        back = _dec_any(_enc_any(v))
        if v is None:
            assert back is None, v
        else:
            assert back == v and type(back) is type(v), v


def test_pb_foreign_typed_attrs_survive_as_asstring():
    """A FOREIGN payload with int/double/bool/bytes/array/kvlist attrs
    must decode to the AsString coercions, not vanish as unknown
    fields (the r4 codec skipped everything but string_value)."""
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_request,
        _enc_request,
    )

    rec = {
        "body": "b",
        "url": "u",
        "attributes": {
            "i": -42,
            "d": 2.5,
            "t": True,
            "f": False,
            "by": b"\x01\x02",
            "arr": [1, "x"],
            "kv": {"n": 0},
            "empty": None,
        },
    }
    got = _dec_request(_enc_request("h", "en", [rec]))[0]["attributes"]
    assert got["i"] == "-42"
    assert got["d"] == "2.5"
    assert got["t"] == "true" and got["f"] == "false"
    assert got["by"] == "AQI="
    assert got["arr"] == '[1,"x"]'
    assert got["kv"] == '{"n":0}'
    assert got["empty"] == ""


def test_pb_asstring_matches_json_boundary_es6():
    from opentelemetry_collector_spark.functions.otlp_pb import _any_as_string
    from opentelemetry_collector_spark.functions.values import es6_float_str

    for x in (0.1, -7.5, 1e21, 1.5e-7, 123456789.0):
        assert _any_as_string(x) == es6_float_str(x)
    # nested doubles in compound values render ES6 too
    assert _any_as_string([1e21]) == f"[{es6_float_str(1e21)}]"


def test_pb_exemplar_roundtrip_identity():
    # Exemplar rides the NumberDataPoint (metrics.proto field 5): time,
    # value, span/trace ids (bytes on the wire, hex in the flat frame),
    # filtered attributes — all survive the binary round trip
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_metrics_request,
        _enc_metrics_request,
        _enc_sum_metric,
    )

    ex = dict(
        time_unix_nano=1581452773_000000789,
        value_double=4.25,
        trace_id="0af7651916cd43dd8448eb211c80319c",
        span_id="b7ad6b7169203331",
        filtered_attributes={"event_id": "42"},
    )
    dps = [
        dict(start_time_unix_nano=10**9, time_unix_nano=2 * 10**9,
             attributes={"event_type": "view"}, value_double=9.5,
             exemplars=[ex]),
        dict(start_time_unix_nano=0, time_unix_nano=3 * 10**9,
             attributes={"event_type": "error"}, value_double=0.0),
    ]
    back = _dec_metrics_request(
        _enc_metrics_request(_enc_sum_metric("m.sum", 1, True, dps))
    )
    assert back[0]["exemplars"] == [ex]
    # a point that carried none decodes to None, not [] (absence is
    # distinguishable from an empty list, like the JSON boundary's null)
    assert back[1]["exemplars"] is None


def test_pb_exemplar_foreign_as_int_coerces_to_double():
    # a FOREIGN payload using the value union's as_int member (sfixed64,
    # field 6) lands in the flat frame's single numeric column as its
    # AsDouble view — same normalization the JSON boundary applies
    import struct as st

    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_exemplar,
        _tag,
    )

    raw = _tag(2, 1) + st.pack("<Q", 7) + _tag(6, 1) + st.pack("<q", -12)
    e = _dec_exemplar(raw)
    assert e["time_unix_nano"] == 7
    assert e["value_double"] == -12.0
    assert e["trace_id"] is None and e["filtered_attributes"] == {}


def test_pb_exemplar_spark_roundtrip(spark):
    # the full Arrow surface: sum_points_with_exemplars → pb encode →
    # pb decode keeps every exemplar field and pairs it with its point
    import datetime as dt

    from opentelemetry_collector_spark.functions import otlp_pb
    from opentelemetry_collector_spark.operators import metrics as met

    events = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 0, 0, 30), 1, "view", 1.5, "{}"),
            (1, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "view", 3.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 7, 0), 1, "error", 60.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 0, 2, 0), 2, "view", 120.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pts = met.sum_points_with_exemplars(events)
    back = otlp_pb.otlp_pb_to_sum_points(
        otlp_pb.sum_points_to_otlp_pb(pts, salt_buckets=4)
    )
    want = {
        (r["metric_name"], r["attributes"]["event_type"], r["time_unix_nano"]):
            r["exemplars"][0]
        for r in pts.collect()
    }
    got = back.collect()
    assert len(got) == len(want)
    for r in got:
        ex = r["exemplars"][0]
        w = want[(r["metric_name"], r["attributes"]["event_type"],
                  r["time_unix_nano"])]
        assert ex["trace_id"] == w["trace_id"]
        assert ex["span_id"] == w["span_id"]
        assert ex["time_unix_nano"] == w["time_unix_nano"]
        assert ex["value_double"] == w["value_double"]
        assert dict(ex["filtered_attributes"]) == dict(w["filtered_attributes"])


# ---------------------------------------------------------------------------
# Property fuzz: the AnyValue wire union is total over its whole domain
# (pdata/pcommon/value.go:31-40 — Empty|Str|Bool|Int|Double|Bytes|Slice|Map,
# recursively nested). Encode→decode must be the identity for every value
# the type system admits, including zero-value oneof members ('' / false /
# 0 / 0.0 / b''), 64-bit int boundaries, NaN/±Inf bit patterns, and
# arbitrarily nested array/kvlist shapes — not just the hand-picked cases.
# ---------------------------------------------------------------------------

import struct as _struct

from hypothesis import given, settings
from hypothesis import strategies as st

_any_scalars = st.one_of(
    st.none(),
    st.text(max_size=24),
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    st.floats(allow_nan=True, allow_infinity=True),
    st.binary(max_size=16),
)

_any_values = st.recursive(
    _any_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)


def _typed_eq(a, b) -> bool:
    """Type-exact deep equality: bool is not int, 1 is not 1.0, and
    doubles compare by their 64-bit pattern (so NaN == NaN and
    -0.0 != 0.0 — the wire carries bits, not float semantics)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, float) or isinstance(b, float):
        return (
            isinstance(a, float)
            and isinstance(b, float)
            and _struct.pack("<d", a) == _struct.pack("<d", b)
        )
    if isinstance(a, list):
        return (
            isinstance(b, list)
            and len(a) == len(b)
            and all(_typed_eq(x, y) for x, y in zip(a, b))
        )
    if isinstance(a, dict):
        return (
            isinstance(b, dict)
            and a.keys() == b.keys()
            and all(_typed_eq(a[k], b[k]) for k in a)
        )
    return a == b and type(a) is type(b)


@settings(max_examples=300, deadline=None)
@given(_any_values)
def test_pb_anyvalue_fuzz_encode_decode_identity(v):
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _any_as_string,
        _dec_any,
        _enc_any,
    )

    back = _dec_any(bytes(_enc_any(v)))
    assert _typed_eq(v, back), (v, back)
    # the flat AsString boundary is total and stable across the wire:
    # rendering the decoded value must equal rendering the original
    assert _any_as_string(back) == _any_as_string(v)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=8), _any_values, max_size=5))
def test_pb_typed_attr_map_fuzz_roundtrip(attrs):
    from opentelemetry_collector_spark.functions.otlp_pb import (
        _dec_kv_typed,
        _enc_kv,
        _fields,
    )

    for k, v in attrs.items():
        k2, v2 = _dec_kv_typed(bytes(_enc_kv(k, v)))
        assert k2 == k
        assert _typed_eq(v, v2), (k, v, v2)
    # and the encoded kv is structurally valid protobuf throughout
    for k, v in attrs.items():
        list(_fields(bytes(_enc_kv(k, v))))


def test_pb_anyvalue_fallback_empty_str_is_set_oneof():
    from opentelemetry_collector_spark.functions import otlp_pb as pb

    # the non-standard-object fallback routes through str(); a value whose
    # str() is '' must still encode as a SET string_value oneof (decoding
    # to ''), not the empty AnyValue (decoding to None) — same invariant
    # the zero-value fuzz test pins for plain '' inputs
    class EmptyStr:
        def __str__(self):
            return ""

    enc = pb._enc_any(EmptyStr())
    assert enc != b""
    assert pb._dec_any(enc) == ""
    # non-empty fallback still coerces through str()
    class Weird:
        def __str__(self):
            return "w"

    assert pb._dec_any(pb._enc_any(Weird())) == "w"
