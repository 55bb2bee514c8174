"""OTLP protobuf (binary wire) Logs marshal/unmarshal — the
pdata/plog/pb.go:26-40 analog (MarshalProto / UnmarshalProto / Sizer).

The reference marshals plog frames to the proto wire form of
ExportLogsServiceRequest. This container has no protoc and no
spark-protobuf descriptor registry, so the wire codec is a hand-written
minimal proto3 encoder/decoder for the public OTLP logs schema
(opentelemetry/proto/logs/v1/logs.proto + common/v1/common.proto +
collector/logs/v1/logs_service.proto), applied over Arrow batches via
``mapInPandas`` — a DECLARED Arrow surface (the same boundary class as
the multimodal codec): envelopes are grouped/bounded JVM-side first, and
only the byte-level encode/decode crosses into Python.

Field map (wire numbers/types from the public .proto files):

- ExportLogsServiceRequest: 1 repeated ResourceLogs
- ResourceLogs:   1 Resource, 2 repeated ScopeLogs, 3 schema_url
- Resource:       1 repeated KeyValue, 2 dropped_attributes_count
- ScopeLogs:      1 InstrumentationScope{1 name, 2 version},
                  2 repeated LogRecord, 3 schema_url
- LogRecord:      1 fixed64 time_unix_nano, 2 varint severity_number,
                  3 string severity_text, 5 AnyValue body,
                  6 repeated KeyValue attributes,
                  7 varint dropped_attributes_count, 8 fixed32 flags,
                  9 bytes trace_id, 10 bytes span_id,
                  11 fixed64 observed_time_unix_nano
- KeyValue:       1 string key, 2 AnyValue value
- AnyValue:       the full 8-way oneof (pdata/pcommon/value.go:31-40):
                  1 string, 2 bool, 3 int64, 4 double,
                  5 ArrayValue{1 repeated AnyValue},
                  6 KeyValueList{1 repeated KeyValue}, 7 bytes.
                  The flat model WRITES strings; FOREIGN typed values
                  decode through Value.AsString coercion (never skipped)
- ExportLogsServiceResponse: 1 ExportLogsPartialSuccess{
                  1 int64 rejected_log_records, 2 string error_message}

proto3 semantics are kept: scalar defaults are OMITTED on the wire and
re-filled on decode, unknown fields are SKIPPED (forward compat), and
the flat model's non-OTLP ``url`` / ``line_no`` columns ride as the same
reserved ``log.url`` / ``log.line_no`` attributes the JSON codec uses.

Scale: marshal is the one groupBy(resource, salt) shuffle the JSON codec
pays (the OTLP envelope is inherently resource-grouped) plus an Arrow
hop over record-count-bounded envelopes; unmarshal is an Arrow hop that
fans each envelope back out to rows. Bytes-per-envelope is bounded by
``max_records_per_envelope`` (send_batch_max_size semantics).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import LOG_RECORDS_SCHEMA
from .otlp_json import LINE_NO_ATTR, SCOPE_NAME, SCOPE_VERSION, URL_ATTR, _chunk_envelopes

# ---------------------------------------------------------------------------
# proto3 wire primitives
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v) if v else b""


def _f_fixed64(field: int, v: int) -> bytes:
    return _tag(field, 1) + struct.pack("<Q", v & (1 << 64) - 1) if v else b""


def _f_fixed32(field: int, v: int) -> bytes:
    return _tag(field, 5) + struct.pack("<I", v & 0xFFFFFFFF) if v else b""


def _f_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload if payload else b""


def _f_string(field: int, s: str | None) -> bytes:
    return _f_bytes(field, s.encode("utf-8")) if s else b""


def _f_msg(field: int, payload: bytes) -> bytes:
    # a present message is emitted even when empty (unlike scalar defaults)
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value); length-delimited values are
    the raw bytes, varints/fixed ints are ints. Unknown wire types raise."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            (v,) = struct.unpack_from("<Q", buf, i)
            i += 8
        elif wire == 5:
            (v,) = struct.unpack_from("<I", buf, i)
            i += 4
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        else:
            raise ValueError(f"unsupported wire type {wire} for field {field}")
        yield field, wire, v


# ---------------------------------------------------------------------------
# OTLP logs message encode/decode (pure Python, per envelope)
# ---------------------------------------------------------------------------


def _aslist(v) -> list:
    """Arrow hands nested arrays to pandas as numpy arrays, whose truth
    value is ambiguous — coerce explicitly (never ``v or []``)."""
    if v is None:
        return []
    return list(v)


def _enc_any_string(s: str | None) -> bytes:
    return _f_string(1, s)


def _enc_any(v) -> bytes:
    """Full 8-way AnyValue union (pdata/pcommon/value.go:31-40; field
    numbers from opentelemetry/proto/common/v1/common.proto): 1 string,
    2 bool, 3 int64, 4 double, 5 ArrayValue, 6 KeyValueList, 7 bytes.
    None encodes the EMPTY AnyValue (no oneof member set). bool checks
    before int (Python bool ⊂ int)."""
    if v is None:
        return b""
    # oneof members are emitted even at their zero value ('' / false /
    # 0 / 0.0 / b'') — proto3 default-omission applies to PLAIN fields,
    # not to a set oneof; omitting them here would decode as the EMPTY
    # AnyValue (indistinguishable only at the flat AsString boundary)
    if isinstance(v, str):
        payload = v.encode("utf-8")
        return _tag(1, 2) + _varint(len(payload)) + payload
    if isinstance(v, bool):
        return _tag(2, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(3, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)  # two's-complement
    if isinstance(v, float):
        return _f_double(4, v, always=True)
    if isinstance(v, (bytes, bytearray)):
        # direct tag+len+payload: _f_bytes omits EMPTY payloads (plain-
        # field semantics), but bytes_value b'' is a set oneof member
        return _tag(7, 2) + _varint(len(v)) + bytes(v)
    if isinstance(v, (list, tuple)):
        return _f_msg(5, b"".join(_f_msg(1, _enc_any(x)) for x in v))
    if isinstance(v, dict):
        return _f_msg(
            6, b"".join(_f_msg(1, _enc_kv(k, x)) for k, x in v.items())
        )
    # recurse through the str branch (set-oneof semantics): _enc_any_string
    # is plain-field and would OMIT a value whose str() is '' — decoding
    # as the empty AnyValue instead of string_value ''
    return _enc_any(str(v))


def _dec_any(buf: bytes):
    """AnyValue bytes → typed Python value (inverse of :func:`_enc_any`);
    the EMPTY AnyValue decodes to None."""
    for field, _w, v in _fields(buf):
        if field == 1:
            return bytes(v).decode("utf-8")
        if field == 2:
            return bool(v)
        if field == 3:
            n = int(v)
            return n - (1 << 64) if n >= (1 << 63) else n
        if field == 4:
            return struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        if field == 5:
            return [
                _dec_any(bytes(x))
                for f2, _w2, x in _fields(bytes(v))
                if f2 == 1
            ]
        if field == 6:
            out = {}
            for f2, _w2, x in _fields(bytes(v)):
                if f2 == 1:
                    k, val = _dec_kv_typed(bytes(x))
                    out[k] = val
            return out
        if field == 7:
            return bytes(v)
    return None


def _any_as_string(v) -> str:
    """The reference's Value.AsString coercion at the flat boundary
    (pdata/pcommon/value.go AsString): identity for strings,
    'true'/'false' for bool, decimal for int, exact ES6 rendering for
    double, base64 for bytes, compact JSON (ES6 doubles, base64 bytes)
    for array/kvlist, '' for the empty value — byte-compatible with the
    JSON codec's coercion (functions/values.py as_string)."""
    import base64

    from .values import es6_float_str

    if v is None:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return es6_float_str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")

    def _json(x) -> str:
        if x is None:
            return "null"
        if isinstance(x, str):
            import json as _j

            return _j.dumps(x, ensure_ascii=False)
        if isinstance(x, bool):
            return "true" if x else "false"
        if isinstance(x, int):
            return str(x)
        if isinstance(x, float):
            return es6_float_str(x)
        if isinstance(x, (bytes, bytearray)):
            import json as _j

            return _j.dumps(base64.b64encode(bytes(x)).decode("ascii"))
        if isinstance(x, (list, tuple)):
            return "[" + ",".join(_json(e) for e in x) + "]"
        if isinstance(x, dict):
            return (
                "{"
                + ",".join(f"{_json(str(k))}:{_json(e)}" for k, e in x.items())
                + "}"
            )
        return _json(str(x))

    return _json(v)


def _enc_kv(key: str, value) -> bytes:
    return _f_bytes(1, key.encode("utf-8")) + _f_msg(2, _enc_any(value))


def _enc_log_record(r: dict) -> bytes:
    attrs = dict(r.get("attributes") or {})
    attrs[URL_ATTR] = r.get("url") or ""
    attrs[LINE_NO_ATTR] = str(r.get("line_no") or 0)
    return (
        _f_fixed64(1, int(r.get("time_unix_nano") or 0))
        + _f_varint(2, int(r.get("severity_number") or 0))
        + _f_string(3, r.get("severity_text"))
        + _f_msg(5, _enc_any_string(r.get("body")))
        + b"".join(_f_msg(6, _enc_kv(k, v)) for k, v in attrs.items())
        + _f_varint(7, int(r.get("dropped_attributes_count") or 0))
        + _f_fixed32(8, int(r.get("flags") or 0))
        + _f_bytes(9, bytes.fromhex(r.get("trace_id") or ""))
        + _f_bytes(10, bytes.fromhex(r.get("span_id") or ""))
        + _f_fixed64(11, int(r.get("observed_ns") or 0))
    )


def _enc_request(host: str | None, lang: str | None, records: list[dict]) -> bytes:
    resource = _f_msg(1, _enc_kv("host", host)) + _f_msg(1, _enc_kv("lang", lang))
    scope = _f_string(1, SCOPE_NAME) + _f_string(2, SCOPE_VERSION)
    scope_logs = _f_msg(1, scope) + b"".join(
        _f_msg(2, _enc_log_record(r)) for r in records
    )
    resource_logs = _f_msg(1, resource) + _f_msg(2, scope_logs)
    return _f_msg(1, resource_logs)


def _dec_any_string(buf: bytes) -> str:
    """AnyValue bytes → the flat model's string: typed decode + AsString.
    A FOREIGN payload with int/double/bool/bytes/array/kvlist attributes
    survives as its AsString rendering instead of being dropped as an
    unknown field (the reference accepts any valid AnyValue —
    pdata/pcommon/value.go:31-40)."""
    return _any_as_string(_dec_any(buf))


def _dec_kv_typed(buf: bytes) -> tuple[str, object]:
    key, val = "", None
    for field, _w, v in _fields(buf):
        if field == 1:
            key = bytes(v).decode("utf-8")
        elif field == 2:
            val = _dec_any(bytes(v))
    return key, val


def _dec_kv(buf: bytes) -> tuple[str, str]:
    key, val = _dec_kv_typed(buf)
    return key, _any_as_string(val)


def _dec_log_record(buf: bytes) -> dict:
    r = {
        "time_unix_nano": 0,
        "severity_number": 0,
        "severity_text": "",
        "body": "",
        "attributes": {},
        "dropped_attributes_count": 0,
        "flags": 0,
        "trace_id": "",
        "span_id": "",
        "observed_ns": 0,
    }
    for field, _w, v in _fields(buf):
        if field == 1:
            r["time_unix_nano"] = int(v)
        elif field == 2:
            r["severity_number"] = int(v)
        elif field == 3:
            r["severity_text"] = bytes(v).decode("utf-8")
        elif field == 5:
            r["body"] = _dec_any_string(bytes(v))
        elif field == 6:
            k, val = _dec_kv(bytes(v))
            r["attributes"][k] = val
        elif field == 7:
            r["dropped_attributes_count"] = int(v)
        elif field == 8:
            r["flags"] = int(v)
        elif field == 9:
            r["trace_id"] = bytes(v).hex()
        elif field == 10:
            r["span_id"] = bytes(v).hex()
        elif field == 11:
            r["observed_ns"] = int(v)
        # unknown fields: skipped (proto3 forward compatibility)
    return r


def _dec_request(buf: bytes) -> list[dict]:
    """ExportLogsServiceRequest bytes → flat record dicts."""
    out: list[dict] = []
    for field, _w, rl in _fields(buf):
        if field != 1:
            continue
        host = lang = None
        scope_logs_bufs = []
        for f2, _w2, v2 in _fields(bytes(rl)):
            if f2 == 1:  # Resource
                for f3, _w3, v3 in _fields(bytes(v2)):
                    if f3 == 1:
                        k, val = _dec_kv(bytes(v3))
                        if k == "host":
                            host = val
                        elif k == "lang":
                            lang = val
            elif f2 == 2:
                scope_logs_bufs.append(bytes(v2))
        for sl in scope_logs_bufs:
            for f3, _w3, v3 in _fields(sl):
                if f3 == 2:  # LogRecord
                    r = _dec_log_record(bytes(v3))
                    attrs = r.pop("attributes")
                    r["url"] = attrs.pop(URL_ATTR, "")
                    try:
                        r["line_no"] = int(attrs.pop(LINE_NO_ATTR, "0"))
                    except ValueError:
                        r["line_no"] = 0
                    r["attributes"] = attrs
                    r["host"] = host
                    r["lang"] = lang
                    out.append(r)
    return out


# ---------------------------------------------------------------------------
# ExportLogsPartialSuccess (logs_service.proto; the response-side contract)
# ---------------------------------------------------------------------------


def encode_export_response(rejected_log_records: int, error_message: str = "") -> bytes:
    """ExportLogsServiceResponse with partial_success
    (plogotlp/generated_exportpartialsuccess.go:24-60 analog)."""
    ps = _f_varint(1, int(rejected_log_records)) + _f_string(2, error_message)
    if not ps:
        return b""  # full success: empty response (proto3 default message)
    return _f_msg(1, ps)


def decode_export_response(buf: bytes) -> dict:
    rejected, msg = 0, ""
    for field, _w, v in _fields(bytes(buf)):
        if field == 1:
            for f2, _w2, v2 in _fields(bytes(v)):
                if f2 == 1:
                    rejected = int(v2)
                elif f2 == 2:
                    msg = bytes(v2).decode("utf-8")
    return {"rejected_log_records": rejected, "error_message": msg}


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------

_PB_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("request_pb", T.BinaryType(), False),
    ]
)


def logs_to_otlp_pb(
    records: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
) -> DataFrame:
    """LOG_RECORDS_SCHEMA frame → OTLP proto wire bytes per envelope
    (MarshalProto analog, pdata/plog/pb.go:26-31). Envelope grouping and
    record-count bounding are identical to the JSON codec (JVM-side);
    only the byte encode is the declared Arrow surface."""
    rec_struct = F.struct(
        F.col("url"),
        F.col("time_unix_nano").cast("long").alias("time_unix_nano"),
        (F.unix_micros(F.col("observed_ts").cast("timestamp")) * F.lit(1000))
        .cast("long")
        .alias("observed_ns"),
        F.col("severity_number").cast("int").alias("severity_number"),
        F.col("severity_text"),
        F.col("body"),
        F.col("attributes"),
        F.col("trace_id"),
        F.col("span_id"),
        F.col("flags").cast("int").alias("flags"),
        F.col("dropped_attributes_count").cast("int").alias(
            "dropped_attributes_count"
        ),
        F.col("line_no").cast("int").alias("line_no"),
    )
    if salt_buckets:
        salt = F.pmod(
            F.xxhash64(F.col("url"), F.col("line_no")), F.lit(int(salt_buckets))
        )
        grouped = (
            records.groupBy(F.col("resource"), salt.alias("__salt"))
            .agg(F.collect_list(rec_struct).alias("__records"))
            .drop("__salt")
        )
    else:
        grouped = records.groupBy("resource").agg(
            F.collect_list(rec_struct).alias("__records")
        )
    grouped = _chunk_envelopes(grouped, "__records", max_records_per_envelope)
    pruned = grouped.select(
        F.col("resource.host").alias("host"),
        F.col("resource.lang").alias("lang"),
        F.col("__records"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "lang": pdf["lang"],
                    "request_pb": [
                        _enc_request(h, lg, list(recs))
                        for h, lg, recs in zip(
                            pdf["host"], pdf["lang"], pdf["__records"]
                        )
                    ],
                }
            )

    return pruned.mapInPandas(encode, schema=_PB_OUT_SCHEMA)


def otlp_pb_to_logs(requests: DataFrame, pb_col: str = "request_pb") -> DataFrame:
    """OTLP proto wire bytes → LOG_RECORDS_SCHEMA frame (UnmarshalProto
    analog, pdata/plog/pb.go:33-36). Missing scalars re-fill proto3
    defaults; unknown fields are skipped."""
    pruned = requests.select(pb_col)

    cols = [
        "url",
        "time_unix_nano",
        "observed_ts",
        "severity_number",
        "severity_text",
        "body",
        "attributes",
        "trace_id",
        "span_id",
        "flags",
        "dropped_attributes_count",
        "resource",
        "line_no",
    ]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[pb_col]:
                for r in _dec_request(bytes(buf)):
                    rows.append(
                        (
                            r["url"],
                            r["time_unix_nano"],
                            pd.Timestamp(r["observed_ns"] // 1000, unit="us"),
                            r["severity_number"],
                            r["severity_text"],
                            r["body"],
                            r["attributes"],
                            r["trace_id"],
                            r["span_id"],
                            r["flags"],
                            r["dropped_attributes_count"],
                            {"host": r["host"], "lang": r["lang"]},
                            r["line_no"],
                        )
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(decode, schema=LOG_RECORDS_SCHEMA)


def roundtrip_pb(
    records: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
) -> DataFrame:
    """marshal → unmarshal on the proto wire; output frame ≡ input frame
    (pdata/plog/pb.go round-trip equality at the driver surface)."""
    return otlp_pb_to_logs(
        logs_to_otlp_pb(
            records,
            salt_buckets=salt_buckets,
            max_records_per_envelope=max_records_per_envelope,
        )
    )


def typed_attrs_roundtrip(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    """FOREIGN-payload typed-attribute exercise over the wire: per id,
    build a log record whose attributes use EVERY AnyValue oneof member
    (int — negative, so the 10-byte varint path runs — double, bool,
    bytes, array, kvlist; pdata/pcommon/value.go:31-40), marshal the
    full request, unmarshal it, and emit the flat-boundary AsString
    coercions. Proves typed attributes SURVIVE decode (not skipped as
    unknown fields) and land exactly where the JSON codec's coercion
    would put them. Declared Arrow surface (same class as the codec).

    Output: ``(id, int_s, dbl_s, bool_s, bytes_s, arr_s, kv_s)`` —
    every value derived deterministically from the id, so an oracle can
    predict the strings without re-implementing the codec."""
    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            *[
                T.StructField(n, T.StringType(), True)
                for n in ("int_s", "dbl_s", "bool_s", "bytes_s", "arr_s", "kv_s")
            ],
        ]
    )
    ids_df = df.select(id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                id_col: [],
                "int_s": [],
                "dbl_s": [],
                "bool_s": [],
                "bytes_s": [],
                "arr_s": [],
                "kv_s": [],
            }
            for raw in pdf[id_col]:
                i = int(raw)
                attrs = {
                    "t_int": (i % 1000) - 500,
                    "t_dbl": (i % 16) - 8 + 0.5,
                    "t_bool": i % 2 == 0,
                    "t_bytes": f"id:{i}".encode("utf-8"),
                    "t_arr": [i % 5, "tag"],
                    "t_kv": {"x": i % 7},
                }
                rec = {"body": "typed", "attributes": attrs, "url": f"u:{i}"}
                back = _dec_request(_enc_request("h", "en", [rec]))
                got = back[0]["attributes"]
                out[id_col].append(raw)
                out["int_s"].append(got["t_int"])
                out["dbl_s"].append(got["t_dbl"])
                out["bool_s"].append(got["t_bool"])
                out["bytes_s"].append(got["t_bytes"])
                out["arr_s"].append(got["t_arr"])
                out["kv_s"].append(got["t_kv"])
            yield pd.DataFrame(out)

    return ids_df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# ptrace wire form (pdata/ptrace/pb.go twin; field numbers from the public
# opentelemetry/proto/trace/v1/trace.proto)
# ---------------------------------------------------------------------------


def _enc_span_event(e: dict) -> bytes:
    return (
        _f_fixed64(1, int(e.get("time_unix_nano") or 0))
        + _f_string(2, e.get("name"))
        + b"".join(
            _f_msg(3, _enc_kv(k, v)) for k, v in (e.get("attributes") or {}).items()
        )
    )


def _enc_span_link(l: dict) -> bytes:
    return (
        _f_bytes(1, bytes.fromhex(l.get("trace_id") or ""))
        + _f_bytes(2, bytes.fromhex(l.get("span_id") or ""))
        + _f_string(3, l.get("trace_state"))
        + b"".join(
            _f_msg(4, _enc_kv(k, v)) for k, v in (l.get("attributes") or {}).items()
        )
    )


def _enc_span(s: dict) -> bytes:
    status = _f_string(2, s.get("status_message")) + _f_varint(
        3, int(s.get("status_code") or 0)
    )
    return (
        _f_bytes(1, bytes.fromhex(s.get("trace_id") or ""))
        + _f_bytes(2, bytes.fromhex(s.get("span_id") or ""))
        + _f_string(3, s.get("trace_state"))
        + _f_bytes(4, bytes.fromhex(s.get("parent_span_id") or ""))
        + _f_string(5, s.get("name"))
        + _f_varint(6, int(s.get("kind") or 0))
        + _f_fixed64(7, int(s.get("start_time_unix_nano") or 0))
        + _f_fixed64(8, int(s.get("end_time_unix_nano") or 0))
        + b"".join(
            _f_msg(9, _enc_kv(k, v)) for k, v in (s.get("attributes") or {}).items()
        )
        + b"".join(_f_msg(11, _enc_span_event(e)) for e in _aslist(s.get("events")))
        + b"".join(_f_msg(13, _enc_span_link(l)) for l in _aslist(s.get("links")))
        + (_f_msg(15, status) if status else b"")
    )


def _enc_trace_request(service: str | None, spans: list[dict]) -> bytes:
    resource = _f_msg(1, _enc_kv("service", service))
    scope = _f_string(1, SCOPE_NAME) + _f_string(2, SCOPE_VERSION)
    scope_spans = _f_msg(1, scope) + b"".join(
        _f_msg(2, _enc_span(s)) for s in spans
    )
    return _f_msg(1, _f_msg(1, resource) + _f_msg(2, scope_spans))


def _dec_span_event(buf: bytes) -> dict:
    e = {"time_unix_nano": 0, "name": "", "attributes": {}}
    for field, _w, v in _fields(buf):
        if field == 1:
            e["time_unix_nano"] = int(v)
        elif field == 2:
            e["name"] = bytes(v).decode("utf-8")
        elif field == 3:
            k, val = _dec_kv(bytes(v))
            e["attributes"][k] = val
    return e


def _dec_span_link(buf: bytes) -> dict:
    l = {"trace_id": "", "span_id": "", "trace_state": "", "attributes": {}}
    for field, _w, v in _fields(buf):
        if field == 1:
            l["trace_id"] = bytes(v).hex()
        elif field == 2:
            l["span_id"] = bytes(v).hex()
        elif field == 3:
            l["trace_state"] = bytes(v).decode("utf-8")
        elif field == 4:
            k, val = _dec_kv(bytes(v))
            l["attributes"][k] = val
    return l


def _dec_span(buf: bytes) -> dict:
    s = {
        "trace_id": "", "span_id": "", "trace_state": "",
        "parent_span_id": "", "name": "", "kind": 0,
        "start_time_unix_nano": 0, "end_time_unix_nano": 0,
        "attributes": {}, "status_code": 0, "status_message": "",
        "events": [], "links": [],
    }
    for field, _w, v in _fields(buf):
        if field == 1:
            s["trace_id"] = bytes(v).hex()
        elif field == 2:
            s["span_id"] = bytes(v).hex()
        elif field == 3:
            s["trace_state"] = bytes(v).decode("utf-8")
        elif field == 4:
            s["parent_span_id"] = bytes(v).hex()
        elif field == 5:
            s["name"] = bytes(v).decode("utf-8")
        elif field == 6:
            s["kind"] = int(v)
        elif field == 7:
            s["start_time_unix_nano"] = int(v)
        elif field == 8:
            s["end_time_unix_nano"] = int(v)
        elif field == 9:
            k, val = _dec_kv(bytes(v))
            s["attributes"][k] = val
        elif field == 11:
            s["events"].append(_dec_span_event(bytes(v)))
        elif field == 13:
            s["links"].append(_dec_span_link(bytes(v)))
        elif field == 15:
            for f2, _w2, v2 in _fields(bytes(v)):
                if f2 == 2:
                    s["status_message"] = bytes(v2).decode("utf-8")
                elif f2 == 3:
                    s["status_code"] = int(v2)
    return s


def _dec_trace_request(buf: bytes) -> list[dict]:
    out: list[dict] = []
    for field, _w, rs in _fields(buf):
        if field != 1:
            continue
        service = None
        for f2, _w2, v2 in _fields(bytes(rs)):
            if f2 == 1:  # Resource
                for f3, _w3, v3 in _fields(bytes(v2)):
                    if f3 == 1:
                        k, val = _dec_kv(bytes(v3))
                        if k == "service":
                            service = val
            elif f2 == 2:  # ScopeSpans
                for f3, _w3, v3 in _fields(bytes(v2)):
                    if f3 == 2:
                        s = _dec_span(bytes(v3))
                        s["service"] = service
                        out.append(s)
    return out


def spans_to_otlp_pb(
    spans: DataFrame,
    salt_buckets: int | None = None,
    max_records_per_envelope: int | None = None,
) -> DataFrame:
    """SPANS_SCHEMA frame → OTLP proto wire bytes per envelope (ptrace
    MarshalProto twin). Same grouping/bounding discipline as the logs
    codec."""
    span_struct = F.struct(
        "trace_id", "span_id", "parent_span_id", "trace_state", "name",
        F.col("kind").cast("int").alias("kind"),
        "start_time_unix_nano", "end_time_unix_nano", "attributes",
        F.col("status_code").cast("int").alias("status_code"),
        "status_message", "events", "links",
    )
    if salt_buckets:
        salt = F.pmod(
            F.xxhash64(F.col("trace_id"), F.col("span_id")),
            F.lit(int(salt_buckets)),
        )
        grouped = (
            spans.groupBy(F.col("resource"), salt.alias("__salt"))
            .agg(F.collect_list(span_struct).alias("__spans"))
            .drop("__salt")
        )
    else:
        grouped = spans.groupBy("resource").agg(
            F.collect_list(span_struct).alias("__spans")
        )
    grouped = _chunk_envelopes(grouped, "__spans", max_records_per_envelope)
    pruned = grouped.select(
        F.col("resource.service").alias("service"), F.col("__spans")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "service": pdf["service"],
                    "request_pb": [
                        _enc_trace_request(svc, list(sp))
                        for svc, sp in zip(pdf["service"], pdf["__spans"])
                    ],
                }
            )

    return pruned.mapInPandas(
        encode,
        schema=T.StructType(
            [
                T.StructField("service", T.StringType(), True),
                T.StructField("request_pb", T.BinaryType(), False),
            ]
        ),
    )


def otlp_pb_to_spans(requests: DataFrame, pb_col: str = "request_pb") -> DataFrame:
    """OTLP proto wire bytes → SPANS_SCHEMA frame (ptrace UnmarshalProto
    twin)."""
    from ..operators.traces import SPANS_SCHEMA

    pruned = requests.select(pb_col)
    cols = [f.name for f in SPANS_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[pb_col]:
                for s in _dec_trace_request(bytes(buf)):
                    rows.append(
                        tuple(
                            {"resource": {"service": s["service"]}}.get(c)
                            if c == "resource"
                            else s[c]
                            for c in cols
                        )
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(decode, schema=SPANS_SCHEMA)


# ---------------------------------------------------------------------------
# pmetric wire form (pdata/pmetric pb twin; field numbers verified against
# the reference's generated marshal code,
# pdata/internal/data/protogen/metrics/v1/metrics.pb.go:2217-3190)
# ---------------------------------------------------------------------------


def _f_double(field: int, v: float | None, always: bool = False) -> bytes:
    """Scalar double (wire 1). ``always`` for oneof members whose
    presence is meaningful even at 0.0 (NumberDataPoint.as_double)."""
    if v is None or (not always and v == 0.0):
        return b""
    return _tag(field, 1) + struct.pack("<d", float(v))


def _f_packed_fixed64(field: int, vals: list[int]) -> bytes:
    if not vals:
        return b""
    payload = b"".join(struct.pack("<Q", int(v)) for v in vals)
    return _tag(field, 2) + _varint(len(payload)) + payload


def _f_packed_double(field: int, vals: list[float]) -> bytes:
    if not vals:
        return b""
    payload = b"".join(struct.pack("<d", float(v)) for v in vals)
    return _tag(field, 2) + _varint(len(payload)) + payload


def _enc_exemplar(e: dict) -> bytes:
    # Exemplar (metrics.proto, same numbers the reference's generated
    # marshal uses — pdata/internal/data/protogen/metrics/v1/
    # metrics.pb.go Exemplar): time_unix_nano=2 fixed64, as_double=3
    # (value oneof member — always emitted), span_id=4 bytes,
    # trace_id=5 bytes, filtered_attributes=7 repeated KeyValue. The
    # flat frame carries ids as hex strings (the pdata text form);
    # the wire carries raw bytes, so hex↔bytes at this boundary only.
    return (
        _f_fixed64(2, int(e.get("time_unix_nano") or 0))
        + _f_double(3, float(e.get("value_double") or 0.0), always=True)
        + _f_bytes(4, bytes.fromhex(e.get("span_id") or ""))
        + _f_bytes(5, bytes.fromhex(e.get("trace_id") or ""))
        + b"".join(
            _f_msg(7, _enc_kv(k, v))
            for k, v in (e.get("filtered_attributes") or {}).items()
        )
    )


def _dec_exemplar(buf: bytes) -> dict:
    e = {
        "time_unix_nano": 0,
        "value_double": 0.0,
        "trace_id": None,
        "span_id": None,
        "filtered_attributes": {},
    }
    for field, _w, v in _fields(buf):
        if field == 2:
            e["time_unix_nano"] = int(v)
        elif field == 3:
            e["value_double"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        elif field == 4:
            e["span_id"] = bytes(v).hex()
        elif field == 5:
            e["trace_id"] = bytes(v).hex()
        elif field == 6:
            # as_int (sfixed64): a FOREIGN payload's value-union member —
            # the flat frame's single numeric column takes the AsDouble
            # view of it (same normalization the JSON boundary applies)
            e["value_double"] = float(
                struct.unpack("<q", struct.pack("<Q", int(v)))[0]
            )
        elif field == 7:
            k, val = _dec_kv(bytes(v))
            e["filtered_attributes"][k] = val
    return e


def _enc_number_dp(p: dict) -> bytes:
    # NumberDataPoint: start=2 fixed64, time=3 fixed64, as_double=4
    # (oneof member — always emitted), exemplars=5, attributes=7
    return (
        _f_fixed64(2, int(p.get("start_time_unix_nano") or 0))
        + _f_fixed64(3, int(p.get("time_unix_nano") or 0))
        + _f_double(4, float(p.get("value_double") or 0.0), always=True)
        + b"".join(_f_msg(5, _enc_exemplar(e)) for e in _aslist(p.get("exemplars")))
        + b"".join(
            _f_msg(7, _enc_kv(k, v)) for k, v in (p.get("attributes") or {}).items()
        )
    )


def _enc_histogram_dp(p: dict, attr_name: str) -> bytes:
    # HistogramDataPoint: start=2, time=3, count=4 fixed64, sum=5 double
    # (optional), bucket_counts=6 packed fixed64, explicit_bounds=7
    # packed double, attributes=9, min=11, max=12 (optional doubles)
    return (
        _f_fixed64(2, 0)
        + _f_fixed64(3, 0)
        + _f_fixed64(4, int(p.get("hist_count") or 0))
        + (
            _f_double(5, float(p["hist_sum"]), always=True)
            if p.get("hist_sum") is not None
            else b""
        )
        + _f_packed_fixed64(6, _aslist(p.get("hist_bucket_counts")))
        + _f_packed_double(7, _aslist(p.get("hist_explicit_bounds")))
        + _f_msg(9, _enc_kv(attr_name, p.get("attr_key")))
        + (
            _f_double(11, float(p["hist_min"]), always=True)
            if p.get("hist_min") is not None
            else b""
        )
        + (
            _f_double(12, float(p["hist_max"]), always=True)
            if p.get("hist_max") is not None
            else b""
        )
    )


def _enc_metrics_request(metric_payload: bytes) -> bytes:
    scope = _f_string(1, SCOPE_NAME) + _f_string(2, SCOPE_VERSION)
    scope_metrics = _f_msg(1, scope) + _f_msg(2, metric_payload)
    # empty Resource message (the point frames carry no resource)
    return _f_msg(1, _f_msg(1, b"") + _f_msg(2, scope_metrics))


def _enc_sum_metric(name: str, temporality: int, monotonic: bool, dps: list[dict]) -> bytes:
    sum_body = (
        b"".join(_f_msg(1, _enc_number_dp(p)) for p in dps)
        + _f_varint(2, int(temporality))
        + (_tag(3, 0) + b"\x01" if monotonic else b"")
    )
    return _f_string(1, name) + _f_msg(7, sum_body)


def _enc_gauge_metric(name: str, dps: list[dict]) -> bytes:
    gauge_body = b"".join(_f_msg(1, _enc_number_dp(p)) for p in dps)
    return _f_string(1, name) + _f_msg(5, gauge_body)


def _enc_histogram_metric(
    name: str, temporality: int, dps: list[dict], attr_name: str
) -> bytes:
    hist_body = b"".join(
        _f_msg(1, _enc_histogram_dp(p, attr_name)) for p in dps
    ) + _f_varint(2, int(temporality))
    return _f_string(1, name) + _f_msg(9, hist_body)


def _dec_number_dp(buf: bytes) -> dict:
    p = {
        "start_time_unix_nano": 0,
        "time_unix_nano": 0,
        "value_double": 0.0,
        "value_int": None,
        "attributes": {},
        "exemplars": None,
    }
    for field, _w, v in _fields(buf):
        if field == 2:
            p["start_time_unix_nano"] = int(v)
        elif field == 3:
            p["time_unix_nano"] = int(v)
        elif field == 4:
            p["value_double"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        elif field == 5:
            # create-once + append: rebuilding the list per occurrence is
            # O(n^2) over an unbounded repeated field on a foreign payload
            if p["exemplars"] is None:
                p["exemplars"] = []
            p["exemplars"].append(_dec_exemplar(bytes(v)))
        elif field == 6:
            p["value_int"] = struct.unpack("<q", struct.pack("<Q", int(v)))[0]
        elif field == 7:
            k, val = _dec_kv(bytes(v))
            p["attributes"][k] = val
    return p


def _dec_histogram_dp(buf: bytes) -> dict:
    p = {
        "hist_count": 0, "hist_sum": None, "hist_min": None, "hist_max": None,
        "hist_bucket_counts": [], "hist_explicit_bounds": [], "attributes": {},
    }
    for field, _w, v in _fields(buf):
        if field == 4:
            p["hist_count"] = int(v)
        elif field == 5:
            p["hist_sum"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        elif field == 6:
            raw = bytes(v)
            p["hist_bucket_counts"] = [
                struct.unpack_from("<Q", raw, i)[0] for i in range(0, len(raw), 8)
            ]
        elif field == 7:
            raw = bytes(v)
            p["hist_explicit_bounds"] = [
                struct.unpack_from("<d", raw, i)[0] for i in range(0, len(raw), 8)
            ]
        elif field == 9:
            k, val = _dec_kv(bytes(v))
            p["attributes"][k] = val
        elif field == 11:
            p["hist_min"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        elif field == 12:
            p["hist_max"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
    return p


def _dec_metrics_request(buf: bytes) -> list[dict]:
    """ExportMetricsServiceRequest bytes → per-point dicts with the
    metric header fields attached (metric_type from the data oneof)."""
    out: list[dict] = []
    for field, _w, rm in _fields(buf):
        if field != 1:
            continue
        for f2, _w2, v2 in _fields(bytes(rm)):
            if f2 != 2:  # ScopeMetrics
                continue
            for f3, _w3, v3 in _fields(bytes(v2)):
                if f3 != 2:  # Metric
                    continue
                name, header = "", {}
                points: list[tuple[int, bytes]] = []
                for f4, _w4, v4 in _fields(bytes(v3)):
                    if f4 == 1:
                        name = bytes(v4).decode("utf-8")
                    elif f4 in (5, 7):  # gauge / sum
                        mtype = 1 if f4 == 5 else 2
                        header = {"metric_type": mtype,
                                  "aggregation_temporality": 0,
                                  "is_monotonic": False}
                        for f5, _w5, v5 in _fields(bytes(v4)):
                            if f5 == 1:
                                points.append((mtype, bytes(v5)))
                            elif f5 == 2:
                                header["aggregation_temporality"] = int(v5)
                            elif f5 == 3:
                                header["is_monotonic"] = bool(v5)
                    elif f4 in (9, 10):  # histogram / exponential hist
                        mtype = 3 if f4 == 9 else 4
                        header = {"metric_type": mtype, "aggregation_temporality": 0}
                        for f5, _w5, v5 in _fields(bytes(v4)):
                            if f5 == 1:
                                points.append((mtype, bytes(v5)))
                            elif f5 == 2:
                                header["aggregation_temporality"] = int(v5)
                    elif f4 == 11:  # summary
                        header = {"metric_type": 5}
                        for f5, _w5, v5 in _fields(bytes(v4)):
                            if f5 == 1:
                                points.append((5, bytes(v5)))
                for mtype, pbuf in points:
                    if mtype == 3:
                        p = _dec_histogram_dp(pbuf)
                    elif mtype == 4:
                        p = _dec_exphist_dp(pbuf)
                    elif mtype == 5:
                        p = _dec_summary_dp(pbuf)
                    else:
                        p = _dec_number_dp(pbuf)
                    p.update(header)
                    p["metric_name"] = name
                    out.append(p)
    return out


_EXEMPLAR_PB_SCHEMA = T.StructType(
    [
        T.StructField("time_unix_nano", T.LongType(), True),
        T.StructField("value_double", T.DoubleType(), True),
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("span_id", T.StringType(), True),
        T.StructField(
            "filtered_attributes", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

_SUM_PB_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), True),
        T.StructField("metric_type", T.IntegerType(), True),
        T.StructField("aggregation_temporality", T.IntegerType(), True),
        T.StructField("is_monotonic", T.BooleanType(), True),
        T.StructField("start_time_unix_nano", T.LongType(), True),
        T.StructField("time_unix_nano", T.LongType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("value_double", T.DoubleType(), True),
        # pdata Exemplar rows riding the point (same flat struct the JSON
        # codec round-trips; NULL when the wire carried none)
        T.StructField("exemplars", T.ArrayType(_EXEMPLAR_PB_SCHEMA), True),
    ]
)


def sum_points_to_otlp_pb(points: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Delta-Sum points frame → OTLP proto wire bytes (one Metric per
    envelope; salt bounds per-envelope point counts)."""
    dp_cols = ["start_time_unix_nano", "time_unix_nano", "attributes", "value_double"]
    if "exemplars" in points.columns:
        dp_cols.append("exemplars")
    dp = F.struct(*dp_cols)
    keys = [
        F.col("metric_name"),
        F.col("aggregation_temporality"),
        F.col("is_monotonic"),
    ]
    if salt_buckets:
        keys.append(
            F.pmod(
                F.xxhash64(F.to_json(F.col("attributes"))), F.lit(int(salt_buckets))
            ).alias("__salt")
        )
    grouped = points.groupBy(*keys).agg(F.collect_list(dp).alias("__dps"))
    pruned = grouped.select(
        "metric_name", "aggregation_temporality", "is_monotonic", "__dps"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "request_pb": [
                        _enc_metrics_request(
                            _enc_sum_metric(nm, int(tmp), bool(mono), list(dps))
                        )
                        for nm, tmp, mono, dps in zip(
                            pdf["metric_name"],
                            pdf["aggregation_temporality"],
                            pdf["is_monotonic"],
                            pdf["__dps"],
                        )
                    ]
                }
            )

    return pruned.mapInPandas(
        encode,
        schema=T.StructType([T.StructField("request_pb", T.BinaryType(), False)]),
    )


def otlp_pb_to_sum_points(requests: DataFrame, pb_col: str = "request_pb") -> DataFrame:
    pruned = requests.select(pb_col)
    cols = [f.name for f in _SUM_PB_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[pb_col]:
                for p in _dec_metrics_request(bytes(buf)):
                    if p["metric_type"] == 3:
                        continue
                    rows.append(tuple(p.get(c) for c in cols))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(decode, schema=_SUM_PB_SCHEMA)


_HIST_PB_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), True),
        T.StructField("metric_type", T.IntegerType(), True),
        T.StructField("aggregation_temporality", T.IntegerType(), True),
        T.StructField("attr_key", T.StringType(), True),
        T.StructField("hist_count", T.LongType(), True),
        T.StructField("hist_sum", T.DoubleType(), True),
        T.StructField("hist_min", T.DoubleType(), True),
        T.StructField("hist_max", T.DoubleType(), True),
        T.StructField("hist_bucket_counts", T.ArrayType(T.LongType()), True),
        T.StructField("hist_explicit_bounds", T.ArrayType(T.DoubleType()), True),
    ]
)


def histogram_points_to_otlp_pb(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Explicit-bounds Histogram points frame → OTLP proto wire bytes."""
    dp = F.struct(
        "attr_key", "hist_count", "hist_sum", "hist_min", "hist_max",
        "hist_bucket_counts", "hist_explicit_bounds",
    )
    grouped = points.groupBy(
        "metric_name", "aggregation_temporality"
    ).agg(F.collect_list(dp).alias("__dps"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "request_pb": [
                        _enc_metrics_request(
                            _enc_histogram_metric(nm, int(tmp), list(dps), attr_name)
                        )
                        for nm, tmp, dps in zip(
                            pdf["metric_name"],
                            pdf["aggregation_temporality"],
                            pdf["__dps"],
                        )
                    ]
                }
            )

    return grouped.select("metric_name", "aggregation_temporality", "__dps").mapInPandas(
        encode,
        schema=T.StructType([T.StructField("request_pb", T.BinaryType(), False)]),
    )


def otlp_pb_to_histogram_points(
    requests: DataFrame, pb_col: str = "request_pb", attr_name: str = "event_type"
) -> DataFrame:
    pruned = requests.select(pb_col)
    cols = [f.name for f in _HIST_PB_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[pb_col]:
                for p in _dec_metrics_request(bytes(buf)):
                    if p["metric_type"] != 3:
                        continue
                    p["attr_key"] = (p.get("attributes") or {}).get(attr_name)
                    rows.append(tuple(p.get(c) for c in cols))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(decode, schema=_HIST_PB_SCHEMA)


def _zigzag32(n: int) -> int:
    return ((int(n) << 1) ^ (int(n) >> 31)) & 0xFFFFFFFF


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _f_packed_varint(field: int, vals: list[int]) -> bytes:
    if not vals:
        return b""
    payload = b"".join(_varint(int(v)) for v in vals)
    return _tag(field, 2) + _varint(len(payload)) + payload


def _enc_exphist_dp(p: dict, attr_name: str) -> bytes:
    # ExponentialHistogramDataPoint (metrics.pb.go:2847-2958): attrs=1,
    # start=2, time=3, count=4 fixed64, sum=5 double, scale=6 sint32
    # zigzag, zero_count=7 fixed64, positive=8 Buckets{offset=1 sint32
    # zigzag, bucket_counts=2 packed varint}
    pos = _aslist(p.get("positive") or [])  # [(index, n), ...] sorted
    buckets = b""
    if pos:
        offset = int(pos[0][0])
        span = int(pos[-1][0]) - offset + 1
        dense = [0] * span
        for idx, n in pos:
            dense[int(idx) - offset] = int(n)
        buckets = _f_msg(
            8,
            (_tag(1, 0) + _varint(_zigzag32(offset)) if offset else b"")
            + _f_packed_varint(2, dense),
        )
    scale = int(p.get("scale") or 0)
    return (
        _f_msg(1, _enc_kv(attr_name, p.get("attr_key")))
        + _f_fixed64(4, int(p.get("dp_count") or 0))
        + (
            _f_double(5, float(p["dp_sum"]), always=True)
            if p.get("dp_sum") is not None
            else b""
        )
        + (_tag(6, 0) + _varint(_zigzag32(scale)) if scale else b"")
        + _f_fixed64(7, int(p.get("zero_count") or 0))
        + buckets
    )


def _enc_summary_dp(p: dict, attr_name: str) -> bytes:
    # SummaryDataPoint (metrics.pb.go:3064-3162): start=2, time=3,
    # count=4 fixed64, sum=5 double, quantile_values=6{quantile=1 double,
    # value=2 double}, attributes=7
    qvs = b"".join(
        _f_msg(
            6,
            _f_double(1, float(q), always=True)
            + _f_double(2, float(v), always=True),
        )
        for q, v in _aslist(p.get("quantiles"))
    )
    return (
        _f_fixed64(4, int(p.get("summary_count") or 0))
        + (
            _f_double(5, float(p["summary_sum"]), always=True)
            if p.get("summary_sum") is not None
            else b""
        )
        + qvs
        + _f_msg(7, _enc_kv(attr_name, p.get("attr_key")))
    )


def _enc_exphist_metric(name: str, temporality: int, dps: list[dict], attr_name: str) -> bytes:
    body = b"".join(
        _f_msg(1, _enc_exphist_dp(p, attr_name)) for p in dps
    ) + _f_varint(2, int(temporality))
    return _f_string(1, name) + _f_msg(10, body)


def _enc_summary_metric(name: str, dps: list[dict], attr_name: str) -> bytes:
    body = b"".join(_f_msg(1, _enc_summary_dp(p, attr_name)) for p in dps)
    return _f_string(1, name) + _f_msg(11, body)


def _dec_exphist_dp(buf: bytes) -> dict:
    p = {
        "dp_count": 0, "dp_sum": None, "scale": 0, "zero_count": 0,
        "positive": [], "attributes": {},
    }
    for field, _w, v in _fields(buf):
        if field == 1:
            k, val = _dec_kv(bytes(v))
            p["attributes"][k] = val
        elif field == 4:
            p["dp_count"] = int(v)
        elif field == 5:
            p["dp_sum"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        elif field == 6:
            p["scale"] = _unzigzag(int(v))
        elif field == 7:
            p["zero_count"] = int(v)
        elif field == 8:
            offset, counts = 0, []
            for f2, _w2, v2 in _fields(bytes(v)):
                if f2 == 1:
                    offset = _unzigzag(int(v2))
                elif f2 == 2:
                    raw, i = bytes(v2), 0
                    while i < len(raw):
                        n, i = _read_varint(raw, i)
                        counts.append(n)
            p["positive"] = [
                (offset + i, n) for i, n in enumerate(counts) if n > 0
            ]
    return p


def _dec_summary_dp(buf: bytes) -> dict:
    p = {"summary_count": 0, "summary_sum": None, "quantiles": [], "attributes": {}}
    for field, _w, v in _fields(buf):
        if field == 4:
            p["summary_count"] = int(v)
        elif field == 5:
            p["summary_sum"] = struct.unpack("<d", struct.pack("<Q", int(v)))[0]
        elif field == 6:
            q = val = 0.0
            for f2, _w2, v2 in _fields(bytes(v)):
                if f2 == 1:
                    q = struct.unpack("<d", struct.pack("<Q", int(v2)))[0]
                elif f2 == 2:
                    val = struct.unpack("<d", struct.pack("<Q", int(v2)))[0]
            p["quantiles"].append((q, val))
        elif field == 7:
            k, val2 = _dec_kv(bytes(v))
            p["attributes"][k] = val2
    return p


def exp_histogram_points_to_otlp_pb(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Long-form exponential-histogram bucket rows → OTLP proto wire
    bytes (one dp per key; sparse positive buckets densified with the
    OTLP offset+contiguous-counts form; NULL bucket_index = zero bucket).
    Per-bucket sums don't exist on the wire — totals ride the point."""
    per_key = points.groupBy(
        "metric_name", "aggregation_temporality", "scale", "attr_key"
    ).agg(
        F.sum("n").cast("long").alias("dp_count"),
        F.round(F.sum("bucket_sum"), 4).alias("dp_sum"),
        F.sum(F.when(F.col("bucket_index").isNull(), F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("zero_count"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("bucket_index").isNotNull(),
                    F.struct(F.col("bucket_index"), F.col("n")),
                )
            )
        ).alias("positive"),
    )
    dp = F.struct("attr_key", "dp_count", "dp_sum", "scale", "zero_count", "positive")
    grouped = per_key.groupBy("metric_name", "aggregation_temporality").agg(
        F.collect_list(dp).alias("__dps")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "request_pb": [
                        _enc_metrics_request(
                            _enc_exphist_metric(
                                nm,
                                int(tmp),
                                [
                                    dict(
                                        d,
                                        positive=[
                                            (b["bucket_index"], b["n"])
                                            for b in _aslist(d["positive"])
                                        ],
                                    )
                                    for d in dps
                                ],
                                attr_name,
                            )
                        )
                        for nm, tmp, dps in zip(
                            pdf["metric_name"],
                            pdf["aggregation_temporality"],
                            pdf["__dps"],
                        )
                    ]
                }
            )

    return grouped.mapInPandas(
        encode,
        schema=T.StructType([T.StructField("request_pb", T.BinaryType(), False)]),
    )


_EXPHIST_PB_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), True),
        T.StructField("scale", T.IntegerType(), True),
        T.StructField("attr_key", T.StringType(), True),
        T.StructField("bucket_index", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("dp_count", T.LongType(), True),
        T.StructField("dp_sum", T.DoubleType(), True),
    ]
)


def otlp_pb_to_exp_histogram_points(
    requests: DataFrame, pb_col: str = "request_pb", attr_name: str = "event_type"
) -> DataFrame:
    """Wire bytes → long-form bucket rows + point totals (the JSON
    codec's exphist round-trip shape: per-bucket sums are not a wire
    concept, so totals replace them)."""
    pruned = requests.select(pb_col)
    cols = [f.name for f in _EXPHIST_PB_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[pb_col]:
                for p in _dec_metrics_request(bytes(buf)):
                    if p.get("metric_type") != 4:
                        continue
                    base = {
                        "metric_name": p["metric_name"],
                        "scale": p["scale"],
                        "attr_key": (p.get("attributes") or {}).get(attr_name),
                        "dp_count": p["dp_count"],
                        "dp_sum": p["dp_sum"],
                    }
                    if p["zero_count"]:
                        rows.append(
                            tuple(dict(base, bucket_index=None, n=p["zero_count"]).get(c) for c in cols)
                        )
                    for idx, n in p["positive"]:
                        rows.append(
                            tuple(dict(base, bucket_index=idx, n=n).get(c) for c in cols)
                        )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(decode, schema=_EXPHIST_PB_SCHEMA)


def summary_points_to_otlp_pb(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """Long-form Summary quantile rows → OTLP proto wire bytes."""
    per_key = points.groupBy(
        "metric_name", "attr_key", "summary_count", "summary_sum"
    ).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("quantile"), F.col("quantile_value")))
        ).alias("quantiles")
    )
    dp = F.struct("attr_key", "summary_count", "summary_sum", "quantiles")
    grouped = per_key.groupBy("metric_name").agg(F.collect_list(dp).alias("__dps"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "request_pb": [
                        _enc_metrics_request(
                            _enc_summary_metric(
                                nm,
                                [
                                    dict(
                                        d,
                                        quantiles=[
                                            (q["quantile"], q["quantile_value"])
                                            for q in _aslist(d["quantiles"])
                                        ],
                                    )
                                    for d in dps
                                ],
                                attr_name,
                            )
                        )
                        for nm, dps in zip(pdf["metric_name"], pdf["__dps"])
                    ]
                }
            )

    return grouped.mapInPandas(
        encode,
        schema=T.StructType([T.StructField("request_pb", T.BinaryType(), False)]),
    )


_SUMMARY_PB_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), True),
        T.StructField("attr_key", T.StringType(), True),
        T.StructField("summary_count", T.LongType(), True),
        T.StructField("summary_sum", T.DoubleType(), True),
        T.StructField("quantile", T.DoubleType(), True),
        T.StructField("quantile_value", T.DoubleType(), True),
    ]
)


def otlp_pb_to_summary_points(
    requests: DataFrame, pb_col: str = "request_pb", attr_name: str = "event_type"
) -> DataFrame:
    pruned = requests.select(pb_col)
    cols = [f.name for f in _SUMMARY_PB_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[pb_col]:
                for p in _dec_metrics_request(bytes(buf)):
                    if p.get("metric_type") != 5:
                        continue
                    base = {
                        "metric_name": p["metric_name"],
                        "attr_key": (p.get("attributes") or {}).get(attr_name),
                        "summary_count": p["summary_count"],
                        "summary_sum": p["summary_sum"],
                    }
                    for q, v in p["quantiles"]:
                        rows.append(
                            tuple(dict(base, quantile=q, quantile_value=v).get(c) for c in cols)
                        )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(decode, schema=_SUMMARY_PB_SCHEMA)
