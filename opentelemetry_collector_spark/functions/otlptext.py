"""Human-readable text rendering of log records — the logging-exporter
analog (E3).

The reference's loggingexporter renders every signal into a canonical
golden text form (exporter/loggingexporter/internal/otlptext/
databuffer.go:32-272, logs.go:29) used both for debugging and for
golden-output tests (testdata/logs/*.out). This module reproduces that
pattern: a deterministic per-record block, rendered entirely with built-in
column expressions (no driver loop, no UDF), so a debug sink can write the
text form at any scale and goldens stay byte-stable.

Field order mirrors databuffer.go's log renderer: ObservedTimestamp,
Timestamp, SeverityText, SeverityNumber, Body, Attributes (sorted by key
— pcommon.Map is ordered, our map normalizes to key order), TraceID,
SpanID, Flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .values import as_string, ns_to_micros

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'"
_EPOCH_ZERO = "1970-01-01 00:00:00 +0000 UTC"


def _ts_str(col: Column) -> Column:
    """ns timestamp → rendered string; 0/NULL → the epoch-zero form the
    reference prints for unset timestamps (pcommon.Timestamp.String())."""
    return F.when(
        col.isNotNull() & (col > 0),
        F.date_format(F.timestamp_micros(ns_to_micros(col)), _TS_FMT),
    ).otherwise(F.lit(_EPOCH_ZERO))


def _f6(col: Column) -> Column:
    """Go ``%f`` — 6-decimal fixed (databuffer.go logEntry float fields)."""
    return F.format_string("%f", col.cast("double"))


def _s(col: Column) -> Column:
    """NULL-safe string field: proto3 zero values render as empty string
    (the unmarshal deliberately null-fills absent fields — without this
    coalesce, one NULL field nulls the entire concat'd block and the
    record silently vanishes from the debug sink)."""
    return F.coalesce(col.cast("string"), F.lit(""))


# pcommon.Value.Type().String() names (pdata/pcommon/value.go:177-195)
_TYPE_NAMES = {
    T.StringType: "Str",
    T.BooleanType: "Bool",
    T.ByteType: "Int",
    T.ShortType: "Int",
    T.IntegerType: "Int",
    T.LongType: "Int",
    T.FloatType: "Double",
    T.DoubleType: "Double",
    T.BinaryType: "Bytes",
    T.MapType: "Map",
    T.StructType: "Map",
    T.ArrayType: "Slice",
}


def typed_value(col: Column, dtype: T.DataType) -> Column:
    """``Type(AsString)`` rendering of a typed value — the reference's
    valueToString (databuffer.go:272-274): Str(x), Int(42), Double via
    ES6 shortest round-trip, Map/Slice as JSON (embedded_maps.out
    pattern), Bytes as base64."""
    name = _TYPE_NAMES.get(type(dtype), "Str")
    return F.concat(F.lit(f"{name}("), as_string(col, dtype), F.lit(")"))


def typed_attr_lines(
    pairs: list[tuple[str, Column, T.DataType]], prefix: str = "     -> "
) -> Column:
    """``Attributes:`` block over TYPED values, one line per (key, value,
    type), sorted by key — non-Str values render via ``typed_value``
    (Map→JSON, Double→ES6, the databuffer.go logAttributes shape)."""
    lines = [
        F.concat(F.lit(prefix), F.lit(k), F.lit(": "), typed_value(c, t))
        for k, c, t in sorted(pairs, key=lambda p: p[0])
    ]
    if not lines:
        return F.lit("")
    return F.concat(
        F.lit("Attributes:\n"), F.array_join(F.array(*lines), "\n"), F.lit("\n")
    )


def _attr_lines(attributes: Column) -> Column:
    """Render `     -> key: Str(value)` lines, sorted by key."""
    entries = F.sort_array(F.map_entries(attributes))
    lines = F.transform(
        entries,
        lambda e: F.concat(
            F.lit("     -> "),
            e.getField("key"),
            F.lit(": Str("),
            e.getField("value"),
            F.lit(")"),
        ),
    )
    return F.when(F.size(entries) > 0, F.concat(F.lit("Attributes:\n"), F.array_join(lines, "\n"), F.lit("\n"))).otherwise(F.lit(""))


def render_log_record(prefix_index: Column | None = None) -> Column:
    """Column expression producing the canonical text block for one record."""
    header = (
        F.concat(F.lit("LogRecord #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("LogRecord\n")
    )
    # epoch-0 is pcommon.Timestamp's zero value and renders the same
    # "+0000 UTC" unset form as _ts_str(0) — NULL-only handling here
    # would print the fractional form for an unset observed time while
    # the sibling Timestamp field prints the zero form
    obs_us = F.unix_micros(F.col("observed_ts").cast("timestamp"))
    observed = F.when(
        F.col("observed_ts").isNotNull() & (obs_us != 0),
        F.date_format(F.col("observed_ts"), _TS_FMT),
    ).otherwise(F.lit(_EPOCH_ZERO))
    return F.concat(
        header,
        F.lit("ObservedTimestamp: "), observed, F.lit("\n"),
        F.lit("Timestamp: "), _ts_str(F.col("time_unix_nano")), F.lit("\n"),
        F.lit("SeverityText: "), _s(F.col("severity_text")), F.lit("\n"),
        # proto3 zero values for absent numeric/string fields (the
        # reference renders the zero enum/flags, not a hole in the block)
        F.lit("SeverityNumber: "), _s(F.coalesce(F.col("severity_number"), F.lit(0))), F.lit("\n"),
        F.lit("Body: Str("), _s(F.col("body")), F.lit(")\n"),
        _attr_lines(F.col("attributes")),
        F.lit("Trace ID: "), _s(F.col("trace_id")), F.lit("\n"),
        F.lit("Span ID: "), _s(F.col("span_id")), F.lit("\n"),
        F.lit("Flags: "), _s(F.coalesce(F.col("flags"), F.lit(0))), F.lit("\n"),
    )


# plog.SeverityNumber.String() names (pdata/plog/severity_number.go:53-106)
_SEVERITY_ENUM_NAMES = {0: "Unspecified"}
for _i, _base in enumerate(("Trace", "Debug", "Info", "Warn", "Error", "Fatal")):
    for _j in range(4):
        _SEVERITY_ENUM_NAMES[1 + _i * 4 + _j] = _base + (str(_j + 1) if _j else "")


def go_ts_str(ns: Column) -> Column:
    """Go ``time.Time.String()`` of a ns timestamp in UTC — ns-precision
    fraction with trailing zeros trimmed (format ``2006-01-02 15:04:05
    .999999999 -0700 MST``), the exact text pcommon.Timestamp renders in
    the reference goldens (testdata/logs/one_record.out:
    ``2020-02-11 20:26:13.000000789 +0000 UTC``)."""
    ns = F.coalesce(ns.cast("long"), F.lit(0).cast("long"))
    sec = F.call_function("div", ns, F.lit(1_000_000_000))
    frac = F.pmod(ns, F.lit(1_000_000_000))
    base = F.date_format(F.timestamp_seconds(sec), "yyyy-MM-dd HH:mm:ss")
    frac_s = F.when(
        frac > 0,
        F.concat(
            F.lit("."),
            F.regexp_replace(F.lpad(frac.cast("string"), 9, "0"), "0+$", ""),
        ),
    ).otherwise(F.lit(""))
    return F.concat(base, frac_s, F.lit(" +0000 UTC"))


def _severity_name(num: Column) -> Column:
    out = None
    for n, name in _SEVERITY_ENUM_NAMES.items():
        out = (out.when if out is not None else F.when)(num == F.lit(n), F.lit(name))
    return out.otherwise(F.lit(""))


def _typed_kv_lines(attrs: Column, header: str, prefix: str = "     -> ") -> Column:
    """``header:`` + ``{prefix}key: Type(value)`` lines from an
    array<struct<key,vtype,value>> column — databuffer.go logAttributes
    (header printed ONLY when the map is non-empty, values via
    valueToString's Type(AsString) form). Entries render in array order
    (pcommon.Map preserves insertion order)."""
    lines = F.transform(
        attrs,
        lambda e: F.concat(
            F.lit(prefix),
            e.getField("key"),
            F.lit(": "),
            e.getField("vtype"),
            F.lit("("),
            e.getField("value"),
            F.lit(")"),
        ),
    )
    return F.when(
        attrs.isNotNull() & (F.size(attrs) > 0),
        F.concat(F.lit(f"{header}:\n"), F.array_join(lines, "\n"), F.lit("\n")),
    ).otherwise(F.lit(""))


def golden_logs_text(frame: DataFrame) -> str:
    """Render a plog frame to the reference's EXACT golden text bytes
    (exporter/loggingexporter/internal/otlptext/logs.go:29-62 +
    databuffer.go:32-60) — ResourceLog/ScopeLogs section headers,
    ``SeverityNumber: Name(n)``, ns-precision Go timestamps, typed
    attribute lines. Locked byte-identical against the reference's own
    testdata/logs/*.out corpus in tests/test_otlptext.py.

    ``frame`` columns: rl_idx, scope_idx, rec_idx (ints); per-resource
    resource_schema_url + resource_attrs; per-scope scope_name/
    scope_version/scope_schema_url; per-record time_unix_nano,
    observed_unix_nano, severity_number, severity_text,
    body_vtype/body_value, attributes (array<struct<key,vtype,value>>),
    trace_id, span_id, flags. Rendering is column expressions + two tiny
    hierarchical aggregations; the final assembly collects one row per
    ResourceLog (a golden/debug surface, not a data path)."""
    rec_txt = F.concat(
        F.format_string("LogRecord #%d\n", F.col("rec_idx")),
        F.lit("ObservedTimestamp: "), go_ts_str(F.col("observed_unix_nano")), F.lit("\n"),
        F.lit("Timestamp: "), go_ts_str(F.col("time_unix_nano")), F.lit("\n"),
        F.lit("SeverityText: "), _s(F.col("severity_text")), F.lit("\n"),
        F.lit("SeverityNumber: "),
        _severity_name(F.col("severity_number")),
        F.format_string("(%d)\n", F.coalesce(F.col("severity_number"), F.lit(0))),
        F.lit("Body: "), _s(F.col("body_vtype")), F.lit("("), _s(F.col("body_value")), F.lit(")\n"),
        _typed_kv_lines(F.col("attributes"), "Attributes"),
        F.lit("Trace ID: "), _s(F.col("trace_id")), F.lit("\n"),
        F.lit("Span ID: "), _s(F.col("span_id")), F.lit("\n"),
        F.lit("Flags: "), _s(F.coalesce(F.col("flags"), F.lit(0))), F.lit("\n"),
    )
    scopes = (
        frame.withColumn("__rec", rec_txt)
        .groupBy("rl_idx", "scope_idx")
        .agg(
            F.first("resource_schema_url").alias("resource_schema_url"),
            F.first("resource_attrs").alias("resource_attrs"),
            F.first("scope_name").alias("scope_name"),
            F.first("scope_version").alias("scope_version"),
            F.first("scope_schema_url").alias("scope_schema_url"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("rec_idx"), F.col("__rec")))
                    ),
                    lambda s: s.getField("__rec"),
                ),
                "",
            ).alias("__recs"),
        )
    )
    scope_txt = F.concat(
        F.format_string("ScopeLogs #%d\n", F.col("scope_idx")),
        F.lit("ScopeLogs SchemaURL: "), _s(F.col("scope_schema_url")), F.lit("\n"),
        # logInstrumentationScope: "InstrumentationScope %s %s"
        F.lit("InstrumentationScope "), _s(F.col("scope_name")), F.lit(" "),
        _s(F.col("scope_version")), F.lit("\n"),
        F.col("__recs"),
    )
    resources = (
        scopes.withColumn("__scope", scope_txt)
        .groupBy("rl_idx")
        .agg(
            F.first("resource_schema_url").alias("resource_schema_url"),
            F.first("resource_attrs").alias("resource_attrs"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("scope_idx"), F.col("__scope")))
                    ),
                    lambda s: s.getField("__scope"),
                ),
                "",
            ).alias("__scopes"),
        )
    )
    rl_txt = F.concat(
        F.format_string("ResourceLog #%d\n", F.col("rl_idx")),
        F.lit("Resource SchemaURL: "), _s(F.col("resource_schema_url")), F.lit("\n"),
        _typed_kv_lines(F.col("resource_attrs"), "Resource attributes"),
        F.col("__scopes"),
    )
    rows = resources.select("rl_idx", rl_txt.alias("__rl")).orderBy("rl_idx").collect()
    return "".join(r["__rl"] for r in rows)


def render_span(prefix_index: Column | None = None) -> Column:
    """Canonical text block for one span — mirrors the trace renderer's
    field order (exporter/loggingexporter/internal/otlptext/traces.go:
    Trace ID, Parent ID, ID, Name, Kind, Start/End time, Status
    code/message, Attributes), with Kind/StatusCode rendered via their
    enum String() names (span_kind.go:28-45, status_code.go:32-43)."""
    from ..operators.traces import SPAN_KIND, STATUS_CODE

    def enum_str(col: Column, mapping: dict[str, int]) -> Column:
        expr = F.lit("")
        out = None
        for name, num in mapping.items():
            branch = F.when(col == F.lit(num), F.lit(name))
            out = branch if out is None else out.when(col == F.lit(num), F.lit(name))
        return out.otherwise(expr)

    header = (
        F.concat(F.lit("Span #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("Span\n")
    )
    return F.concat(
        header,
        F.lit("Trace ID: "), _s(F.col("trace_id")), F.lit("\n"),
        F.lit("Parent ID: "), _s(F.col("parent_span_id")), F.lit("\n"),
        F.lit("ID: "), _s(F.col("span_id")), F.lit("\n"),
        F.lit("Name: "), _s(F.col("name")), F.lit("\n"),
        F.lit("Kind: "), enum_str(F.col("kind"), SPAN_KIND), F.lit("\n"),
        F.lit("Start time: "), _ts_str(F.col("start_time_unix_nano")), F.lit("\n"),
        F.lit("End time: "), _ts_str(F.col("end_time_unix_nano")), F.lit("\n"),
        F.lit("Status code: "), enum_str(F.col("status_code"), STATUS_CODE), F.lit("\n"),
        F.lit("Status message: "), _s(F.col("status_message")), F.lit("\n"),
        _attr_lines(F.col("attributes")),
        _span_events_block(F.col("events")),
        _span_links_block(F.col("links")),
    )


def _nested_attr_lines(attrs: Column) -> Column:
    """``     -> Attributes::`` block nested inside an event/link entry
    (databuffer.go logAttributes offsets the prefix to ``          ->``
    when the header itself is an arrow line — see two_spans.out)."""
    entries = F.sort_array(F.map_entries(attrs))
    lines = F.transform(
        entries,
        lambda e: F.concat(
            F.lit("          -> "),
            e.getField("key"),
            F.lit(": Str("),
            e.getField("value"),
            F.lit(")"),
        ),
    )
    return F.when(
        F.size(entries) > 0,
        F.concat(F.lit("\n     -> Attributes::\n"), F.array_join(lines, "\n")),
    ).otherwise(F.lit(""))


def _span_events_block(events: Column) -> Column:
    """``Events:`` section — SpanEvent #i blocks with Name/Timestamp/
    DroppedAttributesCount and nested attributes (databuffer.go:231-249
    logEvents; the dropped-count line is UNCONDITIONAL there — our model
    carries no per-event dropped counts, so it prints the 0 the reference
    prints for that case)."""
    blocks = F.transform(
        events,
        lambda e, i: F.concat(
            F.format_string("SpanEvent #%d", i),
            F.lit("\n     -> Name: "),
            _s(e.getField("name")),
            F.lit("\n     -> Timestamp: "),
            _ts_str(e.getField("time_unix_nano")),
            F.lit("\n     -> DroppedAttributesCount: 0"),
            _nested_attr_lines(e.getField("attributes")),
        ),
    )
    return F.when(
        F.size(events) > 0,
        F.concat(F.lit("Events:\n"), F.array_join(blocks, "\n"), F.lit("\n")),
    ).otherwise(F.lit(""))


def _span_links_block(links: Column) -> Column:
    """``Links:`` section — SpanLink #i blocks with Trace ID/ID/TraceState/
    DroppedAttributesCount and nested attributes (databuffer.go:251-270
    logLinks; unconditional dropped-count line, 0 in our model)."""
    blocks = F.transform(
        links,
        lambda l, i: F.concat(
            F.format_string("SpanLink #%d", i),
            F.lit("\n     -> Trace ID: "),
            _s(l.getField("trace_id")),
            F.lit("\n     -> ID: "),
            _s(l.getField("span_id")),
            F.lit("\n     -> TraceState: "),
            _s(l.getField("trace_state")),
            F.lit("\n     -> DroppedAttributesCount: 0"),
            _nested_attr_lines(l.getField("attributes")),
        ),
    )
    return F.when(
        F.size(links) > 0,
        F.concat(F.lit("Links:\n"), F.array_join(blocks, "\n"), F.lit("\n")),
    ).otherwise(F.lit(""))


def render_number_data_point(prefix_index: Column | None = None) -> Column:
    """Canonical text block for one Sum/Gauge data point
    (databuffer.go:102-117 logNumberDataPoints: attributes,
    StartTimestamp, Timestamp, Value)."""
    header = (
        F.concat(F.lit("NumberDataPoints #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("NumberDataPoints\n")
    )
    from .values import es6_double_col

    return F.concat(
        header,
        _attr_lines(F.col("attributes")),
        F.lit("StartTimestamp: "), _ts_str(F.col("start_time_unix_nano")), F.lit("\n"),
        F.lit("Timestamp: "), _ts_str(F.col("time_unix_nano")), F.lit("\n"),
        F.lit("Value: "), _s(es6_double_col(F.col("value_double"))), F.lit("\n"),
    )


def render_histogram_data_point(
    prefix_index: Column | None = None, attr_name: str = "event_type"
) -> Column:
    """Canonical text block for one explicit-bounds Histogram data point
    (databuffer.go:119-151 logHistogramDataPoints): attributes,
    Start/Timestamp, Count, Sum, then ``ExplicitBounds #i`` and
    ``Buckets #j, Count`` lines. Operates on the histogram_points frame
    (attr_key, hist_count, hist_sum, hist_explicit_bounds,
    hist_bucket_counts); the frame carries no per-point timestamps, so
    the reference's zero-value rendering is used."""
    header = (
        F.concat(F.lit("HistogramDataPoints #"), prefix_index.cast("string"), F.lit("\n"))
        if prefix_index is not None
        else F.lit("HistogramDataPoints\n")
    )
    def _lines(arr: Column, fmt) -> Column:
        # NULL/empty arrays render NOTHING (a foreign payload may omit
        # bounds/buckets entirely — HasX=false; an unguarded array_join
        # would null the whole concat and the record would vanish)
        return F.when(
            arr.isNotNull() & (F.size(arr) > 0),
            F.concat(F.array_join(F.transform(arr, fmt), "\n"), F.lit("\n")),
        ).otherwise(F.lit(""))

    bounds = _lines(
        F.col("hist_explicit_bounds"),
        lambda b, i: F.format_string("ExplicitBounds #%d: %f", i, b),
    )
    buckets = _lines(
        F.col("hist_bucket_counts"),
        lambda c, i: F.format_string("Buckets #%d, Count: %d", i, c),
    )
    return F.concat(
        header,
        F.lit("Data point attributes:\n"),
        F.lit(f"     -> {attr_name}: Str("), _s(F.col("attr_key")), F.lit(")\n"),
        F.lit(f"StartTimestamp: {_EPOCH_ZERO}\n"),
        F.lit(f"Timestamp: {_EPOCH_ZERO}\n"),
        # proto3 default 0 when the unmarshal null-filled count
        F.lit("Count: "), _s(F.coalesce(F.col("hist_count"), F.lit(0))), F.lit("\n"),
        # optional sum/min/max (HasSum/HasMin/HasMax — rendered only when
        # present, databuffer.go:129-139)
        F.when(
            F.col("hist_sum").isNotNull(),
            F.concat(F.lit("Sum: "), _f6(F.col("hist_sum")), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("hist_min").isNotNull(),
            F.concat(F.lit("Min: "), _f6(F.col("hist_min")), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("hist_max").isNotNull(),
            F.concat(F.lit("Max: "), _f6(F.col("hist_max")), F.lit("\n")),
        ).otherwise(F.lit("")),
        bounds,
        buckets,
    )


def render_exp_histogram_points(
    points: DataFrame, attr_name: str = "event_type"
) -> DataFrame:
    """(attr_key, rendered) blocks from long-form exponential-histogram
    bucket rows (databuffer.go:152-206): per key one
    ``ExponentialHistogramDataPoints`` block with Count/Sum/zero-bucket/
    positive ``Bucket [lower, upper), Count: n`` lines, boundaries
    exp(index·ln2·2⁻ˢᶜᵃˡᵉ). Bounded by #keys × #buckets."""
    per_key = points.groupBy("attr_key", "scale").agg(
        F.sum("n").cast("long").alias("__count"),
        F.round(F.sum("bucket_sum"), 4).alias("__sum"),
        F.sort_array(
            F.collect_list(F.struct(F.col("bucket_index"), F.col("n")))
        ).alias("__buckets"),
    )
    factor = F.log(F.lit(2.0)) * F.pow(F.lit(2.0), -F.col("scale"))
    bucket_lines = F.array_join(
        F.transform(
            F.col("__buckets"),
            lambda b: F.when(
                b.getField("bucket_index").isNull(),
                F.format_string("Bucket [0, 0], Count: %d", b.getField("n")),
            ).otherwise(
                F.format_string(
                    "Bucket [%f, %f), Count: %d",
                    F.exp(b.getField("bucket_index") * factor),
                    F.exp((b.getField("bucket_index") + F.lit(1)) * factor),
                    b.getField("n"),
                )
            ),
        ),
        "\n",
    )
    rendered = F.concat(
        F.lit("ExponentialHistogramDataPoints\n"),
        F.lit("Data point attributes:\n"),
        F.lit(f"     -> {attr_name}: Str("), _s(F.col("attr_key")), F.lit(")\n"),
        F.lit(f"StartTimestamp: {_EPOCH_ZERO}\n"),
        F.lit(f"Timestamp: {_EPOCH_ZERO}\n"),
        F.lit("Count: "), _s(F.coalesce(F.col("__count"), F.lit(0))), F.lit("\n"),
        # HasSum gating (databuffer.go:163-165): a point without a sum
        # renders no Sum line instead of nulling the whole block
        F.when(
            F.col("__sum").isNotNull(),
            F.concat(F.lit("Sum: "), _f6(F.col("__sum")), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.coalesce(F.concat(bucket_lines, F.lit("\n")), F.lit("")),
    )
    return per_key.select("attr_key", rendered.alias("rendered"))


def render_summary_points(points: DataFrame, attr_name: str = "event_type") -> DataFrame:
    """(attr_key, rendered) blocks from long-form Summary quantile rows
    (databuffer.go:208-229 logDoubleSummaryDataPoints): Count, Sum, then
    ``QuantileValue #i: Quantile q, Value v`` lines sorted by quantile."""
    per_key = points.groupBy("attr_key", "summary_count", "summary_sum").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("quantile"), F.col("quantile_value")))
        ).alias("__qs")
    )
    q_lines = F.array_join(
        F.transform(
            F.col("__qs"),
            lambda q, i: F.format_string(
                "QuantileValue #%d: Quantile %f, Value %f",
                i,
                q.getField("quantile"),
                q.getField("quantile_value"),
            ),
        ),
        "\n",
    )
    rendered = F.concat(
        F.lit("SummaryDataPoints\n"),
        F.lit("Data point attributes:\n"),
        F.lit(f"     -> {attr_name}: Str("), _s(F.col("attr_key")), F.lit(")\n"),
        F.lit(f"StartTimestamp: {_EPOCH_ZERO}\n"),
        F.lit(f"Timestamp: {_EPOCH_ZERO}\n"),
        F.lit("Count: "), _s(F.coalesce(F.col("summary_count"), F.lit(0))), F.lit("\n"),
        # a summary point carrying no sum renders no Sum line (same
        # null-safety contract as the histogram renderers)
        F.when(
            F.col("summary_sum").isNotNull(),
            F.concat(F.lit("Sum: "), _f6(F.col("summary_sum")), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.coalesce(F.concat(q_lines, F.lit("\n")), F.lit("")),
    )
    return per_key.select("attr_key", rendered.alias("rendered"))


def render_records(records: DataFrame) -> DataFrame:
    """records → (url, line_no, rendered) — the debug-sink projection."""
    return records.select(
        "url",
        "line_no",
        render_log_record(F.col("line_no")).alias("rendered"),
    )


def render_to_string(records: DataFrame, limit: int = 100) -> str:
    """Driver-side golden-text assembly for tests/debug display: records
    ordered by (url, line_no), concatenated. Only for small frames."""
    rows = (
        render_records(records)
        .orderBy("url", "line_no")
        .limit(limit)
        .collect()
    )
    return "".join(r["rendered"] for r in rows)
