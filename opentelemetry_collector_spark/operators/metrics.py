"""pmetric data model + temporality conversion (SURVEY.md §1.1).

The reference's second signal type is a tagged union of 5 point types —
Gauge | Sum | Histogram | ExponentialHistogram | Summary
(pdata/pmetric/metric_type.go:21-27, accessors generated_metric.go:109-222)
— where every Sum/Histogram carries an AggregationTemporality of Delta or
Cumulative (pdata/pmetric/aggregation_temporality.go:26-31) and data points
carry (start_time, time, attributes, value) (generated_metric.go).

Spark mapping (SURVEY §1.1): a **long-format DataFrame** — one row per
data point, ``metric_type`` tag column, nullable per-type columns — so
every aggregation is a plain groupBy and Catalyst prunes the unused
type's columns out of any plan that doesn't touch them.

Operators:

- ``events_to_sum_points``: windowed Delta Sum data points from an event
  stream (count + sum per key per tumbling window) — the metrics-receiver
  boundary.
- ``delta_to_cumulative``: the temporality conversion the reference leaves
  to processors: running sum per series ordered by time. One shuffle on
  the series key; per-series state is a single running value, so the
  window never materializes more than a series' points on one reducer —
  series cardinality, not row count, bounds skew.
- ``cumulative_to_delta``: inverse (lag subtraction), first point keeps
  its value (delta-from-start semantics).
- ``histogram_points``: explicit-bounds histogram data points
  (count/sum/bucket_counts per key), computed as conditional sums in ONE
  hash aggregate — no explode, no row multiplication; the per-bucket rows
  for inspection come from a stack() of the wide result (bounded by
  #keys × #buckets).

All expressions are JVM built-ins; doubles are rounded at the output
boundary for engine parity (cumulative sums run over already-rounded
deltas in deterministic time order, so Spark and DuckDB produce identical
IEEE sequences).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# pdata/pmetric/metric_type.go:21-27
METRIC_TYPE = {
    "Empty": 0,
    "Gauge": 1,
    "Sum": 2,
    "Histogram": 3,
    "ExponentialHistogram": 4,
    "Summary": 5,
}

# pdata/pmetric/aggregation_temporality.go:26-31
TEMPORALITY_UNSPECIFIED = 0
TEMPORALITY_DELTA = 1
TEMPORALITY_CUMULATIVE = 2

DEFAULT_HIST_BOUNDS = (1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0)

# Long-format metric point: one row per data point, metric_type tag,
# nullable per-type columns (SURVEY §1.1). Gauge/Sum use value_double;
# Histogram uses hist_*; a Summary would add quantile arrays.
METRIC_POINTS_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_type", T.IntegerType(), False),
        T.StructField("unit", T.StringType(), True),
        T.StructField("aggregation_temporality", T.IntegerType(), False),
        T.StructField("is_monotonic", T.BooleanType(), True),
        T.StructField("start_time_unix_nano", T.LongType(), True),
        T.StructField("time_unix_nano", T.LongType(), False),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("value_double", T.DoubleType(), True),
        T.StructField("hist_count", T.LongType(), True),
        T.StructField("hist_sum", T.DoubleType(), True),
        T.StructField("hist_min", T.DoubleType(), True),
        T.StructField("hist_max", T.DoubleType(), True),
        T.StructField("hist_bucket_counts", T.ArrayType(T.LongType()), True),
        T.StructField("hist_explicit_bounds", T.ArrayType(T.DoubleType()), True),
    ]
)


def events_to_sum_points(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width_seconds: int = 300,
    metric_name: str = "events.value",
) -> DataFrame:
    """Event stream → Delta Sum data points per (key, tumbling window).

    One data point per (key, window): ``point_count`` items and the 4-dp
    rounded ``value_double`` sum over the window — Delta temporality, the
    window start/end as start/time nanos (aggregation_temporality.go:29:
    "changes since last report time"). Single hash-aggregate shuffle.
    """
    return _sum_points(events, key_col, ts_col, value_col, width_seconds, metric_name)


def count_connector(
    records: DataFrame,
    attrs: tuple[str, ...] = ("event_type",),
    metric_name: str = "log.record.count",
    condition: Column | None = None,
) -> DataFrame:
    """Connector matrix logs→metrics cell (connector/connector.go:324-391):
    count log records per attribute set, emitted as monotonic Delta Sum
    data points on the pmetric frame — the count-connector semantics
    (default metric ``log.record.count``, optional match ``condition``
    scoping which records count).

    ONE hash aggregate over the grouping attrs (map-side partial combine;
    key cardinality = attribute-set cardinality, tiny by construction);
    the ``condition`` filter sits below the aggregate so it pushes to the
    scan. Record count becomes ``point_count`` AND ``value_double`` —
    the count connector's sum metric VALUE is the count.
    """
    if not attrs:
        raise ValueError("count_connector: at least one grouping attribute")
    src = records.where(condition) if condition is not None else records
    attr_map = F.create_map(
        *[c for a in attrs for c in (F.lit(a), F.col(a).cast("string"))]
    )
    return (
        src.groupBy(*[F.col(a) for a in attrs])
        .agg(F.count("*").alias("point_count"))
        .select(
            F.lit(metric_name).alias("metric_name"),
            F.lit(METRIC_TYPE["Sum"]).alias("metric_type"),
            F.lit(TEMPORALITY_DELTA).alias("aggregation_temporality"),
            F.lit(True).alias("is_monotonic"),
            attr_map.alias("attributes"),
            *[F.col(a) for a in attrs],
            F.col("point_count"),
            F.col("point_count").cast("double").alias("value_double"),
        )
    )


def threshold_filtered_points(
    points: DataFrame,
    warn_factor: float,
    error_factor: float,
    value_col: str,
):
    """Shared data-derived tier derivation for the two alerting connector
    cells — metrics→logs (:func:`metrics_to_alert_logs`) and
    metrics→traces (``traces.metrics_to_anomaly_spans``). Both DuckDB
    oracles replay the SAME constants, so the recipe lives in exactly one
    place: a 1-row ``round(avg(value), 2)`` global mean broadcast back as
    a constant join (the points frame never shuffles), tier cuts at
    ``warn_factor × mean`` / ``error_factor × mean`` rounded to 4 dp for
    cross-engine reproducibility, rows filtered at ``>= warn``.

    Returns ``(filtered_points, warn_thr, is_err)`` — the filtered frame
    plus the warn-threshold column and the error-tier predicate for the
    caller's projection.
    """
    mean = points.agg(F.round(F.avg(value_col), 2).alias("_mean_v"))
    v = F.col(value_col)
    warn_thr = F.round(F.col("_mean_v") * F.lit(warn_factor), 4)
    err_thr = F.round(F.col("_mean_v") * F.lit(error_factor), 4)
    filtered = points.join(F.broadcast(mean)).where(v >= warn_thr)
    return filtered, warn_thr, (v >= err_thr)


def metrics_to_alert_logs(
    points: DataFrame,
    warn_factor: float = 1.5,
    error_factor: float = 3.0,
    value_col: str = "value_double",
    key_col: str = "attr_key",
) -> DataFrame:
    """Connector matrix metrics→logs cell (connector/connector.go:324-391)
    — the alerting shape, the inverse of the count connector's
    logs→metrics: metric data points crossing a threshold become plog
    records (severity_number.go:26-46: WARN=13, ERROR=17).

    The threshold derives from the data itself: ONE 1-row global
    aggregate (``round(avg(value), 2)``) broadcast back as a constant
    join — the points frame never shuffles; the alert predicate is a
    scan-speed filter under it. Severity tiers at
    ``warn_factor × mean`` / ``error_factor × mean`` (both rounded to
    4 dp so the cut is reproducible cross-engine). The record body is a
    deterministic string without floats so byte parity never rides
    printf behavior.
    """
    from ..schemas import SEVERITY_NUMBER

    filtered, warn_thr, is_err = threshold_filtered_points(
        points, warn_factor, error_factor, value_col
    )
    v = F.col(value_col)
    return (
        filtered
        .select(
            F.col("time_unix_nano"),
            F.when(is_err, F.lit("ERROR")).otherwise(F.lit("WARN")).alias(
                "severity_text"
            ),
            F.when(is_err, F.lit(SEVERITY_NUMBER["ERROR"]))
            .otherwise(F.lit(SEVERITY_NUMBER["WARN"]))
            .cast("int")
            .alias("severity_number"),
            F.format_string(
                "alert: %s %s above threshold", F.col("metric_name"), F.col(key_col)
            ).alias("body"),
            F.col("metric_name"),
            F.col(key_col),
            v.alias("value_double"),
            warn_thr.alias("threshold"),
        )
    )


def _sum_points(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_seconds: int,
    metric_name: str,
    extra_aggs: list[Column] | None = None,
    extra_cols: list[Column] | None = None,
) -> DataFrame:
    """Shared Delta-Sum envelope: tumbling-window hash aggregate + the
    metric/point projection. ``extra_aggs`` ride the same single shuffle;
    ``extra_cols`` extend the projection (exemplars, below)."""
    w = F.window(F.col(ts_col), f"{width_seconds} seconds")
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("point_count"),
            F.round(F.sum(value_col), 4).alias("value_double"),
            *(extra_aggs or []),
        )
        .select(
            F.lit(metric_name).alias("metric_name"),
            F.lit(METRIC_TYPE["Sum"]).alias("metric_type"),
            F.lit(TEMPORALITY_DELTA).alias("aggregation_temporality"),
            F.lit(True).alias("is_monotonic"),
            (F.unix_timestamp(F.col("w.start")) * F.lit(1_000_000_000))
            .cast("long")
            .alias("start_time_unix_nano"),
            (F.unix_timestamp(F.col("w.end")) * F.lit(1_000_000_000))
            .cast("long")
            .alias("time_unix_nano"),
            F.create_map(F.lit(key_col), F.col(key_col)).alias("attributes"),
            F.col(key_col).alias("attr_key"),
            F.col("point_count"),
            F.col("value_double"),
            *(extra_cols or []),
        )
    )


def delta_to_cumulative(
    points: DataFrame,
    series_cols: tuple[str, ...] = ("metric_name", "attr_key"),
    time_col: str = "time_unix_nano",
    value_cols: tuple[str, ...] = ("point_count", "value_double"),
) -> DataFrame:
    """Delta → Cumulative: running sum per series in time order.

    The reported value becomes "change since a fixed start time"
    (aggregation_temporality.go:31): cumulative_v = Σ deltas up to and
    including this point, and every point's start_time collapses to the
    series' first start (the fixed origin). One shuffle on the series key.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[F.col(c) for c in series_cols])
        .orderBy(F.col(time_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = points
    for v in value_cols:
        out = out.withColumn(f"cum_{v}", F.round(F.sum(F.col(v)).over(w), 4))
    first_start = F.min("start_time_unix_nano").over(
        Window.partitionBy(*[F.col(c) for c in series_cols])
    )
    return (
        out.withColumn("start_time_unix_nano", first_start)
        .withColumn(
            "aggregation_temporality", F.lit(TEMPORALITY_CUMULATIVE)
        )
    )


def cumulative_to_delta(
    points: DataFrame,
    series_cols: tuple[str, ...] = ("metric_name", "attr_key"),
    time_col: str = "time_unix_nano",
    value_cols: tuple[str, ...] = ("value_double",),
) -> DataFrame:
    """Cumulative → Delta: v - lag(v) per series; the first point keeps its
    value (delta from the series origin). Inverse of delta_to_cumulative."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(F.col(time_col))
    out = points
    for v in value_cols:
        out = out.withColumn(
            f"delta_{v}",
            F.round(F.col(v) - F.coalesce(F.lag(F.col(v)).over(w), F.lit(0.0)), 4),
        )
    prev_time = F.lag(F.col(time_col)).over(w)
    return (
        out.withColumn(
            "start_time_unix_nano",
            F.coalesce(prev_time, F.col("start_time_unix_nano")),
        )
        .withColumn("aggregation_temporality", F.lit(TEMPORALITY_DELTA))
    )


def histogram_points(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    bounds: tuple[float, ...] = DEFAULT_HIST_BOUNDS,
) -> DataFrame:
    """Explicit-bounds Histogram data points per key
    (generated_metric.go Histogram accessors; OTLP bucket semantics:
    bucket i counts values in (bounds[i-1], bounds[i]], plus a final
    overflow bucket > bounds[-1] — len(bucket_counts) = len(bounds)+1).

    ONE hash aggregate with a conditional sum per bucket (map-side
    partials, no explode); the wide row then carries the model columns
    count/sum/bucket_counts/explicit_bounds.
    """
    v = F.col(value_col)
    conds: list[Column] = []
    for i, b in enumerate(bounds):
        lo_ok = v > F.lit(bounds[i - 1]) if i > 0 else F.lit(True)
        conds.append(lo_ok & (v <= F.lit(b)))
    conds.append(v > F.lit(bounds[-1]))  # overflow bucket
    aggs = [
        F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(f"__b{i}")
        for i, c in enumerate(conds)
    ]
    wide = events.groupBy(F.col(key_col)).agg(
        F.count("*").cast("long").alias("hist_count"),
        F.round(F.sum(v), 4).alias("hist_sum"),
        # optional min/max the reference's HistogramDataPoint carries
        # (HasMin/HasMax accessors; rendered by the golden text exporter)
        F.round(F.min(v), 4).alias("hist_min"),
        F.round(F.max(v), 4).alias("hist_max"),
        *aggs,
    )
    return wide.select(
        F.lit("events.value.hist").alias("metric_name"),
        F.lit(METRIC_TYPE["Histogram"]).alias("metric_type"),
        F.lit(TEMPORALITY_DELTA).alias("aggregation_temporality"),
        F.col(key_col).alias("attr_key"),
        F.col("hist_count"),
        F.col("hist_sum"),
        F.col("hist_min"),
        F.col("hist_max"),
        F.array(*[F.col(f"__b{i}") for i in range(len(bounds) + 1)]).alias(
            "hist_bucket_counts"
        ),
        F.array(*[F.lit(float(b)) for b in bounds]).alias("hist_explicit_bounds"),
    )


def gauge_points(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    width_seconds: int = 300,
) -> DataFrame:
    """Gauge data points (metric_type 1): the LAST observed value per
    (key, tumbling window) — sampled, not aggregated, which is the gauge
    semantic (metric_type.go: Gauge). Deterministic tie-break on
    (ts, id). One window shuffle on (key, window)."""
    from pyspark.sql import Window

    w = F.window(F.col(ts_col), f"{width_seconds} seconds")
    ranked = events.select(
        F.col(key_col).alias("attr_key"),
        (F.unix_timestamp(w.getField("end"))).cast("long").alias("window_end"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("value_double"),
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("attr_key", "window_end").orderBy(
                F.col("__ts").desc(), F.col("__id").desc()
            )
        ),
    )
    return ranked.where(F.col("__rn") == 1).select(
        F.lit("events.value.gauge").alias("metric_name"),
        F.lit(METRIC_TYPE["Gauge"]).alias("metric_type"),
        "attr_key",
        "window_end",
        F.round("value_double", 4).alias("value_double"),
    )


def exp_histogram_points(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    scale: int = 2,
) -> DataFrame:
    """ExponentialHistogram data points per key (metric_type 4,
    pdata/pmetric/generated_metric.go ExponentialHistogram accessors).

    OTLP base-2 exponential bucketing: base = 2^(2^-scale); bucket index
    for v > 0 is ⌈log₂(v)·2^scale⌉ − 1 (values ≤ 0 land in zero_count).
    The log product is rounded to 9 dp before the ceil so a 1-ulp libm
    difference between engines cannot flip a bucket boundary — the DuckDB
    oracle applies the identical rounding. Long-form output: one row per
    non-empty bucket (scale, bucket_index, n, hist count/sum per key) via
    a single explode-free aggregation + unpivot of observed indexes.
    """
    v = F.col(value_col)
    idx = (
        F.ceil(F.round(F.log2(v) * F.lit(float(2**scale)), 9)) - F.lit(1)
    ).cast("long")
    pts = events.select(
        F.col(key_col).alias("attr_key"),
        F.when(v > 0, idx).alias("bucket_index"),
        v.alias("__v"),
    )
    return (
        pts.groupBy("attr_key", "bucket_index")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("__v"), 4).alias("bucket_sum"))
        .select(
            F.lit("events.value.exphist").alias("metric_name"),
            F.lit(METRIC_TYPE["ExponentialHistogram"]).alias("metric_type"),
            F.lit(TEMPORALITY_DELTA).alias("aggregation_temporality"),
            F.lit(scale).alias("scale"),
            "attr_key",
            "bucket_index",
            "n",
            "bucket_sum",
        )
    )


def summary_points(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Summary data points per key (metric_type 5): count, sum, and the
    configured quantile values (generated_metric.go Summary accessors).

    Uses Spark's EXACT ``percentile`` (linear interpolation over the
    sorted group — the same definition as SQL quantile_cont), not the
    approximate sketch, so the DuckDB oracle matches to the rounding
    boundary. One hash-aggregate shuffle; long-form one row per quantile.
    """
    qlist = ", ".join(str(q) for q in quantiles)
    wide = events.groupBy(F.col(key_col).alias("attr_key")).agg(
        F.count("*").cast("long").alias("summary_count"),
        F.round(F.sum(value_col), 4).alias("summary_sum"),
        F.expr(f"percentile({value_col}, array({qlist}))").alias("__qs"),
    )
    exploded = wide.select(
        F.lit("events.value.summary").alias("metric_name"),
        F.lit(METRIC_TYPE["Summary"]).alias("metric_type"),
        "attr_key",
        "summary_count",
        "summary_sum",
        F.posexplode("__qs").alias("__i", "__qv"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in quantiles])
    return exploded.select(
        "metric_name",
        "metric_type",
        "attr_key",
        "summary_count",
        "summary_sum",
        F.element_at(q_arr, F.col("__i") + 1).alias("quantile"),
        F.round(F.col("__qv"), 4).alias("quantile_value"),
    )


def histogram_buckets_long(hist: DataFrame, bounds: tuple[float, ...]) -> DataFrame:
    """Exploded (attr_key, bucket_idx, le, n) rows from histogram points —
    the scalar long form for oracle comparison (+inf rendered as NULL le).
    Bounded by #keys × #buckets rows; posexplode of a small array."""
    exploded = hist.select(
        "attr_key",
        "hist_count",
        "hist_sum",
        "hist_min",
        "hist_max",
        F.posexplode("hist_bucket_counts").alias("bucket_idx", "n"),
    )
    le = F.when(
        F.col("bucket_idx") < len(bounds),
        F.element_at(
            F.array(*[F.lit(float(b)) for b in bounds]), F.col("bucket_idx") + 1
        ),
    )
    return exploded.select(
        "attr_key",
        F.col("bucket_idx").cast("int").alias("bucket_idx"),
        le.alias("le"),
        F.col("n"),
        "hist_count",
        "hist_sum",
        "hist_min",
        "hist_max",
    )


def sum_points_with_exemplars(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    user_col: str = "user_id",
    width_seconds: int = 300,
    metric_name: str = "events.value",
) -> DataFrame:
    """Delta Sum data points + one Exemplar per point (pdata Exemplar:
    filtered attributes, time, value, span/trace ids —
    pdata/pmetric/generated_metric.go Exemplar accessors; the wire shape
    of pmetricjson's "exemplars"/"filtered_attributes" cases).

    The exemplar is the MAX-VALUE event of the window (deterministic
    tie-break on event id), carrying the same derived trace/span ids the
    span model uses — the metrics→trace pivot exemplars exist for. One
    hash aggregate: the exemplar rides the same shuffle via ``max_by``
    over a (value, id) struct (lexicographic, matching the oracle's
    ORDER BY value DESC, id DESC rank).
    """
    ev_ns = (F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)).cast("long")
    ex = F.struct(
        ev_ns.alias("time_unix_nano"),
        F.round(F.col(value_col), 4).alias("value_double"),
        F.md5(F.concat(F.lit("trace:"), F.col(user_col))).alias("trace_id"),
        F.substring(F.md5(F.concat(F.lit("span:"), F.col(id_col))), 1, 16).alias(
            "span_id"
        ),
        F.create_map(F.lit(id_col), F.col(id_col).cast("string")).alias(
            "filtered_attributes"
        ),
    )
    return _sum_points(
        events,
        key_col,
        ts_col,
        value_col,
        width_seconds,
        metric_name,
        extra_aggs=[
            F.max_by(ex, F.struct(F.col(value_col), F.col(id_col))).alias("__ex")
        ],
        extra_cols=[F.array(F.col("__ex")).alias("exemplars")],
    )
