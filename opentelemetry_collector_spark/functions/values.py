"""pcommon.Value / flags analogs as columnar expressions.

The reference's open variant type (pdata/pcommon/value.go:31-40) has a
canonical string form AsString (value.go:361-426): JSON for map/slice,
base64 for bytes, ES6-style number formatting for doubles. We reproduce the
observable coercion rules as built-in-function compositions so they stay in
whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_string(col: Column, dtype: T.DataType) -> Column:
    """AsString coercion (value.go:361-426) for a typed column.

    - string → identity
    - bool → "true"/"false" (value.go:377-378 strconv.FormatBool)
    - int → decimal string
    - double → ES6 Number#toString approximation (value.go:392-395 /
      float64AsString, json-iterator ES6 rules): integral doubles within
      2^53 print without a trailing ".0"; others use Spark's shortest-
      round-trip rendering
    - bytes → base64 (value.go:385-386)
    - map/array/struct → JSON (value.go:381-390)
    """
    if isinstance(dtype, T.StringType):
        return col
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col.cast("string")
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        d = col.cast("double")
        integral = (d == F.floor(d)) & (F.abs(d) < F.lit(2.0 ** 53))
        return F.when(integral, d.cast("long").cast("string")).otherwise(d.cast("string"))
    if isinstance(dtype, T.BinaryType):
        return F.base64(col)
    if isinstance(dtype, (T.MapType, T.ArrayType, T.StructType)):
        return F.to_json(col)
    return col.cast("string")


# Log-record flags: uint32 bitfield, bit 0 = sampled
# (pdata/plog/log_record_flags.go:19-37)
LOG_RECORD_FLAG_SAMPLED = 1


def is_sampled(flags: Column) -> Column:
    return (flags.bitwiseAND(F.lit(LOG_RECORD_FLAG_SAMPLED))) != 0


def with_flag(flags: Column, flag: int, value: Column | bool) -> Column:
    """Set/clear a flag bit (WithIsSampled analog, log_record_flags.go:32-37)."""
    set_expr = flags.bitwiseOR(F.lit(flag))
    clear_expr = flags.bitwiseAND(F.lit(~flag & 0xFFFFFFFF))
    if isinstance(value, bool):
        return set_expr if value else clear_expr
    return F.when(value, set_expr).otherwise(clear_expr)
