"""pcommon.Value / flags analogs as columnar expressions.

The reference's open variant type (pdata/pcommon/value.go:31-40) has a
canonical string form AsString (value.go:361-426): JSON for map/slice,
base64 for bytes, ES6-style number formatting for doubles. We reproduce the
observable coercion rules as built-in-function compositions so they stay in
whole-stage codegen — no UDF.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def es6_float_str(f: float) -> str:
    """Go encoding/json's ES6 float rendering, exactly
    (pdata/pcommon/value.go:398-426 float64AsString):

    - NaN/±Inf → ``json: unsupported value: <g-format>``;
    - |f| in [1e-6, 1e21) (or 0) → shortest round-trip decimal, no
      exponent, no trailing ".0" (``3`` not ``3.0``; ``-0`` keeps its
      sign like Go json);
    - otherwise shortest mantissa + ``e±XX`` with the single leading
      exponent zero stripped on negative exponents (``1e-7``, ``1e+21``).

    Shortest round-trip digits are identical across Go and CPython (both
    emit the unique minimal decimal that round-trips), so this is
    byte-parity, not approximation.
    """
    if math.isnan(f) or math.isinf(f):
        g = "NaN" if math.isnan(f) else ("+Inf" if f > 0 else "-Inf")
        return f"json: unsupported value: {g}"
    a = abs(f)
    if a != 0 and (a < 1e-6 or a >= 1e21):
        mant, exp = repr(f).split("e")  # repr is exponent-form in this range
        sign, digits = exp[0], exp[1:]
        if sign == "-":
            digits = digits.lstrip("0") or "0"  # e-07 → e-7 cleanup
        return f"{mant}e{sign}{digits}"
    s = format(Decimal(repr(f)), "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


_ES6_UDF = None


def es6_double_col(col: Column) -> Column:
    """Arrow-batched ``es6_float_str`` over a double column — the ONE
    documented Python hop in the repo's text boundary (golden rendering /
    AsString of doubles). Never on a hot scan path: shortest-round-trip
    formatting has no Spark built-in, and byte parity with the reference's
    golden files beats codegen here. SQL NULL stays NULL (masked at the
    Column level — Arrow folds double nulls into NaN inside the UDF, so
    nullity must be decided before the hop; ADVICE r2); genuine NaN/±Inf
    render as the Go-json unsupported-value string."""
    global _ES6_UDF
    if _ES6_UDF is None:

        @F.pandas_udf("string")
        def _fmt(s: pd.Series) -> pd.Series:
            return s.map(lambda x: es6_float_str(float(x)))

        _ES6_UDF = _fmt
    c = col.cast("double")
    return F.when(c.isNotNull(), _ES6_UDF(c))


def as_string(col: Column, dtype: T.DataType) -> Column:
    """AsString coercion (value.go:361-426) for a typed column.

    - string → identity
    - bool → "true"/"false" (value.go:377-378 strconv.FormatBool)
    - int → decimal string
    - double → exact ES6 Number#toString (value.go:392-395 /
      float64AsString) via ``es6_double_col`` — text-boundary only
    - bytes → base64 (value.go:385-386)
    - map/array/struct → JSON (value.go:381-390)
    """
    if isinstance(dtype, T.StringType):
        return col
    if isinstance(dtype, T.BooleanType):
        # two .when()s, not .otherwise(): NULL must stay NULL like every
        # other branch, not become a fabricated "false"
        return F.when(col, F.lit("true")).when(~col, F.lit("false"))
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col.cast("string")
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return es6_double_col(col)
    if isinstance(dtype, T.BinaryType):
        return F.base64(col)
    if isinstance(dtype, (T.MapType, T.ArrayType, T.StructType)):
        return F.to_json(col)
    return col.cast("string")


def ns_to_micros(col: Column) -> Column:
    """uint64-ns epoch → µs with INTEGER division (SQL ``div``).

    Ns epochs (~1.7e18) exceed 2^53, so double-precision ``/ 1000`` can be
    off by 1 µs after truncation — which would break the documented
    lossless round-trip (pdata Timestamp is uint64 ns,
    pdata/pcommon/timestamp.go:21-24) and golden-text byte parity.

    try_cast, not cast: unmarshal paths feed proto3 uint64 strings here,
    and a foreign value above int64 max must null-fill the timestamp
    (like every other unmarshal field), not abort the ANSI cast.
    """
    return F.call_function("div", col.try_cast("long"), F.lit(1000))


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
