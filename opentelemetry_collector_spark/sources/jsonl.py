"""JSONL (newline-delimited JSON) boundary — the universal interchange
format of LLM-corpus pipelines (one document object per line).

Reference analog: the OTLP/HTTP JSON receive/export boundary
(`receiver/otlpreceiver/otlp.go` accepts foreign JSON payloads;
`functions/otlp_json.py` is this repo's telemetry-shaped twin) — this is
the same marshal/unmarshal contract for the DOCUMENTS table shape.

Everything is columnar `to_json`/`from_json` (whole-stage codegen, zero
Python): serialization escapes embedded newlines/quotes/unicode inside
the JSON string, which is exactly what makes one-object-per-LINE framing
safe for arbitrary document text. File-level wrappers use Spark's text
writer/json reader so the on-disk artifact is plain `.jsonl` any tool
can consume.

Scale: both directions are narrow row-wise projections — no shuffle, no
driver involvement; file parallelism is the usual splittable-text-input
parallelism (JSONL splits on line boundaries, unlike multi-line JSON).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def to_jsonl(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One JSON object per row as a single ``value: string`` column —
    the exact shape ``df.write.text`` turns into a .jsonl file."""
    cols = cols or df.columns
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value")
    )


def from_jsonl(
    df: DataFrame, schema: str | StructType, value_col: str = "value"
) -> DataFrame:
    """Parse JSONL lines back into typed columns. PERMISSIVE by
    construction: a malformed line yields NULL fields and ``_ok =
    false`` with the raw line preserved in ``_raw`` — the
    foreign-payload contract (accept what parses, account for what
    doesn't; never throw mid-scan). Detection rides from_json's
    ``columnNameOfCorruptRecord`` channel: a PERMISSIVE parse returns an
    all-null struct (never a null struct) for bad input, so struct
    nullness alone cannot distinguish "malformed" from "all fields
    absent"."""
    if isinstance(schema, StructType):
        # copy, don't .add(): StructType.add mutates the caller's object
        # in place, so reusing one schema across calls would stack
        # duplicate _corrupt fields (and corrupt it for other uses)
        aug = StructType(list(schema.fields)).add("_corrupt", "string")
    else:
        aug = f"{schema}, _corrupt string"
    parsed = F.from_json(
        F.col(value_col),
        aug,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    out = df.select(
        F.col(value_col).alias("_raw"), parsed.alias("d")
    ).select("_raw", F.col("d._corrupt").isNull().alias("_ok"), "d.*")
    return out.drop("_corrupt")


def write_jsonl(df: DataFrame, path: str, cols: list[str] | None = None) -> None:
    """Write ``df`` as plain .jsonl text files (any tool can read them)."""
    to_jsonl(df, cols).write.mode("overwrite").text(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | StructType
) -> DataFrame:
    """Read .jsonl files through the same PERMISSIVE contract as
    :func:`from_jsonl` (via the text source, so framing is explicit)."""
    return from_jsonl(spark.read.text(path), schema)
