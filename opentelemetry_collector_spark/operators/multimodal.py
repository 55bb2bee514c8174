"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with a typed
metadata struct — the same shape as the reference's bytes-valued
``pcommon.Value`` (pdata/pcommon/value.go:31-40, ValueTypeBytes) with
attributes alongside. The Spark-side plumbing (schemas, Arrow batch
shapes, partitioning) is real and tested; the actual codec step is stubbed
because image/audio libraries are not in this container:

- ``decode_image_meta(..., fake=True)`` derives deterministic fake
  width/height/format from the payload bytes (md5-seeded) so downstream
  logic and tests are exact;
- ``fake=False`` raises NotImplementedError inside the UDF, marking where
  PIL/libav decode plugs in.

The UDF boundary follows SURVEY.md §4 item 3: project only the columns the
decoder needs before ``mapInPandas`` (manual pruning around the opaque
boundary) and keep batches Arrow-sized.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

_FORMATS = ("png", "jpeg", "webp")


def attach_blob(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payload column (UTF-8 bytes of text) — the
    fixture for binary-column plumbing; at ingest time this is the raw
    image/audio payload read from WARC."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("blob"))


def blob_meta_columnar(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Codec-free metadata, pure built-ins: byte length + sha256 digest."""
    return blobs.select(
        F.col(id_col),
        F.length(F.col("blob")).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col("blob"), 256)).alias("sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake image header decode (md5-seeded)."""
    h = hashlib.md5(payload).digest()
    width = 64 + (h[0] | (h[1] << 8)) % 1985  # 64..2048
    height = 64 + (h[2] | (h[3] << 8)) % 1985
    return width, height, _FORMATS[h[4] % len(_FORMATS)]


def decode_image_meta(
    blobs: DataFrame, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Arrow-batched decode of binary payloads into typed metadata.

    The Spark-side contract (input pruning, Arrow batch iteration, output
    schema) is production-shaped; only the codec call is stubbed. With
    ``fake=False`` the UDF raises NotImplementedError — replace
    ``_fake_decode`` with PIL/pyav there.

    NULL payloads are dropped before the Arrow hop (there is nothing to
    decode, and ``bytes(None)`` inside the UDF would abort the job).
    """
    pruned = blobs.select(F.col(id_col).alias("doc_id"), "blob").where(
        F.col("blob").isNotNull()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/pyav — not in this container"
                )
            metas = [_fake_decode(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["blob"].map(len).astype("int64"),
                    "sha256": [hashlib.sha256(bytes(b)).hexdigest() for b in pdf["blob"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return pruned.mapInPandas(run, schema=BLOB_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def frame_sample(
    blobs: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing: 1 output row per sampled "frame" (stubbed
    as fixed-stride byte windows). Demonstrates the 1→N Arrow fan-out shape
    a video frame sampler uses; a real implementation decodes containers.
    NULL payloads are dropped (no container, no frames).
    """
    pruned = blobs.select(F.col(id_col).alias("doc_id"), "blob").where(
        F.col("blob").isNotNull()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, str]] = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                payload = bytes(blob)
                for i, off in enumerate(range(0, max(len(payload), 1), every_n_bytes)):
                    chunk = payload[off : off + every_n_bytes]
                    rows.append((int(did), i, hashlib.sha256(chunk).hexdigest()))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_sha256"])

    return pruned.mapInPandas(run, schema=FRAME_SCHEMA)
