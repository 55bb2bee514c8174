"""Multimodal binary-column plumbing tests (stubbed codec)."""

from __future__ import annotations

import hashlib

import pytest

from opentelemetry_collector_spark.operators.multimodal import (
    attach_blob,
    blob_meta_columnar,
    decode_image_meta,
    frame_sample,
)

DOCS = [(0, "hello world"), (1, "x" * 200), (2, "ünïcödé ✓")]


@pytest.fixture(scope="module")
def blobs(spark):
    return attach_blob(spark.createDataFrame(DOCS, ["doc_id", "text"]))


def test_blob_meta_columnar(blobs):
    rows = {r["doc_id"]: r for r in blob_meta_columnar(blobs).collect()}
    assert rows[0]["n_bytes"] == 11
    assert rows[2]["n_bytes"] == len(DOCS[2][1].encode("utf-8"))  # multi-byte
    assert rows[0]["sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_decode_stub_matches_columnar_meta(blobs):
    cols = {r["doc_id"]: r for r in blob_meta_columnar(blobs).collect()}
    dec = {r["doc_id"]: r for r in decode_image_meta(blobs, fake=True).collect()}
    for i in cols:
        assert dec[i]["n_bytes"] == cols[i]["n_bytes"]
        assert dec[i]["sha256"] == cols[i]["sha256"]
        assert 64 <= dec[i]["width"] <= 2048
        assert dec[i]["format"] in ("png", "jpeg", "webp")


def test_decode_stub_is_deterministic(blobs):
    a = sorted(map(tuple, decode_image_meta(blobs, fake=True).collect()))
    b = sorted(map(tuple, decode_image_meta(blobs, fake=True).collect()))
    assert a == b


def test_real_decode_raises_not_implemented(blobs):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as ei:
        decode_image_meta(blobs, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_frame_sample_fanout(blobs):
    rows = [r for r in frame_sample(blobs, every_n_bytes=64).collect()]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1  # 11 bytes → 1 frame
    assert len(by_doc[1]) == 4  # 200 bytes / 64 → 4 frames
    assert [f["frame_no"] for f in sorted(by_doc[1], key=lambda x: x["frame_no"])] == [0, 1, 2, 3]


def test_null_payloads_are_dropped_not_fatal(spark):
    """A NULL blob (e.g. encode of NULL text) must be dropped before the
    Arrow hop — bytes(None) inside the UDF would abort the whole job —
    and produce no frames."""
    from opentelemetry_collector_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(0, b"hello world"), (1, None)], "doc_id long, blob binary"
    )
    got = mm.decode_image_meta(df, fake=True).collect()
    assert [r["doc_id"] for r in got] == [0]
    frames = mm.frame_sample(df, every_n_bytes=4).collect()
    assert {r["doc_id"] for r in frames} == {0}
