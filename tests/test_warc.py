"""WARC format ↔ pages: framing, determinism, strictness, byte identity."""

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.fixtures import synthesize_pages
from opentelemetry_collector_spark.operators.htmltext import extract_text
from opentelemetry_collector_spark.sources.warc import (
    _parse_blob,
    parse_warc,
    warc_chunks,
    warc_records,
)


def _roundtrip_frames(spark, n=200):
    pages = synthesize_pages(spark, n, partitions=4)
    chunks = warc_chunks(warc_records(pages), n_chunks=8)
    return pages, parse_warc(chunks)


def test_roundtrip_byte_identity(spark):
    """Every page's html survives format→chunk→parse byte-identically,
    and the recovered text equals the original text column."""
    pages, parsed = _roundtrip_frames(spark)
    joined = pages.alias("p").join(parsed.alias("w"), "url", "full")
    bad = joined.where(
        ~F.col("p.html").eqNullSafe(F.col("w.html"))
        | ~extract_text(F.col("w.html")).eqNullSafe(F.col("p.text"))
    ).count()
    assert bad == 0
    assert parsed.count() == pages.where(F.col("html").isNotNull()).count()


def test_record_framing(spark):
    pages = synthesize_pages(spark, 5, partitions=1)
    rec = warc_records(pages).select("record").first()["record"]
    b = bytes(rec)
    assert b.startswith(b"WARC/1.0\r\n")
    assert b.endswith(b"\r\n\r\n")
    (url, date, clen, payload) = _parse_blob(b)[0]
    assert url.startswith("http")
    assert len(payload) == clen
    assert date.endswith("Z")


def test_chunks_deterministic(spark):
    pages = synthesize_pages(spark, 120, partitions=4)

    def digest():
        return sorted(
            (r["chunk_id"], r["d"])
            for r in warc_chunks(warc_records(pages), n_chunks=4)
            .select("chunk_id", F.md5(F.col("warc")).alias("d"))
            .collect()
        )

    assert digest() == digest()


@pytest.mark.parametrize(
    "blob",
    [
        b"GZIP not a warc",
        b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort\r\n\r\n",  # truncated
        b"WARC/1.0\r\nContent-Length: 3\r\n\r\nabcXY",  # missing separator
    ],
)
def test_misframe_raises(blob):
    with pytest.raises(ValueError, match="misframe"):
        _parse_blob(blob)


def test_payload_may_contain_magic():
    """Content-Length framing, not delimiter splitting: a payload that
    embeds the record magic must parse as ONE record."""
    payload = b"<html>WARC/1.0\r\n\r\n</html>"
    blob = (
        b"WARC/1.0\r\nWARC-Target-URI: u\r\nWARC-Date: d\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    recs = _parse_blob(blob)
    assert len(recs) == 1 and recs[0][3] == payload


def test_empty_input(spark):
    pages = synthesize_pages(spark, 5, partitions=1).where(F.lit(False))
    assert parse_warc(warc_chunks(warc_records(pages))).count() == 0


def test_null_html_pages_emit_no_record(spark):
    pages = synthesize_pages(spark, 10, partitions=1).withColumn(
        "html", F.when(F.col("url").isNotNull(), F.lit(None).cast("binary"))
    )
    assert warc_records(pages).count() == 0


def test_oversized_shard_raises(spark):
    """A shard over max_shard_bytes must raise at assembly, not fail
    later inside the binary concat (2 GB JVM cell limit guard)."""
    pages = synthesize_pages(spark, 50, partitions=2)
    chunks = warc_chunks(
        warc_records(pages), n_chunks=1, max_shard_bytes=1024
    )
    with pytest.raises(Exception, match="max_shard_bytes"):
        chunks.collect()


def test_max_shard_bytes_over_jvm_limit_rejected(spark):
    pages = synthesize_pages(spark, 1, partitions=1)
    with pytest.raises(ValueError, match="2 GB"):
        warc_chunks(warc_records(pages), max_shard_bytes=3 << 30)


def test_derived_n_chunks_scales_with_corpus(spark):
    """n_chunks=None derives shard count from total bytes / target:
    more corpus bytes -> more shards, same target -> bounded shard size,
    and the roundtrip still recovers every page byte-identically."""
    pages = synthesize_pages(spark, 120, partitions=4)
    records = warc_records(pages)
    total = records.agg(F.sum(F.octet_length("record")).alias("b")).first()["b"]
    target = total // 6
    chunks = warc_chunks(
        records, None, target_shard_bytes=target, max_shard_bytes=total
    )
    got = chunks.select(
        "chunk_id", F.octet_length("warc").alias("b")
    ).collect()
    # ceil(total/target) ~ 6-7 shards requested; hash-assignment may leave
    # some empty, but the id space matches the derived count
    assert 2 <= len(got) <= 7
    assert all(0 <= r["chunk_id"] < 7 for r in got)
    assert parse_warc(chunks).count() == pages.count()


# ---------------------------------------------------------------------------
# WET (conversion records) + CDX capture index
# ---------------------------------------------------------------------------


def test_wet_record_framing(spark):
    from opentelemetry_collector_spark.sources.warc import wet_records

    pages = synthesize_pages(spark, 5, partitions=1)
    row = wet_records(pages).first()
    b = bytes(row["record"])
    url, date, clen, payload = _parse_blob(b)[0]
    assert url == row["url"] and date == row["warc_date"]
    text = pages.where(F.col("url") == row["url"]).first()["text"]
    assert payload == text.encode("utf-8") and clen == len(payload)
    assert b"WARC-Type: conversion\r\n" in b
    assert b"Content-Type: text/plain\r\n" in b


def test_cdx_offsets_address_real_bytes(spark):
    """The end-to-end CDX contract: for every index row, the shard file's
    bytes at [offset, offset+length) ARE that record — parseable on their
    own, with the indexed url/digest/timestamp."""
    import hashlib

    from opentelemetry_collector_spark.sources.warc import (
        cdx_index,
        cdx_shard_id,
        warc_chunks,
        wet_records,
    )

    pages = synthesize_pages(spark, 80, partitions=4)
    recs = wet_records(pages)
    idx = {r["url"]: r for r in cdx_index(recs, n_shards=4).collect()}
    shards = {
        r["chunk_id"]: bytes(r["warc"])
        for r in warc_chunks(
            recs.withColumn("shard", cdx_shard_id(F.col("url"), 4)),
            key_col="shard",
        ).collect()
    }
    assert len(idx) == 80 and len(shards) == 4
    for url, row in idx.items():
        shard_no = int(row["filename"].removeprefix("shard-").split(".")[0])
        blob = shards[shard_no]
        assert row["offset"] + row["length"] <= len(blob)
        slice_ = blob[row["offset"] : row["offset"] + row["length"]]
        (purl, pdate, clen, payload) = _parse_blob(slice_)[0]
        assert purl == url
        assert pdate.replace("-", "").replace(":", "").replace("T", "").replace(
            "Z", ""
        ) == row["cdx_ts"]
        assert hashlib.md5(payload).hexdigest() == row["digest"]
    # offsets tile each shard exactly: total indexed bytes == shard bytes
    for shard_no, blob in shards.items():
        rows = [r for r in idx.values() if r["filename"] == f"shard-{shard_no}.warc.wet"]
        assert sum(r["length"] for r in rows) == len(blob)
        assert sorted(r["offset"] for r in rows)[0] == 0


def test_cdx_urlkey_is_surt(spark):
    from opentelemetry_collector_spark.sources.warc import cdx_index, wet_records

    pages = synthesize_pages(spark, 3, partitions=1)
    for r in cdx_index(wet_records(pages), n_shards=2).collect():
        host = r["url"].split("/")[2]
        path = "/" + r["url"].split("/", 3)[3]
        expect = ",".join(reversed(host.split("."))) + ")" + path.lower()
        assert r["urlkey"] == expect


# ---------------------------------------------------------------------------
# WAT (metadata records): JSON payload, link extraction, CDX addressing
# ---------------------------------------------------------------------------


def _planted_link_pages(spark, n):
    """Pages whose html carries 1 + doc%3 anchors (one &amp;-escaped query
    each) so the WAT payload exercises real link extraction."""
    pages = synthesize_pages(spark, n, partitions=2)
    i = F.xxhash64("url") % 3 + F.lit(3)  # 3..5 anchors, deterministic per url
    anchors = F.array_join(
        F.transform(
            F.sequence(F.lit(1), i.cast("int")),
            lambda k: F.concat(
                F.lit('<p><a href="https://out'),
                k.cast("string"),
                F.lit('.example.org/x?a=1&amp;b=2">t</a></p>'),
            ),
        ),
        "",
    )
    return pages.withColumn(
        "html",
        F.encode(
            F.concat(F.lit("<html><body>"), anchors, F.lit("</body></html>")),
            "UTF-8",
        ),
    )


def test_wat_record_payload_and_links(spark):
    import json

    from opentelemetry_collector_spark.operators.htmltext import extract_links
    from opentelemetry_collector_spark.sources.warc import wat_records

    pages = _planted_link_pages(spark, 6)
    row = wat_records(pages).first()
    b = bytes(row["record"])
    url, date, clen, payload = _parse_blob(b)[0]
    assert url == row["url"] and date == row["warc_date"]
    assert clen == len(payload)
    assert b"WARC-Type: metadata\r\n" in b
    assert b"Content-Type: application/json\r\n" in b
    # Refers-To names the response record's id (md5 of the url)
    import hashlib

    assert (
        f"WARC-Refers-To: <urn:md5:{hashlib.md5(url.encode()).hexdigest()}>".encode()
        in b
    )
    meta = json.loads(payload)
    src = pages.where(F.col("url") == url).select(
        "text", extract_links(F.col("html")).alias("links")
    ).first()
    assert meta["url"] == url and meta["date"] == date
    assert meta["links"] == src["links"] and meta["n_links"] == len(src["links"])
    assert all("?a=1&b=2" in l for l in meta["links"])  # &amp; unescaped
    assert meta["text_digest"] == hashlib.md5(src["text"].encode()).hexdigest()
    assert meta["text_bytes"] == len(src["text"].encode())


def test_wat_cdx_offsets_tile_shards(spark):
    """WAT records address through cdx_index exactly like WET: every
    [offset, offset+length) slice of an assembled shard parses alone."""
    from opentelemetry_collector_spark.sources.warc import (
        cdx_index,
        cdx_shard_id,
        warc_chunks,
        wat_records,
    )

    recs = wat_records(_planted_link_pages(spark, 40))
    idx = cdx_index(recs, n_shards=3, shard_ext=".warc.wat").collect()
    shards = {
        r["chunk_id"]: bytes(r["warc"])
        for r in warc_chunks(
            recs.withColumn("shard", cdx_shard_id(F.col("url"), 3)),
            key_col="shard",
        ).collect()
    }
    assert len(idx) == 40
    for row in idx:
        assert row["filename"].endswith(".warc.wat")
        blob = shards[int(row["filename"].removeprefix("shard-").split(".")[0])]
        slice_ = blob[row["offset"] : row["offset"] + row["length"]]
        (purl, _, clen, payload) = _parse_blob(slice_)[0]
        assert purl == row["url"] and clen == len(payload)
    for shard_no, blob in shards.items():
        rows = [r for r in idx if r["filename"] == f"shard-{shard_no}.warc.wat"]
        assert sum(r["length"] for r in rows) == len(blob)


def test_parse_warc_ingests_wet_shards(spark):
    """The read side is family-agnostic: WET (conversion) shards parse
    through the same strict content-length framing, and the recovered
    payload IS the original text byte-identically."""
    from opentelemetry_collector_spark.sources.warc import (
        parse_warc,
        warc_chunks,
        wet_records,
    )

    pages = synthesize_pages(spark, 60, partitions=3)
    parsed = parse_warc(warc_chunks(wet_records(pages), n_chunks=4))
    joined = pages.alias("p").join(parsed.alias("w"), "url", "inner")
    bad = joined.where(
        F.decode(F.col("w.html"), "UTF-8") != F.col("p.text")
    ).count()
    assert bad == 0
    assert parsed.count() == pages.where(F.col("text").isNotNull()).count()


def test_wat_payload_survives_hostile_urls_and_links(spark):
    """WAT payloads must stay valid JSON when urls/hrefs carry quotes,
    backslashes, or raw control characters (hostile foreign HTML)."""
    import json
    from datetime import datetime

    from opentelemetry_collector_spark.sources.warc import wat_records

    hostile = [
        ('https://a.example.com/x?q="quoted"', '<a href="https://t/1?v=\\"x\\"">l</a>'),
        ("https://b.example.com/back\\slash", '<a href="https://t/2\\raw">l</a>'),
        ("https://c.example.com/tab", '<a href="https://t/3\tbell\x07">l</a>'),
    ]
    rows = spark.createDataFrame(
        [
            (u, datetime(2024, 1, 1, 0, 0, i), h.encode(), "text %d" % i)
            for i, (u, h) in enumerate(hostile)
        ],
        "url string, warc_ts timestamp, html binary, text string",
    )
    for r in wat_records(rows).collect():
        _, _, clen, payload = _parse_blob(bytes(r["record"]))[0]
        meta = json.loads(payload)  # must parse — that IS the contract
        assert meta["n_links"] == len(meta["links"]) == 1
        assert "\t" not in meta["links"][0] and "\x07" not in meta["links"][0]


def test_cdx_offsets_correct_for_duplicate_url_captures(spark):
    """Re-captures of the SAME url (the case a capture index exists for)
    must still address real bytes: the offset window's tie-break has to
    match the writer's sort_array(struct(url, record)) byte order, or a
    range fetch returns the other capture's bytes."""
    import hashlib

    from opentelemetry_collector_spark.sources.warc import (
        cdx_index,
        cdx_shard_id,
        warc_chunks,
        wet_records,
    )

    import datetime as _dt

    url = "https://dup.example.com/page"
    pages = spark.createDataFrame(
        [
            (url, _dt.datetime(2024, 1, 1), "first capture body"),
            (url, _dt.datetime(2024, 2, 1), "second capture rather longer body"),
            (url, _dt.datetime(2024, 3, 1), "third"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    recs = wet_records(pages)
    rows = cdx_index(recs, n_shards=1).collect()
    assert len(rows) == 3 and len({r["offset"] for r in rows}) == 3
    blob = bytes(
        warc_chunks(
            recs.withColumn("shard", cdx_shard_id(F.col("url"), 1)),
            key_col="shard",
        ).collect()[0]["warc"]
    )
    for row in rows:
        slice_ = blob[row["offset"] : row["offset"] + row["length"]]
        (purl, pdate, _clen, payload) = _parse_blob(slice_)[0]
        assert purl == url
        assert hashlib.md5(payload).hexdigest() == row["digest"]
    assert sum(r["length"] for r in rows) == len(blob)
