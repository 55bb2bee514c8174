"""WARC (ISO 28500) record format ↔ pages: the Common-Crawl-native
ingest boundary.

The north-star input is "Common-Crawl-style web pages" — and Common
Crawl's wire format is WARC: a stream of ``WARC/1.0`` records, each a
CRLF header block (``WARC-Target-URI``, ``WARC-Date``,
``Content-Length``…) followed by exactly ``Content-Length`` payload
bytes and a blank-line separator. This module is both directions:

- **format** (:func:`warc_records` → :func:`warc_chunks`): build one
  response record per page with pure JVM codegen expressions (header
  concat + payload append — scan speed, zero Python), then assemble
  records into chunk files with ONE shuffle (hash of url → chunk id,
  deterministic within-chunk order). At 100 TB this is the writer side:
  chunk id doubles as the output-file partitioning, so shard count and
  shard size are knobs, not emergent behavior.
- **parse** (:func:`parse_warc`): a content-length-driven streaming
  parser over Arrow batches (``mapInPandas``). Record framing is
  inherently SEQUENTIAL within a file — each record's start is known
  only after the previous record's ``Content-Length`` — so this is a
  declared Arrow surface, exactly like every real WARC reader.
  Parallelism comes from the file level: Common Crawl ships ~10^5
  ~1 GB WARC files per crawl, so at cluster scale the unit of work is
  the file and the parser's per-record Python loop touches KB-sized
  slices, not bytes. The parser is strict: a record that misframes
  (bad magic, truncated payload, missing separator) raises instead of
  resynchronizing silently — corrupt shards must surface, not shrink.

Reference analog: the receiver decode boundary
(receiver/otlpreceiver/internal/logs/otlp.go:43-55) — wire payload in,
typed rows out, without losing a byte. The per-row invariant is the
input_hint's: the full chain text → html → WARC → parse → extract is
byte-identical per url (oracle ``warc_roundtrip``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CRLF = "\r\n"
_MAGIC = b"WARC/1.0\r\n"

# parse_warc output: one row per record
WARC_RECORD_SCHEMA = (
    "url string, warc_date string, content_length long, html binary"
)


def _clean_header_value(col: Column) -> Column:
    """CR/LF cannot appear inside a header value (header injection would
    corrupt the framing); strip them rather than emit a broken record."""
    return F.replace(
        F.replace(col, F.lit("\r"), F.lit("")), F.lit("\n"), F.lit("")
    )


def warc_records(pages: DataFrame) -> DataFrame:
    """pages ``(url, warc_ts, html, …)`` → one WARC response record per
    page as ``(url, record: binary)``.

    Pure columnar: header text concat, UTF-8 encode, binary append of the
    payload. ``Content-Length`` is the payload's exact byte length;
    ``WARC-Record-ID`` is a deterministic md5-derived URN so re-running
    the writer reproduces identical bytes. Pages with NULL html carry no
    response payload and emit no record (filtered, not nulled).
    """
    url = _clean_header_value(F.col("url"))
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"), F.md5(url), F.lit(">" + _CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(F.col("html")).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    record = F.concat(
        F.encode(header, "UTF-8"), F.col("html"), F.encode(F.lit(_CRLF + _CRLF), "UTF-8")
    )
    return pages.where(F.col("html").isNotNull()).select(
        F.col("url"), record.alias("record")
    )


def wet_records(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages → one WARC **conversion** record per page — the WET
    (extracted-text) companion artifact Common Crawl publishes next to
    every WARC: same ISO 28500 framing, ``WARC-Type: conversion``,
    ``Content-Type: text/plain``, payload = the UTF-8 extracted text.

    Output ``(url, warc_date, digest, record)``: ``digest`` is the md5
    of the payload bytes (the CDX index column; Common Crawl uses
    SHA1-B32 — same role, documented difference) and ``warc_date`` the
    rendered header timestamp, both carried alongside so the CDX
    builder (:func:`cdx_index`) never re-parses its own header bytes.

    Unlike the response records, every header byte here is arithmetic
    over (url, timestamp, payload length) — no hash-sized pad — so an
    independent engine can replay record SIZES exactly; the oracle
    value-checks CDX offsets against that replay.

    Pure columnar concat/encode — scan speed, zero Python.
    """
    url = _clean_header_value(F.col("url"))
    wdate = F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    payload = F.encode(F.col(text_col), "UTF-8")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), wdate, F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"), F.md5(url), F.lit(">" + _CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    record = F.concat(
        F.encode(header, "UTF-8"), payload, F.encode(F.lit(_CRLF + _CRLF), "UTF-8")
    )
    return pages.where(F.col(text_col).isNotNull()).select(
        F.col("url"),
        wdate.alias("warc_date"),
        F.md5(payload).alias("digest"),
        record.alias("record"),
    )


def _json_esc(col: Column) -> Column:
    """JSON string escape for values embedded in the WAT payload:
    backslash then quote escaped, then every remaining C0 control
    stripped (RFC 8259 forbids raw controls inside a JSON string, and a
    hostile href CAN carry a tab/BEL — urls legally cannot, so dropping
    beats emitting an unparseable payload). Order matters: the strip
    runs last so an escaped pair is never re-split."""
    esc = F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )
    return F.regexp_replace(esc, "[\\x00-\\x1f]", "")


def wat_records(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages → one WARC **metadata** record per page — the WAT companion
    artifact (Common Crawl's third shard family, next to WARC + WET):
    ISO 28500 framing, ``WARC-Type: metadata``, ``Content-Type:
    application/json``, ``WARC-Refers-To`` naming the response record,
    payload = one JSON object of per-page metadata.

    The JSON payload is built by EXPLICIT string concatenation (never
    ``to_json``) so its bytes are pure arithmetic over the page row —
    an independent engine can replay payload bytes, record sizes, and
    therefore CDX offsets exactly. Fields::

        {"url": .., "date": .., "text_digest": md5(text bytes),
         "text_bytes": N, "n_links": K, "links": [..]}

    ``links`` is the REAL link-graph extraction boundary
    (:func:`operators.htmltext.extract_links` over the html column —
    anchor hrefs in document order, ``&amp;``-unescaped), which is what
    makes WAT the input to the url/pagerank side of the engine without
    re-scanning page bodies.

    Output shape matches :func:`wet_records` — ``(url, warc_date,
    digest, record)`` with ``digest`` = md5 of the payload bytes — so
    :func:`cdx_index` and :func:`warc_chunks` apply unchanged.

    Pure columnar concat/encode + one vectorized regexp extract — scan
    speed, zero Python, zero shuffle.
    """
    from ..operators.htmltext import extract_links

    url = _clean_header_value(F.col("url"))
    wdate = F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    text_bytes = F.encode(F.col(text_col), "UTF-8")
    links = extract_links(F.col("html"))
    payload = F.encode(
        F.concat(
            F.lit('{"url":"'), _json_esc(url),
            F.lit('","date":"'), wdate,
            F.lit('","text_digest":"'), F.md5(text_bytes),
            F.lit('","text_bytes":'), F.octet_length(text_bytes).cast("string"),
            F.lit(',"n_links":'), F.size(links).cast("string"),
            F.lit(',"links":['),
            F.array_join(
                F.transform(
                    links, lambda u: F.concat(F.lit('"'), _json_esc(u), F.lit('"'))
                ),
                ",",
            ),
            F.lit("]}"),
        ),
        "UTF-8",
    )
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: metadata" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), wdate, F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(url, F.lit("#wat"))),
        F.lit(">" + _CRLF),
        F.lit("WARC-Refers-To: <urn:md5:"), F.md5(url), F.lit(">" + _CRLF),
        F.lit("Content-Type: application/json" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    record = F.concat(
        F.encode(header, "UTF-8"), payload, F.encode(F.lit(_CRLF + _CRLF), "UTF-8")
    )
    return pages.where(
        F.col(text_col).isNotNull() & F.col("html").isNotNull()
    ).select(
        F.col("url"),
        wdate.alias("warc_date"),
        F.md5(payload).alias("digest"),
        record.alias("record"),
    )


def cdx_shard_id(url: Column, n_shards: int) -> Column:
    """Deterministic shard assignment for the CDX/WET writer: the 60-bit
    integer bridge of the url's md5 (``operators/dedup.md5_long`` form —
    replayable in any engine, unlike xxhash64) modulo the shard count.
    Uniform by construction: the key is the full-url hash, so hot hosts
    cannot skew a shard."""
    return (
        F.conv(F.substring(F.md5(url), 18, 15), 16, 10).cast("long")
        % F.lit(n_shards)
    ).cast("int")


def cdx_index(
    records: DataFrame,
    n_shards: int = 8,
    *,
    shard_prefix: str = "shard-",
    shard_ext: str = ".warc.wet",
) -> DataFrame:
    """WET/WARC records → the CDX capture index: one row per record with
    ``(urlkey, cdx_ts, url, digest, length, offset, filename)`` — the
    metadata Common Crawl ships as its CDXJ index so a reader can fetch
    ONE record by HTTP range request instead of scanning a shard.

    Layout contract (shared with :func:`warc_chunks` via
    ``key_col='shard'``): records land in shard ``cdx_shard_id(url,
    n_shards)`` ordered by url within the shard, so

    - ``offset`` = sum of the byte lengths of every earlier record in
      the shard — ONE window aggregate over the same key the writer
      shuffles on (at scale the exchange is reused, not repeated);
    - ``length`` = this record's exact byte length (from the real
      record bytes, not re-derived);
    - ``urlkey`` = the SURT sort key (:func:`operators.urls.surt_key`);
    - ``cdx_ts`` = the 14-digit ``yyyyMMddHHmmss`` capture timestamp.

    The index is metadata-sized (one short row per record — ~10^-4 of
    corpus bytes), so downstream sorts/joins on it are free relative to
    the corpus scan.
    """
    from ..operators.urls import surt_key

    from pyspark.sql.window import Window

    shard = cdx_shard_id(F.col("url"), n_shards)
    sized = records.select(
        surt_key(F.col("url")).alias("urlkey"),
        F.regexp_replace(F.col("warc_date"), "[^0-9]", "").alias("cdx_ts"),
        "url",
        "digest",
        F.octet_length(F.col("record")).cast("long").alias("length"),
        shard.alias("__shard"),
        # tie-break column: duplicate-URL captures (re-crawls — the case
        # a capture index exists for) land in the same shard, and the
        # writer's sort_array(struct(url, record)) breaks url ties on
        # the record BYTES — the offset window must order identically or
        # a range fetch returns the other capture's bytes
        F.col("record").alias("__rec"),
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy("url", "__rec")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sized.select(
        "urlkey",
        "cdx_ts",
        "url",
        "digest",
        "length",
        F.coalesce(F.sum("length").over(w), F.lit(0)).cast("long").alias("offset"),
        F.concat(
            F.lit(shard_prefix), F.col("__shard").cast("string"), F.lit(shard_ext)
        ).alias("filename"),
    )


def warc_chunks(
    records: DataFrame,
    n_chunks: int | None = 32,
    *,
    target_shard_bytes: int = 256 << 20,
    max_shard_bytes: int = 1 << 30,
    key_col: str | None = None,
) -> DataFrame:
    """records → ``(chunk_id, warc: binary)`` chunk files.

    ONE shuffle: url-hash → chunk id (uniform by construction — no hot
    hosts since the key is the full url hash), records ordered by url
    within a chunk so chunk bytes are deterministic, then a binary fold
    concatenates them. ``n_chunks`` is the shard-count knob; pass
    ``n_chunks=None`` to derive it from the corpus —
    ``ceil(total_record_bytes / target_shard_bytes)`` via one
    column-pruned aggregate pre-pass (the scan reads only the record
    length, and at real scale the writer would take total bytes from
    table metadata instead).

    Each shard is materialized as ONE binary cell, so shard size is
    bounded by the JVM's 2 GB array limit. ``max_shard_bytes`` guards
    that limit at runtime: the per-chunk byte total rides the same
    aggregate as the fold (no extra shuffle), and an over-budget shard
    raises instead of failing later with an opaque OOM/negative-length
    error deep inside the concat — corrupt knobs surface, they do not
    half-write.

    ``key_col`` overrides the xxhash64 assignment with a caller-provided
    shard column — the CDX writer path passes :func:`cdx_shard_id` here
    so the assembled shard bytes and the index offsets share one layout
    by construction (within-shard order is by url in both).
    """
    if max_shard_bytes > ((2 << 30) - 64):
        raise ValueError(
            "max_shard_bytes must stay under the JVM 2 GB single-cell limit"
        )
    if n_chunks is None:
        total = records.agg(
            F.sum(F.octet_length("record")).alias("b")
        ).first()["b"] or 0
        n_chunks = max(1, -(-total // target_shard_bytes))
    chunk_key = (
        F.col(key_col).cast("int")
        if key_col is not None
        else F.pmod(F.xxhash64(F.col("url")), F.lit(n_chunks)).cast("int")
    )
    assembled = (
        records.select(
            chunk_key.alias("chunk_id"),
            F.struct(F.col("url"), F.col("record")).alias("it"),
        )
        .groupBy("chunk_id")
        .agg(
            F.sum(F.octet_length(F.col("it").getField("record"))).alias("__nbytes"),
            F.aggregate(
                F.sort_array(F.collect_list("it")),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["record"]),
            ).alias("__warc"),
        )
    )
    return assembled.select(
        "chunk_id",
        F.when(F.col("__nbytes") <= F.lit(max_shard_bytes), F.col("__warc"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("warc_chunks: shard "),
                    F.col("chunk_id").cast("string"),
                    F.lit(" would be "),
                    F.col("__nbytes").cast("string"),
                    F.lit(f" bytes > max_shard_bytes={max_shard_bytes}"),
                )
            )
        )
        .alias("warc"),
    )


def _parse_blob(b: bytes) -> list[tuple[str, str, int, bytes]]:
    """Sequential content-length framing of one WARC chunk. Strict: any
    misframe raises (corrupt shards surface; they do not shrink)."""
    out: list[tuple[str, str, int, bytes]] = []
    off, n = 0, len(b)
    while off < n:
        if not b.startswith(_MAGIC, off):
            raise ValueError(f"WARC misframe at byte {off}: bad magic")
        hdr_end = b.find(b"\r\n\r\n", off)
        if hdr_end < 0:
            raise ValueError(f"WARC misframe at byte {off}: unterminated header")
        headers: dict[str, str] = {}
        for line in b[off + len(_MAGIC) : hdr_end].decode("utf-8").split(_CRLF):
            key, _, val = line.partition(": ")
            headers[key] = val
        clen = int(headers["Content-Length"])
        start = hdr_end + 4
        payload = b[start : start + clen]
        if len(payload) != clen:
            raise ValueError(f"WARC misframe at byte {off}: truncated payload")
        if b[start + clen : start + clen + 4] != b"\r\n\r\n":
            raise ValueError(f"WARC misframe at byte {off}: missing separator")
        out.append(
            (headers["WARC-Target-URI"], headers["WARC-Date"], clen, payload)
        )
        off = start + clen + 4
    return out


def parse_warc(chunks: DataFrame, blob_col: str = "warc") -> DataFrame:
    """chunk files → one row per WARC record ``(url, warc_date,
    content_length, html)``. Arrow surface (see module docstring: record
    framing is sequential within a file by construction of the format).
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls: list[str] = []
            dates: list[str] = []
            lens: list[int] = []
            payloads: list[bytes] = []
            for blob in pdf[blob_col]:
                for url, date, clen, payload in _parse_blob(bytes(blob)):
                    urls.append(url)
                    dates.append(date)
                    lens.append(clen)
                    payloads.append(payload)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_date": pd.Series(dates, dtype="object"),
                    "content_length": pd.Series(lens, dtype="int64"),
                    "html": pd.Series(payloads, dtype="object"),
                }
            )

    return chunks.mapInPandas(run, schema=WARC_RECORD_SCHEMA)
