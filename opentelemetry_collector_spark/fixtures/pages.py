"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1-2).

The testdata analog of the reference's deterministic generators
(internal/testdata/log.go:28-42 GenerateLogs — fixed timestamps/attrs so
golden outputs are stable). Every field is a pure function of the row id
(splitmix64 counter hashing), so:

- the same row id yields byte-identical content at any scale factor,
- generation is embarrassingly parallel: ``synthesize_pages`` runs the
  chunk generator inside ``mapInPandas`` over ``spark.range(n)``, so a
  10^12-row table is produced by the cluster, never the driver.

Embedded log-line grammar (FIXTURES.md §2):
  60% access   {ip} - - [{dd/Mon/yyyy:HH:mm:ss +0000}] "{GET|POST} {path} HTTP/1.1" {status} {bytes}
  25% applog   {ISO8601} {LEVEL} [{component}] {message} trace_id={32hex} span_id={16hex}
  10% kv       key1=val1 key2="quoted val" status={int}
   5% noise    free text (severity-less fall-through)
Every 13th row ends with a multi-byte UTF-8 noise line; every 97th row has
empty text.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

SEED = 42
N_HOSTS = 1000
ZIPF_S = 1.2  # top host ~20% of rows — exercises salting
BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

_LANGS = np.array(["en", "de", "fr", "es", "zh", "ja", ""], dtype=object)
_LEVELS = np.array(
    ["TRACE", "DEBUG", "INFO", "INFO", "INFO", "WARN", "WARN", "ERROR", "ERROR", "FATAL"],
    dtype=object,
)
_STATUS = np.array([200, 200, 200, 200, 200, 200, 301, 302, 304, 400, 403, 404, 404, 500, 502, 503])
_METHODS = np.array(["GET", "GET", "GET", "POST"], dtype=object)
_MONTHS = np.array(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"],
    dtype=object,
)
_UNICODE_TAIL = "многоязычный журнал 日誌テキスト — ünïcödé ✓ 中文记录"


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized counter-based hash (public domain)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _host_table() -> np.ndarray:
    return np.array([f"host{i:04d}.example.com" for i in range(N_HOSTS)], dtype=object)


_HOSTS = _host_table()
# Zipf inverse-CDF over ranks 1..N_HOSTS
_zw = 1.0 / np.power(np.arange(1, N_HOSTS + 1, dtype=np.float64), ZIPF_S)
_ZCDF = np.cumsum(_zw / _zw.sum())


def _zipf_host_idx(h: np.ndarray) -> np.ndarray:
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return np.searchsorted(_ZCDF, u, side="left").clip(0, N_HOSTS - 1)


def _two_digit(a: np.ndarray) -> np.ndarray:
    return np.char.zfill(a.astype("U2"), 2).astype(object)


def _fmt_clf(sec: np.ndarray) -> np.ndarray:
    """dd/Mon/yyyy:HH:mm:ss +0000 from epoch seconds (vectorized, Jan 2024 era)."""
    days = sec // 86400
    rem = sec % 86400
    # date from days since 2024-01-01 via numpy datetime arithmetic
    d = (np.datetime64("2024-01-01") + days.astype("timedelta64[D]")).astype("datetime64[D]")
    y = d.astype("datetime64[Y]").astype(int) + 1970
    m = d.astype("datetime64[M]").astype(int) % 12
    dom = (d - d.astype("datetime64[M]").astype("datetime64[D]")).astype(int) + 1
    hh, mm, ss = rem // 3600, (rem % 3600) // 60, rem % 60
    return (
        _two_digit(dom) + "/" + _MONTHS[m] + "/" + y.astype("U4").astype(object)
        + ":" + _two_digit(hh) + ":" + _two_digit(mm) + ":" + _two_digit(ss) + " +0000"
    )


def _fmt_iso(sec: np.ndarray) -> np.ndarray:
    """ISO8601 `YYYY-MM-DDTHH:MM:SSZ` from epoch seconds (vectorized)."""
    days = sec // 86400
    rem = sec % 86400
    d = (np.datetime64("2024-01-01") + days.astype("timedelta64[D]")).astype("datetime64[D]")
    datestr = np.datetime_as_string(d, unit="D").astype(object)
    hh, mm, ss = rem // 3600, (rem % 3600) // 60, rem % 60
    return datestr + "T" + _two_digit(hh) + ":" + _two_digit(mm) + ":" + _two_digit(ss) + "Z"


def _hex(h: np.ndarray, width: int) -> np.ndarray:
    out = np.empty(len(h), dtype=object)
    for i, v in enumerate(h):  # hex of uint64; widths 16 only
        out[i] = format(int(v), f"0{width}x")
    return out


def _hex16(h: np.ndarray) -> np.ndarray:
    # vectorized 16-hex via char ops would be overkill; frompyfunc is fine
    # (generation path only — never in the query hot path)
    return np.frompyfunc(lambda v: format(int(v), "016x"), 1, 1)(h).astype(object)


def _lines_for_pages(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (page_idx, line_no, line_text) for all lines of the given ids."""
    h0 = _mix64(ids * np.uint64(0x10001) + np.uint64(SEED))
    n_lines = (h0 % np.uint64(40)).astype(np.int64) + 1
    n_lines[ids % 97 == 0] = 0  # empty-text rows

    page_idx = np.repeat(np.arange(len(ids)), n_lines)
    line_no = np.concatenate([np.arange(n) for n in n_lines]) if len(page_idx) else np.array([], dtype=np.int64)
    pid = ids[page_idx]
    hl = _mix64(pid * np.uint64(1_000_003) + line_no.astype(np.uint64) * np.uint64(7919) + np.uint64(SEED))

    kind = hl % np.uint64(100)  # <60 access, <85 applog, <95 kv, else noise
    sec = (hl >> np.uint64(7)) % np.uint64(30 * 86400) + np.uint64(BASE_EPOCH - BASE_EPOCH)
    sec = sec.astype(np.int64)

    out = np.empty(len(pid), dtype=object)

    acc = kind < 60
    if acc.any():
        hA = hl[acc]
        ip = (
            ((hA >> np.uint64(0)) % np.uint64(223) + np.uint64(1)).astype("U3").astype(object) + "."
            + ((hA >> np.uint64(8)) % np.uint64(256)).astype("U3").astype(object) + "."
            + ((hA >> np.uint64(16)) % np.uint64(256)).astype("U3").astype(object) + "."
            + ((hA >> np.uint64(24)) % np.uint64(256)).astype("U3").astype(object)
        )
        method = _METHODS[(hA >> np.uint64(32)) % np.uint64(4)]
        path = "/r/" + ((hA >> np.uint64(34)) % np.uint64(1000)).astype("U4").astype(object)
        status = _STATUS[((hA >> np.uint64(44)) % np.uint64(len(_STATUS))).astype(np.int64)]
        nbytes = (hA >> np.uint64(13)) % np.uint64(100000)
        out[acc] = (
            ip + " - - [" + _fmt_clf(sec[acc]) + '] "' + method + " " + path
            + ' HTTP/1.1" ' + status.astype("U3").astype(object) + " "
            + nbytes.astype("U6").astype(object)
        )

    app = (kind >= 60) & (kind < 85)
    if app.any():
        hA = hl[app]
        level = _LEVELS[(hA >> np.uint64(32)) % np.uint64(len(_LEVELS))]
        comp = "comp-" + ((hA >> np.uint64(36)) % np.uint64(20)).astype("U2").astype(object)
        msg = "operation completed code=" + ((hA >> np.uint64(40)) % np.uint64(500)).astype("U3").astype(object)
        tid = _hex16(hA * np.uint64(3)) + _hex16(hA * np.uint64(5))
        sid = _hex16(hA * np.uint64(7))
        out[app] = (
            _fmt_iso(sec[app]) + " " + level + " [" + comp + "] " + msg
            + " trace_id=" + tid + " span_id=" + sid
        )

    kv = (kind >= 85) & (kind < 95)
    if kv.any():
        hA = hl[kv]
        out[kv] = (
            "key1=val" + (hA % np.uint64(100)).astype("U3").astype(object)
            + ' key2="quoted val ' + ((hA >> np.uint64(8)) % np.uint64(100)).astype("U3").astype(object)
            + '" status=' + ((hA >> np.uint64(16)) % np.uint64(600)).astype("U3").astype(object)
        )

    noi = kind >= 95
    if noi.any():
        hA = hl[noi]
        out[noi] = (
            "free text noise lorem ipsum dolor " + (hA % np.uint64(10000)).astype("U5").astype(object)
        )

    # multi-byte UTF-8 rows: every 13th row's LAST line gets a unicode tail
    is_last = np.zeros(len(pid), dtype=bool)
    if len(pid):
        ends = np.cumsum(n_lines[n_lines > 0]) - 1
        is_last[ends] = True
    mb = is_last & (pid % 13 == 0)
    if mb.any():
        out[mb] = out[mb] + " " + _UNICODE_TAIL

    return page_idx, line_no, out


def generate_pages_pandas(ids: np.ndarray) -> pd.DataFrame:
    """Pure chunk generator: row ids → pages DataFrame (deterministic)."""
    ids = np.asarray(ids, dtype=np.uint64)
    h = _mix64(ids + np.uint64(SEED))
    host_idx = _zipf_host_idx(h)
    hosts = _HOSTS[host_idx]
    urls = "https://" + hosts + "/p/" + ids.astype("U12").astype(object)
    warc_ts = BASE_TS + ids.astype("timedelta64[s]").astype("timedelta64[us]")
    lang = _LANGS[_mix64(host_idx.astype(np.uint64) + np.uint64(777)) % np.uint64(len(_LANGS))]

    page_idx, _, lines = _lines_for_pages(ids)
    texts = np.full(len(ids), "", dtype=object)
    if len(page_idx):
        s = pd.Series(lines).groupby(page_idx).agg("\n".join)
        texts[s.index.to_numpy()] = s.to_numpy()

    # entity-escape the body (& first) so operators.htmltext.extract_text
    # can invert the envelope byte-identically for ANY body content —
    # the input_hint's per-row invariant
    def _esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&#39;")
        )

    pad_n = (h >> np.uint64(17)) % np.uint64(50)
    htmls = [
        (
            "<html><head><title>" + _esc(u) + "</title></head><body><pre>"
            + _esc(t) + "</pre>" + "<div class=\"boilerplate\">pad</div>" * int(p)
            + "</body></html>"
        ).encode("utf-8")
        for u, t, p in zip(urls, texts, pad_n)
    ]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts),
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )


def synthesize_pages(spark, n_rows: int, partitions: int | None = None):
    """Distributed deterministic pages table: spark.range → mapInPandas.

    At 10^12 rows this is the same code — each task generates its own id
    range; no driver materialization, no shuffle.
    """
    from . import pages as _self  # noqa: F401  (ensure picklable module refs)
    from ..schemas import PAGES_SCHEMA

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            if len(ids):
                yield generate_pages_pandas(ids)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages(spark, path: str, n_rows: int, partitions: int | None = None) -> None:
    """Materialize the synthetic pages table as parquet (bench input cache)."""
    synthesize_pages(spark, n_rows, partitions).write.mode("overwrite").parquet(path)
