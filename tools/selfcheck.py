"""Driver-style correctness self-check: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from opentelemetry_collector_spark import pins
from opentelemetry_collector_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        # MapType cells must normalize to something hashable — the
        # rowcount-mismatch diagnostic builds set(rows), and a raw dict
        # would abort the whole selfcheck with TypeError instead of
        # printing one FAIL line
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def frame_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("selfcheck")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            pins.release_pins()  # free model/top-k checkpoints per query
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        sc, sr = frame_rows(scols, srows)
        oc, orr = frame_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns spark={sc} oracle={oc}")
            failures += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            so, oo = set(sr), set(orr)
            print(f"      only-spark={list(so - oo)[:3]} only-oracle={list(oo - so)[:3]}")
            failures += 1
            continue
        if sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs {diff}")
            failures += 1
            continue
        print(f"PASS  {name} ({len(sr)} rows)")

    try:
        edf = entrymod.entry(spark)
        n = edf.count()
        print(f"entry(): {n} rows, schema {edf.columns}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL  entry(): {e}")
        failures += 1

    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
