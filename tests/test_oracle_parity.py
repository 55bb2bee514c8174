"""Driver-style oracle parity smoke: a representative subset of
__spark_entry__ queries vs their DuckDB oracles at sf0.001.

(The full matrix runs via ``python tools/selfcheck.py``; this keeps the
pytest loop fast while still locking the cross-engine conventions —
rounding, hashing, epoch-integer timestamps.)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.selfcheck import TABLES, frame_rows

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "pipeline_e2e",
    "events_parse_json",
    "router_counts",
    "window_tumbling",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_suite",
    "warc_roundtrip",
    "text_signals",
    "multimodal_suite",
    "html_extract_text",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    sc, sr = frame_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.sql(sql)
    oc, orr = frame_rows([d[0] for d in rel.description], rel.fetchall())
    assert sc == oc
    assert len(sr) == len(orr)
    assert sr == orr


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_every_query_has_oracle_or_is_flagged(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # non-SQL-expressible ops are the documented exceptions
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()
