"""Link-graph family unit tests: anchor-href extraction
(htmltext.extract_links), latest-crawl-wins revision dedup
(urls.latest_revision), and fixed-iteration PageRank (urls.pagerank —
value-checked against a pure-Python reference recurrence)."""

from __future__ import annotations

import pyspark.sql.functions as F

from opentelemetry_collector_spark.operators.htmltext import extract_links
from opentelemetry_collector_spark.operators.urls import latest_revision, pagerank


def _links(spark, html: str) -> list[str]:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(
        extract_links(F.encode(F.col("h"), "UTF-8")).alias("l")
    ).collect()[0]["l"]


def test_extract_links_shapes(spark):
    html = (
        '<a href="/a?x=1&amp;y=2">one</a>'
        "<A CLASS='m' HREF='https://ex.org/abs#frag'>two</A>"
        '<a name="anchor-only">no href</a>'
        '<a data-x="href=decoy" href="/real">attr decoy</a>'
        "<p>not <b>a link</b></p>"
    )
    got = _links(spark, html)
    assert got == ["/a?x=1&y=2", "https://ex.org/abs#frag", "/real"]


def test_extract_links_empty_and_null(spark):
    assert _links(spark, "<p>no anchors at all</p>") == []
    df = spark.createDataFrame([(None,)], "h binary")
    assert df.select(extract_links(F.col("h")).alias("l")).collect()[0]["l"] is None


def test_extract_links_plan_is_narrow(spark):
    df = spark.range(5).select(
        F.encode(F.concat(F.lit('<a href="/d/'), F.col("id"), F.lit('">x</a>')), "UTF-8").alias("h")
    )
    plan = (
        df.select(extract_links(F.col("h")).alias("l"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_latest_revision_keeps_newest_fetch(spark):
    revs = spark.createDataFrame(
        [
            ("u1", 100, "old", 7),
            ("u1", 300, "new", 9),
            ("u1", 200, "mid", 8),
            ("u2", 50, "only", 1),
        ],
        "url string, fetch_ts long, digest string, doc_id long",
    )
    got = {
        r["url"]: r
        for r in latest_revision(
            revs, payload_cols=("digest", "doc_id")
        ).collect()
    }
    assert got["u1"]["digest"] == "new" and got["u1"]["doc_id"] == 9
    assert got["u1"]["fetch_ts"] == 300 and got["u1"]["n_revisions"] == 3
    assert got["u2"]["digest"] == "only" and got["u2"]["n_revisions"] == 1


def test_latest_revision_empty(spark):
    revs = spark.createDataFrame([], "url string, fetch_ts long, digest string")
    assert latest_revision(revs).count() == 0


def _py_pagerank(edges, nodes, n_iter=3, d=0.85, dp=12):
    e = sorted(set(edges))
    od = {}
    for s, _ in e:
        od[s] = od.get(s, 0) + 1
    n = float(len(nodes))
    r = {v: round(1.0 / n, dp) for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0.0 for v in nodes}
        for s, t in e:
            if t in inflow:
                inflow[t] += r[s] / od[s]
        r = {v: round((1 - d) / n + d * inflow[v], dp) for v in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    nodes = list(range(12))
    edges = [(i, (i * 7 + 1) % 12) for i in nodes] + [
        (i, (i * 13 + 3) % 12) for i in nodes
    ] + [(i, (i * 3 + 5) % 12) for i in nodes]
    want = _py_pagerank(edges, nodes)
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "nid long")
    got = {r["nid"]: r["rank"] for r in pagerank(e, n_iter=3, nodes=nd).collect()}
    assert got.keys() == want.keys()
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # probability mass is conserved up to dangling leak (no dangling here:
    # every node has out-edges by construction)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_dangling_leaks_mass(spark):
    # node 2 has no out-edges: its mass leaks (documented simplified form)
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    nd = spark.createDataFrame([(0,), (1,), (2,)], "nid long")
    got = {r["nid"]: r["rank"] for r in pagerank(e, n_iter=2, nodes=nd).collect()}
    assert sum(got.values()) < 1.0
    assert got[2] > got[0]  # sink accumulates, source keeps only teleport


def test_pagerank_checkpoint_every_same_values(spark):
    nodes = list(range(8))
    edges = [(i, (i + 1) % 8) for i in nodes] + [(i, (i * 3 + 1) % 8) for i in nodes]
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "nid long")
    plain = {r["nid"]: r["rank"] for r in pagerank(e, n_iter=4, nodes=nd).collect()}
    ckpt = pagerank(e, n_iter=4, nodes=nd, checkpoint_every=2)
    got = {r["nid"]: r["rank"] for r in ckpt.collect()}
    assert got == plain
