"""URL analysis operators for corpus curation.

Web-scale training pipelines curate by URL: host extraction and
normalization, then per-host rollups (document counts, language spread,
exact-duplicate rate) drive domain allow/deny decisions. The reference's
enrichment step is the same shape (resource attributes → record
attributes, docs/processing.md:211-215) — here the "resource" is the
URL's host.

Scale: host extraction is a narrow per-row projection (Spark's built-in
``parse_url`` — JVM-side, codegen); the rollup is one hash aggregate on
host (count-distinct expands to the standard two-phase plan). At 100 TB
host is the natural partition key for downstream per-site work, and the
rollup's partial aggregation collapses each partition to #hosts rows
before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..pins import free as pins_free
from ..pins import register as pins_register


def url_host(url: Column) -> Column:
    """Lower-cased host of a URL (parse_url(url, 'HOST'); the oracle twin
    is ``regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)``)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def registered_domain(host: Column, levels: int = 2) -> Column:
    """Last ``levels`` labels of the host — the public-suffix-free
    approximation of the registered domain (exact PSL matching needs the
    suffix list; this heuristic is the standard columnar stand-in)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n <= levels, host
    ).otherwise(
        F.array_join(F.slice(parts, n - levels + 1, levels), ".")
    )


def filter_blocked_hosts(
    pages: DataFrame, blocked: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """Drop every page whose URL host appears in the blocklist dim —
    the domain-deny stage of corpus curation (the reference's filter
    processor is the same drop-matching-records shape, SURVEY §2 P9).

    Broadcast LEFT ANTI join: the blocklist (even at ~10⁶ hosts, a few
    tens of MB) ships to every executor, so the 100 TB side is filtered
    map-side with zero shuffle of page data. Output keeps the page
    columns plus the extracted ``host``.
    """
    blk = F.broadcast(blocked.select(F.col(host_col).alias("host")).distinct())
    with_host = pages.select("*", url_host(F.col(url_col)).alias("host"))
    return with_host.join(blk, "host", "left_anti")


def host_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-host curation rollup: document count, distinct languages,
    distinct exact-content digests, and the exact-duplicate rate
    ``1 − n_unique_texts / n_docs``.

    One aggregation keyed by host (the count-distincts expand to the
    two-phase distinct-aggregate plan); the md5 digest is computed
    map-side so the shuffle carries 32-byte keys, not documents.
    """
    host = url_host(F.col(url_col))
    per_host = (
        pages.select(
            host.alias("host"),
            F.col(lang_col).alias("lang"),
            F.md5(F.col(text_col)).alias("digest"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("digest").cast("long").alias("n_unique_texts"),
        )
    )
    return per_host.withColumn(
        "dup_rate",
        F.round(F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs"), 4),
    )


def host_sketches(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    rel_tol: float = 0.05,
) -> DataFrame:
    """Per-host SKETCH rollup — the 100 TB form of :func:`host_stats`'
    count-distincts: HyperLogLog++ approximate distinct texts and an
    approximate median text length, each emitted alongside a boolean
    gate that the sketch landed within ``rel_tol`` of the exact value
    computed in the same aggregate.

    Why sketches are the scale path: an exact count-distinct expands to
    a two-phase distinct aggregate whose FIRST shuffle carries every
    distinct (host, digest) pair — at 10¹² docs that is the corpus. The
    HLL register array is constant-size per host and merges
    commutatively, so the shuffle carries KB per host regardless of
    corpus size (same story for the quantile summary vs an exact
    percentile's per-group sort). The exact twins here exist to power
    the gates; at production scale you would drop them and keep only
    the sketches. Gates (not sketch values) are the cross-engine
    contract: DuckDB's HLL is a different implementation, so the
    VALUE is engine-specific but the error bound is not.
    """
    host = url_host(F.col(url_col))
    n_len = F.length(F.col(text_col))
    agg = (
        pages.select(
            host.alias("host"),
            F.md5(F.col(text_col)).alias("digest"),
            n_len.alias("n_chars"),
        )
        .groupBy("host")
        .agg(
            F.countDistinct("digest").alias("exact_distinct"),
            F.approx_count_distinct("digest", rsd=0.02).alias("approx_distinct"),
            F.expr("percentile(n_chars, 0.5)").alias("exact_median_chars"),
            F.percentile_approx("n_chars", 0.5).alias("approx_median_chars"),
        )
    )
    def _ok(approx, exact):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(rel_tol) * exact.cast("double")
        ).cast("boolean")

    return agg.select(
        "host",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        _ok(F.col("approx_distinct"), F.col("exact_distinct")).alias("distinct_ok"),
        _ok(F.col("approx_median_chars"), F.col("exact_median_chars")).alias(
            "median_ok"
        ),
    )


# tracking parameters dropped during canonicalization (the standard
# click-ID inventory; extend per deployment)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form for dedup/curation joins: lower-cased scheme and
    host, default ports stripped (:80 http / :443 https), fragment
    removed, query parameters sorted with tracking params dropped, empty
    path normalized to '/'.  Two crawls of the same page under cosmetic
    URL variation map to one canonical key.

    Pure built-in expressions (regex in the RE2∩Java common subset +
    array ops), so the DuckDB oracle reproduces it exactly; narrow, runs
    at scan speed.  Expects absolute ``scheme://`` URLs (the crawl's url
    column always is); relative inputs pass through deterministically but
    un-normalized.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).otherwise(hostport)
    rest = F.regexp_replace(no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    # scheme-less/relative input: genuinely pass through unchanged (the
    # assembled form would prefix a bogus '://')
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qpart)
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the form
    Common Crawl's CDX index sorts by: scheme dropped, host lower-cased
    with a leading ``www.`` stripped and its labels reversed
    comma-joined, then ``)`` + path + normalized query. Example::

        HTTPS://WWW.News.Example.COM:443/A/b?z=1&a=2#frag
          → com,example,news)/A/b?a=2&z=1

    Built on :func:`canonicalize_url` (which already lower-cases scheme
    and host, strips default ports and fragments, and sorts the query),
    so two cosmetic variants of one page produce one SURT key. A
    non-default port survives after the reversed host (``com,example:
    8080)/``), matching the archival convention. Scheme-less input
    passes through lower-cased but otherwise unchanged (the transform
    is defined over absolute URLs; the crawl's url column always is).

    Pure built-in expressions (split/reverse/array_join + the RE2∩Java
    regex subset) — scan speed, and the DuckDB oracle reproduces it.
    """
    canon = canonicalize_url(url)
    scheme = F.regexp_extract(canon, "^([a-z][a-z0-9+.-]*)://", 1)
    hostport = F.regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), r"^www\.", ""
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_replace(canon, "^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    return F.when(scheme == "", F.lower(url)).otherwise(
        F.concat(
            rev_host,
            F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
            F.lit(")"),
            rest,
        )
    )


def robots_star_rules(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into the ``*`` (any-agent) group's rules:
    ``(host, allow:boolean, prefix, plen)`` — the deny/allow table a
    crawl-curation pass enforces before keeping a page.

    Columnar parse of the RFC 9309 prefix subset (no in-prefix wildcards,
    no crawl-delay): explode lines with position; a user-agent BLOCK
    starts at a ``User-agent:`` line not directly preceded by one
    (consecutive ua lines share a group per the RFC); the running count
    of block starts is the group id (one window per host); a group is
    live for ``*`` if any of its ua lines names ``*``; Allow/Disallow
    lines inherit their group's liveness. Comments (#…) are stripped,
    directives match case-insensitively, empty prefixes (the allow-all
    ``Disallow:``) drop out. Two host-keyed window/agg shuffles over the
    LINES of robots files — a corpus that is tiny relative to pages.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    low = F.lower(clean)
    colon = F.locate(":", clean)
    val = F.trim(F.substring(clean, colon + 1, 1_000_000))
    typed = lines.select(
        "host",
        "pos",
        low.startswith("user-agent:").alias("is_ua"),
        low.startswith("allow:").alias("is_allow"),
        low.startswith("disallow:").alias("is_dis"),
        val.alias("val"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    blocked_start = F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
    grouped = typed.withColumn(
        "gid", F.sum(blocked_start.cast("int")).over(w)
    )
    star_groups = (
        grouped.where(F.col("is_ua") & (F.col("val") == "*"))
        .select("host", "gid")
        .distinct()
    )
    return (
        grouped.where((F.col("is_allow") | F.col("is_dis")) & (F.col("val") != ""))
        .join(star_groups, ["host", "gid"])
        .select(
            "host",
            F.col("is_allow").alias("allow"),
            F.col("val").alias("prefix"),
            F.length("val").alias("plen"),
        )
    )


def apply_robots(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Append ``robots_blocked`` to ``pages`` under the standard
    longest-match rule: a page is blocked when its longest matching
    Disallow prefix is longer than its longest matching Allow prefix
    (allow wins ties); hosts without rules are allowed.

    Scale: a host-keyed join (rules are per-host and FEW; Catalyst
    broadcasts a small rules table, shuffles a big one) followed by one
    per-page aggregate — pages never shuffle on anything finer than the
    join key, and the pre-aggregation below the join keeps the fan-out
    bounded by rules-per-host.
    """
    host = url_host(F.col(url_col))
    path_raw = F.regexp_extract(F.col(url_col), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^#]*)?", 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    keyed = pages.select(
        F.col(url_col), host.alias("__h"), path.alias("__p")
    )
    j = keyed.join(rules.withColumnRenamed("host", "__h"), "__h", "left")
    match = F.col("__p").startswith(F.col("prefix"))
    agg = j.groupBy(url_col).agg(
        F.max(F.when(match & F.col("allow"), F.col("plen"))).alias("__alen"),
        F.max(F.when(match & ~F.col("allow"), F.col("plen"))).alias("__dlen"),
    )
    blocked = F.coalesce(F.col("__dlen"), F.lit(-1)) > F.coalesce(
        F.col("__alen"), F.lit(-1)
    )
    return agg.select(url_col, blocked.alias("robots_blocked"))


def latest_revision(
    revisions: DataFrame,
    key_col: str = "url",
    ts_col: str = "fetch_ts",
    payload_cols: tuple[str, ...] = ("digest",),
) -> DataFrame:
    """Latest-crawl-wins revision dedup: one row per ``key_col`` carrying
    the payload of the revision with the greatest ``ts_col`` plus the
    revision count — the canonical Common-Crawl "keep the newest fetch of
    each URL" stage (CC-MAIN segments re-crawl the same URL across
    snapshots; training corpora keep one).

    Reference analog: the dedup the shared-receiver-instance map performs
    on component identity (service/internal/graph/graph.go keeps one
    instance per id) — here the identity is the URL and "one instance" is
    the newest fetch.

    Scale shape: a single hash aggregate keyed by URL using ``max_by``
    (arg-max) — NOT a window ``row_number``, which would sort every
    partition's full revision history; ``max_by`` folds map-side, so the
    shuffle carries one candidate row per (partition, url), and skewed
    hot URLs cost one combiner row each. Ties on ``ts_col`` resolve to
    the max payload (Spark and DuckDB ``arg_max`` both keep a
    deterministic extreme under a total order; supply unique timestamps
    for full determinism).
    """
    ts = F.col(ts_col)
    aggs = [F.count("*").cast("long").alias("n_revisions"), F.max(ts).alias(ts_col)]
    aggs += [F.max_by(F.col(c), ts).alias(c) for c in payload_cols]
    return revisions.groupBy(key_col).agg(*aggs)


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
    round_dp: int = 12,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge frame ``(src, dst)`` —
    returns ``(nid, rank)``. Web pipelines use the host/page graph rank
    as a quality prior (domain weighting during corpus mixing); this is
    the distributed-iterative member of the curation family.

    Semantics: ``r₀ = 1/n``; ``r_{k+1}(v) = (1−d)/n + d·Σ_{(u,v)∈E}
    r_k(u)/outdeg(u)`` over the DISTINCT edge set. Dangling nodes (no
    out-edges) leak their mass — the classic simplified formulation; the
    DuckDB oracle twin unrolls the same recurrence, and each iteration
    rounds to ``round_dp`` decimals IN BOTH ENGINES so cross-engine
    float-sum ordering can never drift the values.

    Scale shape: per iteration, one shuffle joining ranks to edges on
    ``src`` and one hash aggregate on ``dst`` — the textbook distributed
    PageRank step. The rank and outdegree frames are node-sized (NOT
    broadcast: the node set is corpus-derived); at production scale
    pre-partition ``edges`` by ``src`` once so every iteration reuses the
    exchange, and pass ``checkpoint_every`` to cut the growing lineage
    (plan depth is linear in iterations; localCheckpoint bounds it).
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).distinct()
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("nid"))
            .unionAll(e.select(F.col("dst").alias("nid")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).cast("long").alias("nid"))
    n_row = nodes.agg(F.count("*").cast("double").alias("__n"))
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("__od"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "nid", F.round(F.lit(1.0) / F.col("__n"), round_dp).alias("rank")
    )
    prev_ckpt = None
    for i in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("nid", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("nid"),
                (F.col("rank") / F.col("__od")).alias("__c"),
            )
        )
        inflow = contribs.groupBy("nid").agg(F.sum("__c").alias("__in"))
        ranks = (
            nodes.join(inflow, "nid", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "nid",
                F.round(
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
            # free the SUPERSEDED checkpoint's blocks: eager=True just
            # materialized the new one, so the old is no longer part of
            # any live lineage. (Tracking the checkpointed frame itself
            # is load-bearing — the derived `ranks` of later rounds is
            # never is_cached, and plain unpersist() can't free a
            # checkpoint RDD anyway; pins.free reaches the JVM-side RDD.)
            if prev_ckpt is not None:
                pins_free(prev_ckpt)
            prev_ckpt = ranks
    if prev_ckpt is not None:
        # the final checkpoint underpins the returned (derived) frame —
        # register it so a harness can free it at its quiescent point
        pins_register(prev_ckpt)
    return ranks
