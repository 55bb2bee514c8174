"""Lookup enrichment — the attributes/resource processor analog (P10).

Reference semantics: per-record map lookups that copy/derive attributes,
e.g. ``set(attributes["k8s_pod"], resource.attributes["k8s.pod.name"])``
(docs/processing.md:211-215). The collector does this as an in-process map
access per record; the idiomatic distributed upgrade is a **broadcast hash
join** against small dimension tables: the dim ships once to every executor
and the probe stays embarrassingly parallel — zero shuffle of the fact side
(SURVEY.md §2.6 notes enrichment is map-lookup-shaped, so broadcast is the
correct physical plan at any scale; never a sort-merge join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_broadcast(
    records: DataFrame,
    lookup: DataFrame,
    on: Column | str,
    take: dict[str, str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Left broadcast-join ``lookup`` onto ``records``.

    Args:
        on: join condition — either a shared column name or a Column
            equi-condition like ``records.resource.host == lookup.host``.
        take: {lookup_col: output_col} projection of the dim side; default
            takes all non-key columns keeping their names. REQUIRED when
            ``on`` is a Column condition: the key columns can't be
            inferred from an arbitrary condition, so a default would leak
            the dim's join key into the output (colliding with a
            same-named fact column downstream).
        prefix: optional output-name prefix shorthand for ``take``.
    """
    dim = F.broadcast(lookup)
    if take is None:
        if not isinstance(on, str):
            raise ValueError(
                "enrich_broadcast: pass take= explicitly when `on` is a "
                "Column condition (the dim join key can't be inferred)"
            )
        take = {
            c: (f"{prefix}{c}" if prefix else c)
            for c in lookup.columns
            if c != on
        }
    joined = records.join(dim, on=on, how="left")
    # records[c] unconditionally: with a string join key, another column
    # name shared by both frames would make F.col(c) ambiguous in the
    # joined frame (AMBIGUOUS_REFERENCE at analysis)
    fact_cols = [records[c] for c in records.columns]
    return joined.select(*fact_cols, *[dim[s].alias(d) for s, d in take.items()])


def enrich_resource_geo(records: DataFrame, lkp_geo: DataFrame) -> DataFrame:
    """Attach country/region from the host dim into the resource struct —
    the resourceprocessor analog; key = resource.host."""
    dim = F.broadcast(lkp_geo)
    joined = records.join(dim, records["resource.host"] == dim["host"], "left")
    new_resource = F.struct(
        F.col("resource.host").alias("host"),
        F.col("resource.lang").alias("lang"),
        F.coalesce(dim["country"], F.lit("")).alias("country"),
        F.coalesce(dim["region"], F.lit("")).alias("region"),
    )
    cols = [F.col(c) for c in records.columns if c != "resource"]
    return joined.select(*cols, new_resource.alias("resource"))


def enrich_lang_family(records: DataFrame, lkp_lang: DataFrame) -> DataFrame:
    """Attach lang_family/rtl as record attributes from the lang dim —
    attributesprocessor insert-from-lookup analog."""
    dim = F.broadcast(lkp_lang)
    joined = records.join(dim, records["resource.lang"] == dim["lang"], "left")
    # On a lookup HIT, drop any pre-existing lang_family/rtl keys before
    # the concat: map_concat with a duplicate key aborts the job under
    # mapKeyDedupPolicy=EXCEPTION (a kv log line like 'lang_family=x'
    # puts one in attributes), and the enrichment should overwrite —
    # ottl.py's set() semantics. On a MISS the attributes pass through
    # untouched (set(nil) is a no-op; existing keys must survive).
    concat_attrs = F.map_concat(
        F.map_filter(
            F.col("attributes"),
            lambda k, _: (k != F.lit("lang_family")) & (k != F.lit("rtl")),
        ),
        F.map_from_entries(
            F.filter(
                F.array(
                    F.struct(F.lit("lang_family").alias("key"), dim["lang_family"].alias("value")),
                    F.struct(
                        F.lit("rtl").alias("key"),
                        F.when(dim["rtl"], F.lit("true"))
                        .when(~dim["rtl"], F.lit("false"))
                        .alias("value"),
                    ),
                ),
                lambda s: s.getField("value").isNotNull(),
            )
        ),
    )
    new_attrs = F.when(dim["lang"].isNotNull(), concat_attrs).otherwise(
        F.col("attributes")
    )
    cols = [F.col(c) for c in records.columns if c != "attributes"]
    return joined.select(*cols, new_attrs.alias("attributes")).select(*records.columns)


def enrich_asof(
    records: DataFrame,
    dim_versions: DataFrame,
    key: str,
    ts_col: str,
    valid_from_col: str = "valid_from",
    take: dict[str, str] | None = None,
) -> DataFrame:
    """Temporal (as-of / SCD2-style) enrichment: attach the dimension
    VERSION that was active at each record's timestamp — the
    log-pipeline form of "enrich with the geo/config mapping as of the
    event time", which a plain broadcast join cannot express.

    ``dim_versions`` holds (key, valid_from, attrs...) — multiple rows
    per key.  Plan: the dim is intervalized map-side (``lead`` over
    (key, valid_from) closes each version with the next one's start —
    the window runs over the TINY dim, never the fact), then broadcast
    and joined with a half-open range predicate
    ``valid_from <= ts < valid_to`` — exactly one match per record, so
    the fact side never shuffles and never fans out.  Records older than
    the key's first version (or with an unknown key) enrich to NULL,
    like a missed lookup.  Equivalent to DuckDB/ANSI ``ASOF JOIN``.

    ``dim_versions`` must not repeat (key, valid_from): two versions
    starting at the same instant have no defined order, so one would get
    an empty interval chosen nondeterministically.  Callers dedupe at
    dim build time (a real SCD feed is unique on that pair by
    construction).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(valid_from_col).asc())
    iv = dim_versions.withColumn(
        "__valid_to", F.lead(valid_from_col).over(w)
    )
    if take is None:
        take = {
            c: c
            for c in dim_versions.columns
            if c not in (key, valid_from_col)
        }
    if key not in records.columns:
        raise ValueError(f"enrich_asof: records has no key column {key!r}")
    # alias-qualified resolution, not DataFrame attribute access: a dim
    # DERIVED from the fact frame (e.g. distinct keys of the records
    # themselves) shares expression ids with it, and records[key] ==
    # dim[key] is then an ambiguous self-join
    fact = records.alias("__fact")
    dim = F.broadcast(iv.alias("__dim"))
    ts = F.col(f"__fact.{ts_col}")
    cond = (
        (F.col(f"__fact.{key}") == F.col(f"__dim.{key}"))
        & (ts >= F.col(f"__dim.{valid_from_col}"))
        & (F.col("__dim.__valid_to").isNull() | (ts < F.col("__dim.__valid_to")))
    )
    joined = fact.join(dim, on=cond, how="left")
    return joined.select(
        *[F.col(f"__fact.{c}") for c in records.columns],
        *[F.col(f"__dim.{s}").alias(d) for s, d in take.items()],
    )
