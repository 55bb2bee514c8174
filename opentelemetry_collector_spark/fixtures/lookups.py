"""Enrichment lookup tables (FIXTURES.md §4) — broadcast-join fixtures.

These are the attributes/resource-processor analogs (SURVEY.md P10,
docs/processing.md:211-215): small, unique-keyed, deterministic dims that
are broadcast to every executor — the idiomatic Spark upgrade of the
reference's in-process map lookups.
"""

from __future__ import annotations

from ..schemas import LKP_GEO_SCHEMA, LKP_LANG_SCHEMA, LKP_SEVERITY_SCHEMA, SEVERITY_NUMBER
from .pages import N_HOSTS

_LANG_ROWS = [
    ("en", "germanic", False), ("de", "germanic", False), ("nl", "germanic", False),
    ("sv", "germanic", False), ("fr", "romance", False), ("es", "romance", False),
    ("it", "romance", False), ("pt", "romance", False), ("ro", "romance", False),
    ("zh", "sinitic", False), ("ja", "japonic", False), ("ko", "koreanic", False),
    ("ru", "slavic", False), ("pl", "slavic", False), ("uk", "slavic", False),
    ("ar", "semitic", True), ("he", "semitic", True), ("hi", "indic", False),
    ("bn", "indic", False), ("tr", "turkic", False),
]

_COUNTRIES = ["US", "DE", "FR", "GB", "JP", "CN", "BR", "IN", "CA", "AU"]
_REGIONS = {
    "US": "amer", "CA": "amer", "BR": "amer",
    "DE": "emea", "FR": "emea", "GB": "emea",
    "JP": "apac", "CN": "apac", "IN": "apac", "AU": "apac",
}


def lkp_lang(spark):
    return spark.createDataFrame(_LANG_ROWS, LKP_LANG_SCHEMA)


def lkp_geo(spark):
    rows = []
    for i in range(N_HOSTS):
        c = _COUNTRIES[i % len(_COUNTRIES)]
        rows.append((f"host{i:04d}.example.com", c, _REGIONS[c]))
    return spark.createDataFrame(rows, LKP_GEO_SCHEMA)


def lkp_severity(spark):
    """25 rows incl. aliases (WARNING→WARN etc.), mirroring
    pdata/plog/severity_number.go:26-46."""
    rows = [(k, v) for k, v in SEVERITY_NUMBER.items()]
    rows += [("WARNING", 13), ("ERR", 17), ("CRITICAL", 21)]
    return spark.createDataFrame(rows, LKP_SEVERITY_SCHEMA)
