"""opentelemetry_collector_spark — a PySpark-native rebuild of the
OpenTelemetry Collector's pipeline model (receivers → processors →
exporters) as a batch / Structured-Streaming DAG over Common-Crawl-style
web pages.

This is NOT a port of the Go reference (djaglowski/opentelemetry-collector);
it re-expresses the same semantics — parse → enrich → route → aggregate —
declaratively on the Spark DataFrame API so Catalyst/Tungsten pick the
physical plan. Reference citations in docstrings use file:line paths under
/root/reference.

Layout:
  schemas       fixed StructTypes for pages / log_records (pdata analog)
  fixtures      deterministic synthetic pages + lookup tables (testdata analog)
  operators     processors: parse, ottl, enrich, batch, dedup, similarity, text
  sources       batch/streaming readers (receiver analog)
  streaming     fan-out router, idempotent sinks, telemetry (exporterhelper analog)
  plans         YAML pipeline config → compiled DAG (service/graph.go analog)
  functions     value coercion + severity mapping (pcommon analog)
"""

__version__ = "0.1.0"
