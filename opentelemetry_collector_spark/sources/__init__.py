"""Source boundary — receiver analogs (SURVEY.md §2.1).

The reference's receivers are where payloads enter the DAG
(receiver/otlpreceiver/otlp.go:42-279); here the source boundary is a
parquet/Iceberg scan. Loaders keep the scan declarative so Catalyst gets
predicate pushdown + column pruning for free.
"""

from .tables import load_tables, events_to_records, pages_from_documents  # noqa: F401
