"""Pipeline compiler + batch executor — the service/graph.go analog (T1).

The reference builds a DAG of receiver→capabilities→processor→fanout→
exporter nodes and instantiates components in reverse topo order so each
gets its downstream consumer (service/graph.go:42-223). Our plan is
declarative: a pipeline compiles to a chain of ``DataFrame -> DataFrame``
stages plus a fan-out router; Spark's lazy DAG is the runtime and Catalyst
replaces hand-built consumer chains.

Semantics preserved from the reference:
- shared receiver instances: a receiver referenced by many pipelines is
  read ONCE (internal/sharedcomponent, docs/design.md:77) — and persisted
  when >1 pipeline consumes it;
- per-pipeline processor instances: the same processor config yields a
  fresh instance per pipeline (docs/design.md:121-152);
- connectors bridge pipelines (connector/forwardconnector/forward.go:75-88);
- capabilities/clone bookkeeping (fanoutconsumer/logs.go:37-55) vanishes —
  DataFrames are immutable.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import lkp_geo, lkp_lang, synthesize_pages
from ..operators.batch import batch_repartition
from ..operators.enrich import enrich_lang_family, enrich_resource_geo
from ..operators.ottl import compile_statements
from ..operators.parse import parse_pages
from ..streaming.router import SINKS_COL, FanoutRouter, Route
from ..streaming.sinks import IdempotentParquetSink
from ..streaming.telemetry import PipelineTelemetry, write_lineage
from .config import CollectorConfig, ConfigError

log = logging.getLogger(__name__)

Stage = Callable[[DataFrame], DataFrame]


# --------------------------------------------------------------------------
# component factories (receiver.Factory / processor.Factory analog)
# --------------------------------------------------------------------------

def _build_receiver(spark: SparkSession, kind: str, opts: dict) -> DataFrame:
    if kind == "pages_parquet":
        return spark.read.parquet(opts["path"])
    if kind == "pages_synthetic":
        return synthesize_pages(spark, int(opts["n_rows"]), opts.get("partitions"))
    if kind == "records_parquet":  # pre-parsed log records
        return spark.read.parquet(opts["path"])
    raise ConfigError(f"unknown receiver kind {kind!r}")


def _build_processor(spark: SparkSession, kind: str, opts: dict) -> Stage:
    if kind == "parse":
        engine = opts.get("engine", "sql")
        return lambda df: parse_pages(df, engine=engine)
    if kind == "transform":
        return compile_statements(list(opts.get("statements") or []))
    if kind == "filter":
        stmts = []
        if "drop_where" in opts:
            stmts.append(f"drop() where {opts['drop_where']}")
        if "keep_where" in opts:
            stmts.append(f"keep() where {opts['keep_where']}")
        if not stmts:
            raise ConfigError("filter processor needs drop_where or keep_where")
        return compile_statements(stmts)
    if kind == "grok":
        # filelog-operator analog: grok-syntax field extraction from a
        # text column into typed columns (regex_parser with the pattern
        # library); compile eagerly so a bad pattern fails at config
        # load, not mid-pipeline
        from ..operators.grok import GrokError, compile_grok, grok_extract

        pattern = opts.get("pattern")
        if not pattern:
            raise ConfigError("grok processor needs a pattern")
        custom = opts.get("custom") or None
        try:
            compile_grok(pattern, custom)
        except GrokError as e:
            raise ConfigError(f"grok processor: {e}") from e
        source = opts.get("source", "body")
        return lambda df: grok_extract(df, pattern, source, custom)
    if kind == "enrich_geo":
        dim = lkp_geo(spark)
        return lambda df: enrich_resource_geo(df, dim)
    if kind == "enrich_lang":
        dim = lkp_lang(spark)
        return lambda df: enrich_lang_family(df, dim)
    if kind == "batch":
        md_keys = list(opts.get("metadata_keys") or [])
        if md_keys:
            # metadata_keys batching (batch_processor.go:65-75): batches
            # never mix values of these keys. Stage half: co-locate each
            # value-set (repartition on the key tuple, not url-hash); the
            # runner adds the write half — partitionBy(sink, *keys) — and
            # enforces metadata_cardinality_limit (default 1000,
            # config.go:51-56) with one bounded count-distinct
            return batch_repartition(
                partitions=opts.get("partitions"),
                key=F.struct(*[F.col(k) for k in md_keys]),
            )
        return batch_repartition(
            partitions=opts.get("partitions"),
            key=opts.get("key", "url"),
        )
    if kind == "client_attribute":
        # the "authprinter" consumption pattern (client/client.go:63-88):
        # copy one authenticator attribute from client.auth onto records
        from ..operators.clientauth import client_attribute_stage

        attribute = opts.get("attribute")
        if not attribute:
            raise ConfigError("client_attribute processor needs an attribute")
        return client_attribute_stage(attribute, opts.get("column"))
    if kind == "memory_limiter":
        # P5: backpressure/spill is built into Spark's unified memory
        # manager (memorylimiter.go:181-235 has no dataplane equivalent
        # here) — accept the config for compatibility, pass through.
        return lambda df: df
    if kind == "redact_pii":
        # config-declarable curation: redact emails/IPs/phones IN PLACE
        # on `source` (attributes-processor-style value rewrite); with
        # counters: true the match counts ride along for drop-rate audits

        from ..operators.redact import pii_counts, redact_text

        source = opts.get("source", "body")
        with_counters = bool(opts.get("counters"))

        def _redact(df):
            if with_counters:
                # counters read the ORIGINAL text, then the rewrite lands
                ne, ni, np_ = pii_counts(F.col(source))
                df = df.select(
                    "*",
                    ne.cast("int").alias("n_emails"),
                    ni.cast("int").alias("n_ips"),
                    np_.cast("int").alias("n_phones"),
                )
            return df.withColumn(source, redact_text(F.col(source)))

        return _redact
    if kind == "c4_clean":
        # C4 line-level cleanup in place on `source`; drop_failing: true
        # additionally drops pages failing the page rule (min kept lines,
        # no braces, no lorem-ipsum) — same expressions as the oracle'd
        # c4_line_filter via the shared helpers, so the two cannot drift

        from ..operators.textstats import c4_lines_kept, c4_page_flags

        source = opts.get("source", "body")
        min_words = int(opts.get("min_words_per_line", 5))
        min_kept = int(opts.get("min_kept_lines", 3))
        drop_failing = bool(opts.get("drop_failing"))

        def _c4(df):
            text = F.col(source)
            _lines, kept = c4_lines_kept(text, min_words)
            has_brace, has_lorem = c4_page_flags(text)
            ok = (F.size(kept) >= min_kept) & ~has_brace & ~has_lorem
            out = df.where(text.isNotNull()).withColumns(
                {"c4_ok": ok, source: F.array_join(kept, "\n")}
            )
            return out.where("c4_ok").drop("c4_ok") if drop_failing else out

        return _c4
    if kind == "badwords":
        # C4 word-blocklist page filter: whole-token, case-insensitive,
        # blocklist folded into the plan as a literal array (no join);
        # action: drop (default) removes flagged pages, flag keeps them
        # with a badwords_ok column

        words = opts.get("words") or []
        if not words:
            raise ConfigError("badwords processor needs a words list")
        source = opts.get("source", "body")
        action = opts.get("action", "drop")
        if action not in ("drop", "flag"):
            raise ConfigError(f"badwords action must be drop|flag, got {action!r}")

        def _bad(df):
            toks = F.split(F.lower(F.col(source)), "[^a-z0-9]+")
            hits = F.array_intersect(
                toks, F.array(*[F.lit(w.lower()) for w in words])
            )
            ok = F.size(hits) == 0
            if action == "drop":
                return df.where(F.col(source).isNotNull() & ok)
            return df.withColumn("badwords_ok", ok)

        return _bad
    if kind == "encoding_gate":
        # encoding-sanity quality gate: drop (default) or flag pages with
        # replacement chars, C0 controls, or mojibake artifacts — same
        # column expressions as the oracle'd encoding_signals operator,
        # so the config path cannot drift; pure codegen regex counts

        from ..operators.textstats import _encoding_exprs

        source = opts.get("source", "body")
        action = opts.get("action", "drop")
        if action not in ("drop", "flag"):
            raise ConfigError(
                f"encoding_gate action must be drop|flag, got {action!r}"
            )

        def _gate(df):
            ok = _encoding_exprs(F.col(source))["encoding_ok"]
            if action == "drop":
                return df.where(F.col(source).isNotNull() & ok)
            return df.withColumn("encoding_ok", ok)

        return _gate
    raise ConfigError(f"unknown processor kind {kind!r}")


# --------------------------------------------------------------------------


@dataclass
class PipelineResult:
    name: str
    sink_root: str
    sink_counts: dict[str, int] = field(default_factory=dict)


@dataclass
class RunResult:
    telemetry: PipelineTelemetry
    pipelines: dict[str, PipelineResult] = field(default_factory=dict)

    def sink_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for p in self.pipelines.values():
            out.update(p.sink_counts)
        return out


class BatchPipelineRunner:
    """Execute a CollectorConfig as one Spark batch job per pipeline."""

    def __init__(self, spark: SparkSession, config: CollectorConfig, out_root: str):
        self.spark = spark
        self.config = config
        self.out_root = out_root
        self.telemetry = PipelineTelemetry()
        self._connector_frames: dict[str, list[DataFrame]] = {}
        self._epoch_sinks: dict[str, IdempotentParquetSink] = {}
        self._stage_chains: dict[str, list[tuple[str, bool]]] = {}

    # -- receivers: shared instance per name (S4) --
    def _receiver_frames(self) -> dict[str, DataFrame]:
        uses: dict[str, int] = {}
        for p in self.config.pipelines.values():
            for r in p.receivers:
                if r in self.config.receivers:
                    uses[r] = uses.get(r, 0) + 1
        frames: dict[str, DataFrame] = {}
        for name, n in uses.items():
            c = self.config.receivers[name]
            df = _build_receiver(self.spark, c.kind, c.options)
            auth_name = c.options.get("auth")
            if auth_name:
                # server authenticator at the receiver boundary: validated
                # by config.validate() to name an ENABLED extension
                # (configauth.GetServerAuthenticator semantics); refused
                # rows are counted on this receiver's obsreport counter and
                # never enter any pipeline (extension/auth/server.go:32-38)
                from ..operators.clientauth import AUTH_OK_COL, build_authenticator

                ext = self.config.extensions[auth_name]
                authenticator = build_authenticator(ext.kind, ext.options)
                df = authenticator.authenticate(
                    df, metadata_col=c.options.get("metadata_col", "request_metadata")
                )
                if self.config.telemetry_level == "none":
                    # metering off (configtelemetry LevelNone) — the GATE
                    # still applies; only the counters disappear
                    df = df.where(F.col(AUTH_OK_COL)).drop(AUTH_OK_COL)
                else:
                    # own namespace: a receiver and a pipeline may share a
                    # name, and the pipeline boundary observes under
                    # 'receiver/<pipeline>' — a colliding key would
                    # silently overwrite these refused counters
                    df = self.telemetry.observe_auth(
                        df, f"receiver_auth/{name}", AUTH_OK_COL
                    ).drop(AUTH_OK_COL)
            if n > 1:
                # shared receiver read once; persist so each consuming
                # pipeline's job reuses the materialized scan
                df = df.persist()
            frames[name] = df
        return frames

    def _apply_connector(self, name: str, df: DataFrame) -> DataFrame:
        """Connector factory at the pipeline bridge. ``forward`` passes
        the frame through (forwardconnector/forward.go:75-88); ``count``
        TRANSFORMS at the bridge the way a real connector is both an
        exporter of pipeline A and a receiver of pipeline B with its own
        signal type (connector/connector.go:324-391): records in, metric
        points out."""
        c = self.config.connectors[name]
        if c.kind == "forward":
            return df
        if c.kind == "count":
            from ..operators.metrics import count_connector

            attrs = tuple(c.options.get("attributes") or ("event_type",))
            return count_connector(
                df,
                attrs=attrs,
                metric_name=c.options.get("metric_name", "log.record.count"),
            )
        raise ConfigError(f"unknown connector kind {c.kind!r}")

    def run(self, epoch_id: int = 0) -> RunResult:
        result = RunResult(telemetry=self.telemetry)
        receivers = self._receiver_frames()

        for pname in self.config.topo_order():
            p = self.config.pipelines[pname]
            inputs: list[DataFrame] = []
            for r in p.receivers:
                if r in receivers:
                    inputs.append(receivers[r])
                elif r in self._connector_frames:
                    inputs.extend(self._connector_frames[r])
                else:
                    raise ConfigError(
                        f"pipeline {pname!r}: connector {r!r} has no upstream data"
                    )
            df = inputs[0]
            for other in inputs[1:]:
                df = df.unionByName(other)
            # service::telemetry::metrics::level gates obsreport grain
            # (configtelemetry.go:11-25): none — no counters; basic —
            # receiver/exporter boundaries only; normal+ — every stage
            level = self.config.telemetry_level
            # detailed adds content-byte sums to the SAME observation —
            # the reference's detailed-gated size metrics
            # (configtelemetry.go:20-25); zero extra passes either way
            def _bytes_col(frame: DataFrame) -> str | None:
                if level != "detailed":
                    return None
                for c in ("body", "text"):
                    if c in frame.columns:
                        return c
                return None

            if level != "none":
                df = self.telemetry.observe(
                    df, f"receiver/{pname}", bytes_col=_bytes_col(df)
                )

            # per-pipeline processor instances (T6); each stage boundary is
            # observed so per-processor accepted/dropped counters ride the
            # same job (obsreport_processor.go:237-295 grain)
            chain: list[tuple[str, bool]] = [(f"receiver/{pname}", True)]
            # send_batch_max_size is a per-WRITE cap, applied as a write
            # option on THIS pipeline's sinks only (a session-conf mutation
            # would leak the cap across pipelines — per-pipeline processor
            # isolation, docs/design.md:121-152)
            write_cap: int | None = None
            md_keys: list[str] = []
            md_limit = 1000
            for proc_name in p.processors:
                c = self.config.processors[proc_name]
                if c.kind == "batch" and c.options.get("send_batch_max_size"):
                    write_cap = int(c.options["send_batch_max_size"])
                if c.kind == "batch" and c.options.get("metadata_keys"):
                    # write half of metadata_keys batching: files split per
                    # value-set via partitionBy (batch_processor.go:65-75)
                    md_keys = list(c.options["metadata_keys"])
                    md_limit = int(
                        c.options.get("metadata_cardinality_limit", 1000)
                    )
                df = _build_processor(self.spark, c.kind, c.options)(df)
                stage = f"processor/{pname}/{proc_name}"
                if level in ("normal", "detailed"):
                    df = self.telemetry.observe(
                        df, stage, bytes_col=_bytes_col(df)
                    )
                    # parse changes the accounting unit (pages → records),
                    # so dropped is only derivable across unit-preserving
                    # stages
                    chain.append((stage, c.kind != "parse"))
            if level in ("normal", "detailed"):
                df = self.telemetry.observe(
                    df, f"processor/{pname}", bytes_col=_bytes_col(df)
                )
            self._stage_chains[pname] = chain

            # split exporters into connectors vs sinks
            routes: list[Route] = []
            # per-exporter codec (configcompression analog); validate()
            # already guaranteed all sink exporters in this pipeline agree
            compression: str | None = None
            for e in p.exporters:
                if e in self.config.exporters:
                    compression = (
                        self.config.exporters[e].options.get("compression")
                        or compression
                    )
            for e in p.exporters:
                if e in self.config.connectors:
                    self._connector_frames.setdefault(e, []).append(
                        self._apply_connector(e, df)
                    )
                    continue
                c = self.config.exporters[e]
                if c.options.get("all"):
                    routes.append(Route(e, kind="all"))
                elif c.options.get("default"):
                    routes.append(Route(e, kind="default"))
                elif "predicate" in c.options:
                    routes.append(Route(e, predicate=c.options["predicate"]))
                else:
                    routes.append(Route(e, kind="all"))

            if not routes:
                continue  # connector-only pipeline

            router = FanoutRouter(routes)
            # persist across write + lineage: without it the lineage
            # aggregation would re-run parse→enrich→route end to end — a
            # second full input scan per epoch at 100 TB (the streaming
            # path already persists before fan-out, stream.py)
            assigned = router.assign(df).persist()
            try:
                if md_keys:
                    # metadata_cardinality_limit (config.go:51-56): the
                    # reference's batcher errors past the combination cap
                    # at runtime; here it is ONE bounded count-distinct
                    # over the already-persisted routed frame (key tuples
                    # are config-chosen low-cardinality columns)
                    n_combos = assigned.select(
                        F.count_distinct(F.struct(*md_keys)).alias("n")
                    ).collect()[0]["n"]
                    if n_combos > md_limit:
                        raise ConfigError(
                            f"batch metadata_keys {md_keys}: "
                            f"{n_combos} metadata-value combinations exceed "
                            f"metadata_cardinality_limit={md_limit}"
                        )
                sink_root = f"{self.out_root}/{pname}"
                sink = IdempotentParquetSink(sink_root, name=pname)
                self._epoch_sinks[pname] = sink
                router.write_partitioned(
                    assigned,
                    sink,
                    epoch_id=epoch_id,
                    max_records_per_file=write_cap,
                    partition_keys=md_keys or None,
                    compression=(
                        "uncompressed" if compression == "none" else compression
                    ),
                )

                # exporter counters from what actually landed (obsreport
                # "sent"): the write observed its own per-sink counts into
                # the commit marker — read the tiny marker json, never
                # re-scan the files just written (VERDICT r1 #3)
                counts = {
                    s: int(n)
                    for s, n in sink.epoch_meta(epoch_id).get("per_sink", {}).items()
                    if n > 0
                }
                if level != "none":
                    for s, n in counts.items():
                        self.telemetry.record_sent(s, n)
                write_lineage(
                    assigned, f"{self.out_root}/_lineage", self.telemetry.run_id, epoch_id
                )
            finally:
                assigned.unpersist()
            result.pipelines[pname] = PipelineResult(pname, sink_root, counts)

        self.telemetry.harvest()
        # derive per-processor dropped = in − out across unit-preserving
        # boundaries (a filter's drop count; enrich/batch stages show 0)
        for chain in self._stage_chains.values():
            for (prev, _), (cur, unit_preserving) in zip(chain, chain[1:]):
                if unit_preserving:
                    delta = (
                        self.telemetry.counters(prev).accepted
                        - self.telemetry.counters(cur).accepted
                    )
                    self.telemetry.counters(cur).dropped = max(delta, 0)
        for df in receivers.values():
            df.unpersist()
        return result

    def read_sink(self, pipeline: str, sink_name: str) -> DataFrame:
        sink = self._epoch_sinks[pipeline]
        epochs = sink.committed_epochs()
        if not epochs:
            # same guard as FanoutRouter.read_sink — a zero-path parquet
            # read fails with an opaque schema-inference error instead
            raise FileNotFoundError(f"no committed epochs under {sink.root}")
        df = self.spark.read.option("basePath", sink.data_dir).parquet(
            *[f"{sink.data_dir}/epoch={e}" for e in epochs]
        )
        return df.where(F.col("sink") == sink_name).drop("sink", "epoch")
