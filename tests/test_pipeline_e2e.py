"""End-to-end pipeline tests: YAML config → compiled DAG → sinks, with
obsreport-style count parity against an independent pandas oracle
(obsreporttest.CheckExporterLogs analog, obsreporttest.go:93-160)."""

import re

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.fixtures.pages import generate_pages_pandas
from opentelemetry_collector_spark.plans import (
    BatchPipelineRunner,
    ConfigError,
    load_config,
)

N = 500

CFG = """
receivers:
  pages_synthetic:
    n_rows: {n}
processors:
  parse:
    engine: sql
  transform/normalize:
    kind: transform
    statements:
      - 'set(attributes["source"], "web")'
  filter/drop403:
    kind: filter
    drop_where: 'attributes["status"] == "403"'
  enrich_geo: {{}}
  enrich_lang: {{}}
  batch:
    partitions: 8
exporters:
  sink_errors:
    kind: parquet
    predicate: "severity_number >= 17"
  sink_access:
    kind: parquet
    predicate: 'attributes["method"] != nil'
  sink_default:
    kind: parquet
    default: true
  sink_all:
    kind: parquet
    all: true
service:
  pipelines:
    logs:
      receivers: [pages_synthetic]
      processors: [parse, transform/normalize, filter/drop403, enrich_geo, enrich_lang, batch]
      exporters: [sink_errors, sink_access, sink_default, sink_all]
"""


def oracle_counts(n: int) -> dict:
    """Independent pandas oracle over the same deterministic input
    (FIXTURES.md §5: expected per-sink counts computed independently)."""
    pdf = generate_pages_pandas(np.arange(n))
    access_re = re.compile(
        r'^(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}) - - \[([^\]]+)\] '
        r'"(GET|POST|PUT|DELETE|HEAD) (\S+) HTTP/[0-9.]+" (\d{3}) (\d+)$'
    )
    applog_re = re.compile(
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z "
        r"((?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL))[2-4]? \["
    )
    sev = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17, "FATAL": 21}
    counts = {"sink_errors": 0, "sink_access": 0, "sink_default": 0, "sink_all": 0}
    for text in pdf["text"]:
        for line in text.split("\n"):
            if not line:
                continue
            m_acc = access_re.match(line)
            if m_acc and m_acc.group(5) == "403":
                continue  # dropped by filter/drop403
            # kv lines also carry a status attribute (FIXTURES.md §2)
            m_kv = re.match(r'^key1=\S+ key2="[^"]*" status=(\d+)$', line)
            if m_kv and m_kv.group(1) == "403":
                continue
            m_app = applog_re.match(line)
            sev_num = sev.get(m_app.group(1), 0) if m_app else 0
            matched = False
            if sev_num >= 17:
                counts["sink_errors"] += 1
                matched = True
            if m_acc:
                counts["sink_access"] += 1
                matched = True
            if not matched:
                counts["sink_default"] += 1
            counts["sink_all"] += 1
    return counts


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    cfg = load_config(CFG.format(n=N))
    runner = BatchPipelineRunner(spark, cfg, str(tmp_path_factory.mktemp("e2e")))
    return runner, runner.run()


def test_count_parity_vs_oracle(run):
    runner, result = run
    want = oracle_counts(N)
    got = result.sink_counts()
    assert got == want


def test_telemetry_counters(run):
    runner, result = run
    t = result.telemetry.as_dict()
    # receiver accepted = pages in; processor accepted = records after stages
    assert t["stages"]["receiver/logs"]["accepted"] == N
    proc = t["stages"]["processor/logs"]["accepted"]
    want = oracle_counts(N)
    # processor output = sink_all (unconditional copy) count
    assert proc == want["sink_all"]
    for s in ("sink_errors", "sink_access", "sink_default", "sink_all"):
        assert t["stages"][f"exporter/{s}"]["sent"] == want[s]


def test_processor_dropped_counter(run):
    """O2: per-processor dropped = in − out across unit-preserving
    stages, independently checked against the pandas oracle's 403-line
    count (obsreporttest.CheckProcessorLogs analog)."""
    runner, result = run
    st = result.telemetry.as_dict()["stages"]
    pdf = generate_pages_pandas(np.arange(N))
    n403 = 0
    for text in pdf["text"]:
        for line in text.split("\n"):
            if not line:
                continue
            if re.match(r'^\d+\.\d+\.\d+\.\d+ - - \[[^\]]+\] "\w+ \S+ HTTP/[0-9.]+" 403 \d+$', line):
                n403 += 1
            elif re.match(r'^key1=\S+ key2="[^"]*" status=403$', line):
                n403 += 1
    filt = st["processor/logs/filter/drop403"]
    assert filt["dropped"] == n403 > 0
    assert st["processor/logs/transform/normalize"]["dropped"] == 0
    assert st["processor/logs/enrich_geo"]["dropped"] == 0


def test_lineage_written(spark, run):
    runner, result = run
    lin = spark.read.parquet(f"{runner.out_root}/_lineage")
    want = oracle_counts(N)
    got = {
        r["sink"]: r["total"]
        for r in lin.groupBy("sink").agg(F.sum("items").alias("total")).collect()
    }
    assert got == want


def test_transform_applied(spark, run):
    runner, result = run
    df = runner.read_sink("logs", "sink_all")
    assert df.where(F.element_at("attributes", "source") != "web").count() == 0
    # enrichment present
    assert df.where(F.col("resource.country") == "").count() == 0
    assert (
        df.where(F.element_at("attributes", "lang_family").isNotNull()).count() > 0
    )


def test_filter_applied(spark, run):
    runner, result = run
    df = runner.read_sink("logs", "sink_all")
    assert df.where(F.element_at("attributes", "status") == "403").count() == 0


def test_config_validation_errors():
    with pytest.raises(ConfigError, match="unknown receiver"):
        load_config(
            {
                "exporters": {"x": {"kind": "parquet"}},
                "service": {"pipelines": {"p": {"receivers": ["nope"], "exporters": ["x"]}}},
            }
        )
    with pytest.raises(ConfigError, match="at least one exporter"):
        load_config(
            {
                "receivers": {"r": {"kind": "pages_synthetic", "n_rows": 1}},
                "service": {"pipelines": {"p": {"receivers": ["r"], "exporters": []}}},
            }
        )


def test_connector_cycle_detection():
    """Cycle error mirrors service/graph.go:315-353."""
    cfg = {
        "receivers": {"r": {"kind": "pages_synthetic", "n_rows": 1}},
        "connectors": {"fwd/a": {"kind": "forward"}, "fwd/b": {"kind": "forward"}},
        "exporters": {"x": {"kind": "parquet"}},
        "service": {
            "pipelines": {
                "p1": {"receivers": ["r", "fwd/b"], "exporters": ["fwd/a"]},
                "p2": {"receivers": ["fwd/a"], "exporters": ["fwd/b", "x"]},
            }
        },
    }
    with pytest.raises(ConfigError, match="cycle detected"):
        load_config(cfg)


def test_forward_connector(spark, tmp_path):
    """T4: exporter-end of pipeline A bridges to receiver-end of B
    (connector/forwardconnector/forward.go:75-88)."""
    cfg = load_config(
        {
            "receivers": {"pages_synthetic": {"n_rows": 120}},
            "processors": {
                "parse": {},
                "filter/errs": {"kind": "filter", "keep_where": "severity_number >= 17"},
            },
            "connectors": {"forward": {}},
            "exporters": {"sink_a": {"kind": "parquet", "all": True},
                          "sink_b": {"kind": "parquet", "all": True}},
            "service": {
                "pipelines": {
                    "ingest": {
                        "receivers": ["pages_synthetic"],
                        "processors": ["parse"],
                        "exporters": ["forward", "sink_a"],
                    },
                    "errors": {
                        "receivers": ["forward"],
                        "processors": ["filter/errs"],
                        "exporters": ["sink_b"],
                    },
                }
            },
        }
    )
    assert cfg.topo_order() == ["ingest", "errors"]
    runner = BatchPipelineRunner(spark, cfg, str(tmp_path / "fwd"))
    result = runner.run()
    all_recs = runner.read_sink("ingest", "sink_a")
    errs = runner.read_sink("errors", "sink_b")
    assert errs.count() == all_recs.where(F.col("severity_number") >= 17).count()


def test_shared_receiver_instance(spark, tmp_path):
    """S4: one receiver feeding two pipelines is read once and both see
    identical data (internal/sharedcomponent analog)."""
    cfg = load_config(
        {
            "receivers": {"pages_synthetic": {"n_rows": 60}},
            "processors": {"parse": {}},
            "exporters": {"s1": {"kind": "parquet", "all": True},
                          "s2": {"kind": "parquet", "all": True}},
            "service": {
                "pipelines": {
                    "a": {"receivers": ["pages_synthetic"], "processors": ["parse"], "exporters": ["s1"]},
                    "b": {"receivers": ["pages_synthetic"], "processors": ["parse"], "exporters": ["s2"]},
                }
            },
        }
    )
    runner = BatchPipelineRunner(spark, cfg, str(tmp_path / "shared"))
    result = runner.run()
    assert result.pipelines["a"].sink_counts["s1"] == result.pipelines["b"].sink_counts["s2"]


def test_runner_epoch_single_scan_of_routed_plan(spark, tmp_path, monkeypatch):
    """The runner's lineage write must read the PERSISTED routed frame —
    not re-run parse→enrich→route end to end (a second full input scan
    per epoch at 100 TB). Locked by spying on write_lineage: at call time
    the routed frame is persisted and the lineage plan reads
    InMemoryRelation, not the source scan."""
    import opentelemetry_collector_spark.plans.compiler as compiler_mod
    from opentelemetry_collector_spark.streaming.telemetry import lineage_frame

    captured = {}
    orig = compiler_mod.write_lineage

    def spy(assigned, path, run_id, epoch_id):
        captured["persisted"] = assigned.storageLevel.useMemory
        plan = (
            lineage_frame(assigned, run_id, epoch_id)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        captured["plan"] = plan
        return orig(assigned, path, run_id, epoch_id)

    monkeypatch.setattr(compiler_mod, "write_lineage", spy)
    cfg = load_config(CFG.format(n=100))
    runner = BatchPipelineRunner(spark, cfg, str(tmp_path / "epoch-jobs"))
    result = runner.run()
    assert captured["persisted"], "routed frame not persisted across write+lineage"
    assert "InMemoryRelation" in captured["plan"]
    # counters still exact
    assert result.sink_counts() == oracle_counts(100)


def test_per_pipeline_write_caps_are_isolated(spark, tmp_path):
    """Two pipelines with different send_batch_max_size in ONE session get
    independently-capped output files — the cap is a per-write option,
    never a session-conf mutation that leaks across pipelines
    (per-pipeline processor isolation, docs/design.md:121-152)."""
    import pyarrow.parquet as pq
    import glob

    cfg_txt = """
receivers:
  pages_synthetic:
    n_rows: 60
processors:
  parse:
    engine: sql
  batch/small:
    kind: batch
    partitions: 4
    send_batch_max_size: 10
  batch/big:
    kind: batch
    partitions: 4
    send_batch_max_size: 500
exporters:
  sink_a:
    kind: parquet
    all: true
  sink_b:
    kind: parquet
    all: true
service:
  pipelines:
    capped:
      receivers: [pages_synthetic]
      processors: [parse, batch/small]
      exporters: [sink_a]
    roomy:
      receivers: [pages_synthetic]
      processors: [parse, batch/big]
      exporters: [sink_b]
"""
    runner = BatchPipelineRunner(spark, load_config(cfg_txt), str(tmp_path / "caps"))
    runner.run()

    def rows_per_file(pipeline):
        d = runner._epoch_sinks[pipeline].data_dir
        files = glob.glob(f"{d}/epoch=0/sink=*/part-*.parquet")
        assert files
        return [pq.read_metadata(f).num_rows for f in files]

    capped = rows_per_file("capped")
    roomy = rows_per_file("roomy")
    assert max(capped) <= 10
    # the small cap did NOT leak into the sibling pipeline's write
    assert max(roomy) > 10
    assert max(roomy) <= 500


def test_harvest_skips_unmaterialized_observations(spark):
    """``harvest()`` must NOT block on an observation whose frame never ran
    an action (``Observation.get`` waits forever) — a connector-only
    pipeline whose frame is dropped, or a pipeline the runner skips,
    leaves such observations behind. Harvest returns promptly, counters
    stay 0 for the dead stage and land for the live one."""
    import threading

    from opentelemetry_collector_spark.streaming.telemetry import PipelineTelemetry

    t = PipelineTelemetry()
    live = t.observe(spark.range(10).toDF("x"), "receiver/live")
    t.observe(spark.range(99).toDF("x"), "receiver/dead")  # never actioned
    assert live.count() == 10

    done = threading.Event()

    def run():
        t.harvest()
        done.set()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert done.wait(30), "harvest() blocked on an unmaterialized observation"
    assert t.counters("receiver/live").accepted == 10
    assert t.counters("receiver/dead").accepted == 0


def test_grok_processor_kind(spark, tmp_path):
    """A config-declared grok processor extracts typed fields from the
    parsed body (filelog regex_parser analog); bad patterns fail at
    config load."""
    cfg = load_config(
        """
receivers:
  pages_synthetic: {n_rows: 40}
processors:
  parse: {engine: sql}
  grok/clf:
    kind: grok
    source: body
    pattern: '^%{IPV4:g_ip} - - \\[%{HTTPDATE:g_ts}\\] "%{HTTPMETHOD:g_m} %{NOTSPACE:g_p} HTTP/%{NUMBER:g_v}" %{INT:g_status:int} %{INT:g_bytes:int}$'
exporters:
  out: {kind: parquet, all: true}
service:
  pipelines:
    logs:
      receivers: [pages_synthetic]
      processors: [parse, grok/clf]
      exporters: [out]
"""
    )
    runner = BatchPipelineRunner(spark, cfg, str(tmp_path / "grok"))
    runner.run()
    df = runner.read_sink("logs", "out")
    hits = df.where(F.col("g_ip").isNotNull())
    assert hits.count() > 0
    # typed capture agrees with the parse engine's own attribute
    assert (
        hits.where(
            F.col("g_status").cast("string") != F.element_at("attributes", "status")
        ).count()
        == 0
    )
    # non-access lines: NULL captures, rows retained
    assert df.where(F.col("g_ip").isNull()).count() > 0
    bad = load_config(
        """
receivers:
  pages_synthetic: {n_rows: 1}
processors:
  grok/bad: {kind: grok, pattern: '%{NOPE:x}'}
exporters:
  out: {kind: parquet, all: true}
service:
  pipelines:
    logs: {receivers: [pages_synthetic], processors: [grok/bad], exporters: [out]}
"""
    )
    with pytest.raises(ConfigError, match="grok"):
        BatchPipelineRunner(spark, bad, str(tmp_path / "grok-bad")).run()


def test_count_connector_in_graph(spark, tmp_path):
    """T5 in the pipeline GRAPH: a count connector is the exporter end of
    the logs pipeline and the receiver end of a metrics pipeline, with
    its own signal transform at the bridge (connector/connector.go:
    324-391) — records in, metric points out."""
    cfg = load_config(
        {
            "receivers": {"pages_synthetic": {"n_rows": 120}},
            "processors": {"parse": {}},
            "connectors": {
                "count": {"attributes": ["severity_text"], "metric_name": "rec.count"}
            },
            "exporters": {
                "sink_logs": {"kind": "parquet", "all": True},
                "sink_metrics": {"kind": "parquet", "all": True},
            },
            "service": {
                "pipelines": {
                    "logs": {
                        "receivers": ["pages_synthetic"],
                        "processors": ["parse"],
                        "exporters": ["count", "sink_logs"],
                    },
                    "metrics": {
                        "receivers": ["count"],
                        "processors": [],
                        "exporters": ["sink_metrics"],
                    },
                }
            },
        }
    )
    assert cfg.topo_order() == ["logs", "metrics"]
    runner = BatchPipelineRunner(spark, cfg, str(tmp_path / "cnt"))
    runner.run()
    logs = runner.read_sink("logs", "sink_logs")
    points = runner.read_sink("metrics", "sink_metrics")
    got = {
        r["severity_text"]: r["point_count"]
        for r in points.select("severity_text", "point_count").collect()
    }
    want = {
        r["severity_text"]: r["n"]
        for r in logs.groupBy("severity_text").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    assert points.select("metric_name").distinct().collect()[0][0] == "rec.count"


def test_unknown_connector_kind_rejected(spark, tmp_path):
    cfg = load_config(
        {
            "receivers": {"pages_synthetic": {"n_rows": 10}},
            "processors": {"parse": {}},
            "connectors": {"teleport": {}},
            "exporters": {"s": {"kind": "parquet", "all": True}},
            "service": {
                "pipelines": {
                    "a": {
                        "receivers": ["pages_synthetic"],
                        "processors": ["parse"],
                        "exporters": ["teleport"],
                    },
                    "b": {"receivers": ["teleport"], "processors": [], "exporters": ["s"]},
                }
            },
        }
    )
    with pytest.raises(ConfigError, match="unknown connector kind"):
        BatchPipelineRunner(spark, cfg, str(tmp_path / "bad")).run()


def test_curation_processor_kinds_from_config(spark):
    """Config-declarable curation processors: redact_pii rewrites the
    body in place (with optional counters), c4_clean edits lines /
    drops failing pages, badwords drops or flags — matching the
    oracle'd operators' semantics via the shared expressions."""
    from opentelemetry_collector_spark.plans.compiler import _build_processor
    from opentelemetry_collector_spark.plans.config import ConfigError

    df = spark.createDataFrame(
        [
            (
                "u1",
                "Contact me at bob@example.com now please today ok.\nshort",
            ),
            ("u2", "This clean page has plenty of words right here.\n"
                   "Another proper sentence with enough words too.\n"
                   "And a third good line to pass the rule."),
            ("u3", "this page mentions badterm once in passing here."),
        ],
        "url string, body string",
    )
    red = _build_processor(spark, "redact_pii", {"counters": True})(df)
    r1 = {r["url"]: r for r in red.collect()}
    assert "bob@example.com" not in r1["u1"]["body"]
    assert r1["u1"]["n_emails"] == 1 and r1["u2"]["n_emails"] == 0

    c4 = _build_processor(spark, "c4_clean", {"drop_failing": True})(df)
    kept = {r["url"] for r in c4.collect()}
    assert kept == {"u2"}  # u1 has 1 valid line (<3), u3 has 0 terminal-punct... 
    c4f = _build_processor(spark, "c4_clean", {})(df)
    flags = {r["url"]: r["c4_ok"] for r in c4f.collect()}
    assert flags == {"u1": False, "u2": True, "u3": False}

    bw = _build_processor(spark, "badwords", {"words": ["badterm"]})(df)
    assert {r["url"] for r in bw.collect()} == {"u1", "u2"}
    bwf = _build_processor(
        spark, "badwords", {"words": ["badterm"], "action": "flag"}
    )(df)
    assert {r["url"]: r["badwords_ok"] for r in bwf.collect()} == {
        "u1": True, "u2": True, "u3": False
    }
    with pytest.raises(ConfigError):
        _build_processor(spark, "badwords", {})
    with pytest.raises(ConfigError):
        _build_processor(spark, "badwords", {"words": ["x"], "action": "zap"})

    enc_df = spark.createDataFrame(
        [
            ("u1", "clean ascii body."),
            ("u2", "mojibake CafÃ© artifact"),
            ("u3", "lossy�decode"),
        ],
        "url string, body string",
    )
    eg = _build_processor(spark, "encoding_gate", {})(enc_df)
    assert {r["url"] for r in eg.collect()} == {"u1"}
    egf = _build_processor(spark, "encoding_gate", {"action": "flag"})(enc_df)
    assert {r["url"]: r["encoding_ok"] for r in egf.collect()} == {
        "u1": True, "u2": False, "u3": False
    }
    with pytest.raises(ConfigError):
        _build_processor(spark, "encoding_gate", {"action": "zap"})


def test_metadata_keys_batching_never_mixes_key_values(spark, tmp_path):
    """batch processor metadata_keys (batch_processor.go:65-75): no output
    batch ever mixes records with different values of the declared keys.
    Spark mapping: the batch stage co-locates each value-set and the writer
    lays out partitionBy(sink, *keys), so a file IS a single-value batch."""
    import glob

    cfg_txt = """
receivers:
  pages_synthetic:
    n_rows: 80
processors:
  parse:
    engine: sql
  batch/md:
    kind: batch
    partitions: 4
    metadata_keys: [severity_text]
exporters:
  sink_a:
    kind: parquet
    all: true
service:
  pipelines:
    md:
      receivers: [pages_synthetic]
      processors: [parse, batch/md]
      exporters: [sink_a]
"""
    import pyarrow.parquet as pq

    runner = BatchPipelineRunner(spark, load_config(cfg_txt), str(tmp_path / "md"))
    result = runner.run()
    d = runner._epoch_sinks["md"].data_dir
    files = glob.glob(f"{d}/epoch=0/sink=*/severity_text=*/part-*.parquet")
    assert files, "expected per-key-value partition directories"
    vals = {f.split("severity_text=")[1].split("/")[0] for f in files}
    assert len(vals) >= 2, f"synthetic corpus should span severities, got {vals}"
    # the key lives in the DIRECTORY, not the file — structurally no file
    # can mix values (the reference's invariant, batch_processor.go:65-75)
    for f in files[:4]:
        assert "severity_text" not in pq.read_schema(f).names
    # nothing lost to the layout change: read-back row count matches the
    # exporter's sent counter (records with empty severity land under the
    # hive default partition, still counted)
    back = spark.read.parquet(f"{d}/epoch=0")
    assert back.count() == result.sink_counts()["sink_a"]


def test_metadata_cardinality_limit_rejects_high_cardinality(spark, tmp_path):
    """metadata_cardinality_limit (batchprocessor config.go:51-56): the
    reference errors when client-metadata combinations exceed the cap; the
    runner mirrors it with one bounded count-distinct before the write."""
    cfg_txt = """
receivers:
  pages_synthetic:
    n_rows: 80
processors:
  parse:
    engine: sql
  batch/md:
    kind: batch
    metadata_keys: [severity_text]
    metadata_cardinality_limit: 1
exporters:
  sink_a:
    kind: parquet
    all: true
service:
  pipelines:
    md:
      receivers: [pages_synthetic]
      processors: [parse, batch/md]
      exporters: [sink_a]
"""
    runner = BatchPipelineRunner(spark, load_config(cfg_txt), str(tmp_path / "mdcap"))
    with pytest.raises(ConfigError, match="metadata_cardinality_limit"):
        runner.run()


def test_exporter_compression_lands_in_parquet_footers(spark, tmp_path):
    """configcompression analog (compressionType.go:21-28): an exporter's
    `compression` choice is applied as a per-WRITE parquet codec option
    (never the session conf, which would leak across pipelines)."""
    import glob

    import pyarrow.parquet as pq

    cfg_txt = """
receivers:
  pages_synthetic:
    n_rows: 40
processors:
  parse:
    engine: sql
exporters:
  sink_gz:
    kind: parquet
    all: true
    compression: gzip
service:
  pipelines:
    gz:
      receivers: [pages_synthetic]
      processors: [parse]
      exporters: [sink_gz]
"""
    runner = BatchPipelineRunner(spark, load_config(cfg_txt), str(tmp_path / "gz"))
    runner.run()
    d = runner._epoch_sinks["gz"].data_dir
    files = glob.glob(f"{d}/epoch=0/sink=*/part-*.parquet")
    assert files
    codecs = {
        pq.ParquetFile(f).metadata.row_group(0).column(0).compression
        for f in files
    }
    assert codecs == {"GZIP"}


def test_exporter_compression_validation():
    """zlib/deflate are reference wire codecs with no parquet equivalent;
    unknown names rejected; mixed codecs within one pipeline rejected
    (they share a single fan-out write)."""
    base = """
receivers:
  pages_synthetic:
    n_rows: 10
exporters:
  a:
    kind: parquet
    all: true
    compression: {ca}
  b:
    kind: parquet
    all: true
    compression: {cb}
service:
  pipelines:
    p:
      receivers: [pages_synthetic]
      exporters: [a, b]
"""
    with pytest.raises(ConfigError, match="no parquet equivalent"):
        load_config(base.format(ca="zlib", cb="zlib"))
    with pytest.raises(ConfigError, match="unsupported compression"):
        load_config(base.format(ca="brotli9000", cb="gzip"))
    with pytest.raises(ConfigError, match="conflicting compression"):
        load_config(base.format(ca="gzip", cb="zstd"))
    # agreement (or single declaration) is fine
    load_config(base.format(ca="zstd", cb="zstd"))


def test_telemetry_level_gates_obsreport_grain(spark, tmp_path):
    """service::telemetry::metrics::level (configtelemetry.go:11-25):
    none — no counters at all (the data plane is untouched: sink counts
    stay exact via commit markers); basic — receiver/exporter boundaries
    only; normal (default) — every stage boundary."""
    cfg_txt = """
receivers:
  pages_synthetic:
    n_rows: 60
processors:
  parse:
    engine: sql
exporters:
  sink_a:
    kind: parquet
    all: true
service:
  telemetry:
    metrics:
      level: {level}
  pipelines:
    logs:
      receivers: [pages_synthetic]
      processors: [parse]
      exporters: [sink_a]
"""
    runs = {}
    for level in ("none", "basic", "normal", "detailed"):
        runner = BatchPipelineRunner(
            spark, load_config(cfg_txt.format(level=level)), str(tmp_path / level)
        )
        result = runner.run()
        runs[level] = (result.telemetry.as_dict()["stages"], result.sink_counts())

    none_stages, none_counts = runs["none"]
    basic_stages, basic_counts = runs["basic"]
    normal_stages, normal_counts = runs["normal"]
    # data plane identical at every level
    assert none_counts == basic_counts == normal_counts
    assert none_counts["sink_a"] > 0
    # none: nothing metered
    assert not any(v["accepted"] or v["sent"] for v in none_stages.values())
    # basic: receiver + exporter boundaries only
    assert basic_stages["receiver/logs"]["accepted"] == 60
    assert basic_stages["exporter/sink_a"]["sent"] == basic_counts["sink_a"]
    assert not any(s.startswith("processor/") for s in basic_stages)
    # normal: full stage grain, but no size metrics
    assert normal_stages["processor/logs/parse"]["accepted"] == normal_counts["sink_a"]
    assert all(v["bytes"] == 0 for v in normal_stages.values())
    # detailed: content-byte sums ride the same observations
    det_stages, det_counts = runs["detailed"]
    assert det_counts == normal_counts
    assert det_stages["receiver/logs"]["bytes"] > 0
    assert det_stages["processor/logs/parse"]["bytes"] > 0
    # parse explodes pages into per-line records: boundary byte sums must
    # differ (receiver meters page text, processor meters record bodies)
    assert (
        det_stages["processor/logs/parse"]["bytes"]
        != det_stages["receiver/logs"]["bytes"]
    )

    with pytest.raises(ConfigError, match="unknown level"):
        load_config(cfg_txt.format(level="verbose"))


def test_empty_pipeline_with_metadata_keys_and_compression(spark, tmp_path):
    """Zero-row input through the full runner with the round-5 write
    options (metadata_keys layout + codec): empty epochs must commit
    cleanly — at 100 TB empty route subsets and empty micro-batches are
    routine, not errors."""
    cfg_txt = """
receivers:
  pages_synthetic:
    n_rows: 0
processors:
  parse: {engine: sql}
  batch/md: {kind: batch, metadata_keys: [severity_text]}
exporters:
  a: {kind: parquet, all: true, compression: gzip}
service:
  pipelines:
    p: {receivers: [pages_synthetic], processors: [parse, batch/md], exporters: [a]}
"""
    runner = BatchPipelineRunner(spark, load_config(cfg_txt), str(tmp_path / "mt"))
    result = runner.run()
    assert result.sink_counts() == {}
