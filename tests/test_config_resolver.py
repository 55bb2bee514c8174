"""confmap resolver tests: ${env:}/${file:}/${yaml:} expansion, legacy
${ENVVAR}, ordered multi-source merge — the otelcol/testdata config-corpus
discipline (confmap/resolver.go:42-48, Resolve at resolver.go:145+,
confmap/converter/expandconverter)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans.config import (
    ConfigError,
    load_config,
    resolve_config,
)

ENV = {"PORT": "4317", "SEVERITY": "17", "NAME": "prod", "FLAG": "true"}


# ---------------------------------------------------------------------------
# expansion
# ---------------------------------------------------------------------------

def test_env_whole_string_keeps_type():
    cfg = resolve_config({"a": "${env:PORT}", "b": "${env:FLAG}"}, env=ENV)
    assert cfg["a"] == 4317  # env provider yaml-parses the value
    assert cfg["b"] is True


def test_env_embedded_becomes_string():
    cfg = resolve_config({"endpoint": "host:${env:PORT}/v1"}, env=ENV)
    assert cfg["endpoint"] == "host:4317/v1"


def test_env_miss_defaults_to_empty():
    cfg = resolve_config({"a": "${env:MISSING}"}, env=ENV)
    assert cfg["a"] == ""


def test_env_miss_strict_raises():
    with pytest.raises(ConfigError, match="MISSING"):
        resolve_config({"a": "${env:MISSING}"}, env=ENV, strict_env=True)


def test_legacy_env_form():
    cfg = resolve_config({"a": "svc-${NAME}", "b": "${NAME}"}, env=ENV)
    assert cfg == {"a": "svc-prod", "b": "prod"}


def test_file_provider_and_nesting(tmp_path):
    inner = tmp_path / "inner.yaml"
    inner.write_text("threshold: ${env:SEVERITY}\n")
    cfg = resolve_config({"rules": "${file:%s}" % inner}, env=ENV)
    assert cfg["rules"] == {"threshold": 17}  # typed through two hops


def test_file_provider_missing_raises():
    with pytest.raises(ConfigError, match="not found"):
        resolve_config({"rules": "${file:/no/such/file.yaml}"}, env=ENV)


def test_yaml_provider_inline():
    cfg = resolve_config({"list": "${yaml:[1, 2, 3]}"}, env=ENV)
    assert cfg["list"] == [1, 2, 3]


def test_recursive_expansion_is_bounded():
    env = {"A": "${env:A}"}
    with pytest.raises(ConfigError, match="recursive"):
        resolve_config({"a": "${env:A}"}, env=env)


def test_unknown_scheme_raises():
    # http(s) is a real provider now — use a scheme no provider owns
    with pytest.raises(ConfigError, match="scheme"):
        resolve_config({"a": "${s3:bucket/key}"}, env=ENV)


# ---------------------------------------------------------------------------
# multi-source merge (Conf.Merge: maps merge, scalars/lists override)
# ---------------------------------------------------------------------------

def test_merge_later_source_overrides_scalars():
    cfg = resolve_config(
        [{"a": 1, "nest": {"x": 1, "y": 2}}, {"a": 2, "nest": {"y": 3, "z": 4}}],
        env=ENV,
    )
    assert cfg == {"a": 2, "nest": {"x": 1, "y": 3, "z": 4}}


def test_merge_lists_replace_not_concat():
    cfg = resolve_config([{"l": [1, 2]}, {"l": [3]}], env=ENV)
    assert cfg["l"] == [3]


def test_merge_yaml_string_sources(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("receivers:\n  r: {kind: pages_synthetic, n_rows: 10}\n")
    overlay = "receivers:\n  r: {n_rows: 99}\n"
    cfg = resolve_config([str(base), overlay], env=ENV)
    assert cfg["receivers"]["r"] == {"kind": "pages_synthetic", "n_rows": 99}


def test_non_mapping_source_raises():
    with pytest.raises(ConfigError, match="mapping"):
        resolve_config(["- just\n- a list\n"], env=ENV)


# ---------------------------------------------------------------------------
# end-to-end through load_config (typed tree + validation still apply)
# ---------------------------------------------------------------------------

VALID = """
receivers:
  pages_synthetic:
    n_rows: ${env:ROWS}
processors:
  filter/err:
    kind: filter
    keep_where: "severity_number >= ${env:SEVERITY}"
exporters:
  sink_all:
    kind: parquet
    all: true
service:
  pipelines:
    logs:
      receivers: [pages_synthetic]
      processors: [filter/err]
      exporters: [sink_all]
"""


def test_load_config_expands_and_validates():
    cfg = load_config(VALID, env={**ENV, "ROWS": "25"})
    assert cfg.receivers["pages_synthetic"].options["n_rows"] == 25
    assert (
        cfg.processors["filter/err"].options["keep_where"]
        == "severity_number >= 17"
    )


def test_load_config_merge_overlay_swaps_exporter():
    overlay = {"service": {"pipelines": {"logs": {"receivers": ["pages_synthetic"],
                                                  "processors": [],
                                                  "exporters": ["sink_all"]}}}}
    cfg = load_config([VALID, overlay], env={**ENV, "ROWS": "5"})
    assert cfg.pipelines["logs"].processors == []


def test_load_config_invalid_reference_still_caught():
    bad = VALID.replace("exporters: [sink_all]", "exporters: [nope]")
    with pytest.raises(ConfigError, match="unknown exporter"):
        load_config(bad, env={**ENV, "ROWS": "5"})


def test_http_provider_with_injected_fetcher():
    """confmap/provider/{httpprovider,httpsprovider}: an http(s): source
    URI and embedded ${http:...} values resolve through the injectable
    fetcher (hermetic — no network)."""
    from opentelemetry_collector_spark.plans.config import (
        resolve_config,
        set_http_fetcher,
    )

    pages = {
        "http://cfg.example/base.yaml": "receivers: {pages: {path: /data}}\n",
        "https://cfg.example/token": "sekrit\n",
    }
    set_http_fetcher(lambda url: pages[url])
    try:
        got = resolve_config(
            [
                "http://cfg.example/base.yaml",
                'yaml:exporters: {sink: {auth: "${https://cfg.example/token}"}}',
            ]
        )
    finally:
        set_http_fetcher(None)
    assert got["receivers"]["pages"]["path"] == "/data"
    assert got["exporters"]["sink"]["auth"] == "sekrit"


def test_http_provider_fetch_failure_is_config_error():
    from opentelemetry_collector_spark.plans.config import (
        ConfigError,
        resolve_config,
        set_http_fetcher,
    )
    import pytest as _pytest

    def boom(url):
        raise OSError("connection refused")

    set_http_fetcher(boom)
    try:
        with _pytest.raises(ConfigError, match="http config source"):
            resolve_config("http://cfg.example/missing.yaml")
    finally:
        set_http_fetcher(None)


def test_config_watcher_fires_on_any_source_change(tmp_path):
    """ConfigProvider.Watch analog: the watch digest covers the RESOLVED
    config, so a change in a referenced file: source fires too."""
    from opentelemetry_collector_spark.plans.config import ConfigWatcher

    inc = tmp_path / "inc.yaml"
    inc.write_text("processors: {batch: {partitions: 4}}\n")
    root = tmp_path / "root.yaml"
    root.write_text(
        "receivers: {pages: {path: /data}}\n"
        "exporters: {sink: {all: true}}\n"
        "service: {pipelines: {logs: {receivers: [pages], exporters: [sink]}}}\n"
    )
    w = ConfigWatcher([f"file:{root}", f"file:{inc}"])
    assert w.poll() is None  # unchanged
    inc.write_text("processors: {batch: {partitions: 8}}\n")
    changed = w.poll()
    assert changed is not None
    assert changed["processors"]["batch"]["partitions"] == 8
    assert w.poll() is None  # settles


def test_adjacent_embedded_uris_expand_independently():
    """``${env:A}${env:B}`` is two references, not one URI whose value
    swallows the rest of the string (the fullmatch trap: a lazy value
    group forced over the whole string parses it as env:"NAME}${env:PORT")."""
    cfg = resolve_config({"a": "${env:NAME}${env:PORT}", "b": "${env:NAME}-${env:PORT}"}, env=ENV)
    assert cfg["a"] == "prod4317"
    assert cfg["b"] == "prod-4317"


def test_merge_does_not_mutate_caller_sources():
    """Conf.Merge must never alias a caller's dict into the merged tree —
    the watcher re-resolves the same source objects every poll, and a later
    overlay merging into an aliased nested dict would edit the caller's
    copy in place."""
    base = {"processors": {"batch": {"partitions": 4, "key": "url"}}}
    overlay = {"processors": {"batch": {"partitions": 8}}}
    snap_base = {"processors": {"batch": {"partitions": 4, "key": "url"}}}
    snap_overlay = {"processors": {"batch": {"partitions": 8}}}
    merged = resolve_config([base, overlay], env=ENV)
    assert merged["processors"]["batch"] == {"partitions": 8, "key": "url"}
    assert base == snap_base
    assert overlay == snap_overlay
    # and mutating the merged result must not reach back into the sources
    merged["processors"]["batch"]["partitions"] = 99
    assert base == snap_base and overlay == snap_overlay


def test_watcher_transient_oserror_is_not_a_change(tmp_path):
    """A root file that vanishes mid-flip (editor rename dance) raises
    OSError from open(); the watcher must treat that like any transient
    resolve failure — no change event, next poll sees the rewrite."""
    import os

    from opentelemetry_collector_spark.plans.config import ConfigWatcher

    root = tmp_path / "root.yaml"
    body_v1 = (
        "receivers: {pages: {path: /data}}\n"
        "exporters: {sink: {all: true}}\n"
        "service: {pipelines: {logs: {receivers: [pages], exporters: [sink]}}}\n"
    )
    root.write_text(body_v1)
    w = ConfigWatcher(f"file:{root}")
    os.remove(root)
    assert w.poll() is None  # transient: not a change, not an exception
    root.write_text(body_v1.replace("/data", "/data2"))
    changed = w.poll()
    assert changed is not None
    assert changed["receivers"]["pages"]["path"] == "/data2"


def test_watcher_surfaces_durable_resolve_failure(tmp_path):
    """A durably-broken config must raise after N consecutive failed
    polls (otelcol/collector.go:224-231 terminate-on-reload-error
    contract), while a transient flip stays tolerated."""
    import pytest

    from opentelemetry_collector_spark.plans.config import ConfigError, ConfigWatcher

    cfg = tmp_path / "c.yaml"
    cfg.write_text("receivers: {r: {path: x}}\npipelines: {p: {receiver: r, exporters: []}}\n")
    w = ConfigWatcher(str(cfg), max_consecutive_failures=3)
    assert w.poll() is None  # unchanged

    # transient: invalid for ONE poll, then restored — no raise, no event
    cfg.write_text("{invalid yaml: [")
    assert w.poll() is None
    cfg.write_text("receivers: {r: {path: x}}\npipelines: {p: {receiver: r, exporters: []}}\n")
    assert w.poll() is None  # same digest as before the flip

    # durable: invalid for >= max_consecutive_failures polls → raises
    cfg.write_text("{invalid yaml: [")
    assert w.poll() is None
    assert w.poll() is None
    with pytest.raises(ConfigError, match="consecutive polls"):
        w.poll()
