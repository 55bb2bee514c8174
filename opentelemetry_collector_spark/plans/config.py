"""Pipeline config model — the confmap/otelcol.Config analog.

The reference resolves YAML into a typed Config tree and validates it
before building the graph (otelcol/unmarshaler.go, otelcol/config.go,
cfg.Validate() at otelcol/collector.go:160-162; component-level checks like
batchprocessor/config.go:41-46). We mirror that: yaml.safe_load → dataclass
tree → validate() raising ConfigError with the same class of messages
(unknown component references, empty pipelines, cycles — cycle error
format mirrors service/graph.go:315-353).
"""

from __future__ import annotations

from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class ConfigError(ValueError):
    pass


@dataclass
class ComponentConfig:
    name: str
    kind: str
    options: dict = field(default_factory=dict)


@dataclass
class PipelineConfig:
    name: str
    receivers: list[str]
    processors: list[str]
    exporters: list[str]


@dataclass
class CollectorConfig:
    receivers: dict[str, ComponentConfig]
    processors: dict[str, ComponentConfig]
    exporters: dict[str, ComponentConfig]
    connectors: dict[str, ComponentConfig]
    pipelines: dict[str, PipelineConfig]

    # ------------------------------------------------------------------
    def validate(self) -> None:
        if not self.pipelines:
            raise ConfigError("service.pipelines must contain at least one pipeline")
        for p in self.pipelines.values():
            if not p.receivers:
                raise ConfigError(f"pipeline {p.name!r}: must have at least one receiver")
            if not p.exporters:
                raise ConfigError(f"pipeline {p.name!r}: must have at least one exporter")
            for r in p.receivers:
                if r not in self.receivers and r not in self.connectors:
                    raise ConfigError(f"pipeline {p.name!r}: references unknown receiver {r!r}")
            for pr in p.processors:
                if pr not in self.processors:
                    raise ConfigError(f"pipeline {p.name!r}: references unknown processor {pr!r}")
            for e in p.exporters:
                if e not in self.exporters and e not in self.connectors:
                    raise ConfigError(f"pipeline {p.name!r}: references unknown exporter {e!r}")
        self._check_cycles()

    def pipeline_edges(self) -> dict[str, set[str]]:
        """pipeline → set of downstream pipelines (via connectors)."""
        # connector → pipelines that consume it as receiver
        consumers: dict[str, set[str]] = {}
        for p in self.pipelines.values():
            for r in p.receivers:
                if r in self.connectors:
                    consumers.setdefault(r, set()).add(p.name)
        edges: dict[str, set[str]] = {p: set() for p in self.pipelines}
        for p in self.pipelines.values():
            for e in p.exporters:
                if e in self.connectors:
                    edges[p.name] |= consumers.get(e, set())
        return edges

    def _check_cycles(self) -> None:
        """Cycle detection with a readable error (service/graph.go:315-353)."""
        edges = self.pipeline_edges()
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {n: WHITE for n in edges}
        stack: list[str] = []

        def dfs(n: str) -> list[str] | None:
            color[n] = GRAY
            stack.append(n)
            for m in sorted(edges[n]):
                if color[m] == GRAY:
                    i = stack.index(m)
                    return stack[i:] + [m]
                if color[m] == WHITE:
                    cyc = dfs(m)
                    if cyc:
                        return cyc
            stack.pop()
            color[n] = BLACK
            return None

        for n in sorted(edges):
            if color[n] == WHITE:
                cyc = dfs(n)
                if cyc:
                    raise ConfigError(
                        "cycle detected in pipeline graph: " + " -> ".join(cyc)
                    )

    def topo_order(self) -> list[str]:
        """Kahn topo order of pipelines — components are *built* in reverse
        topological order in the reference so each node gets its downstream
        consumer (service/graph.go:159-223); for batch execution we run in
        forward topo order so connector inputs exist before use."""
        edges = self.pipeline_edges()
        indeg = {n: 0 for n in edges}
        for n, ms in edges.items():
            for m in ms:
                indeg[m] += 1
        ready = sorted(n for n, d in indeg.items() if d == 0)
        out: list[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for m in sorted(edges[n]):
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
        return out


def _parse_components(section: dict | None) -> dict[str, ComponentConfig]:
    out: dict[str, ComponentConfig] = {}
    for name, opts in (section or {}).items():
        opts = dict(opts or {})
        # collector convention: component id is "type" or "type/instance"
        kind = opts.pop("kind", name.split("/")[0])
        out[name] = ComponentConfig(name=name, kind=kind, options=opts)
    return out


def load_config(source: str | dict) -> CollectorConfig:
    """Load from a YAML string/path or an already-parsed dict."""
    if isinstance(source, dict):
        raw = source
    else:
        text = source
        if "\n" not in source and source.endswith((".yaml", ".yml")):
            with open(source) as f:
                text = f.read()
        if yaml is None:
            raise ConfigError("pyyaml not available; pass a dict")
        raw = yaml.safe_load(text)
    if not isinstance(raw, dict):
        raise ConfigError("config root must be a mapping")

    service = raw.get("service", {}) or {}
    pipelines = {}
    for name, spec in (service.get("pipelines") or {}).items():
        spec = spec or {}
        pipelines[name] = PipelineConfig(
            name=name,
            receivers=list(spec.get("receivers") or []),
            processors=list(spec.get("processors") or []),
            exporters=list(spec.get("exporters") or []),
        )
    cfg = CollectorConfig(
        receivers=_parse_components(raw.get("receivers")),
        processors=_parse_components(raw.get("processors")),
        exporters=_parse_components(raw.get("exporters")),
        connectors=_parse_components(raw.get("connectors")),
        pipelines=pipelines,
    )
    cfg.validate()
    return cfg
