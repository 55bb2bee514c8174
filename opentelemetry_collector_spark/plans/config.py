"""Pipeline config model + resolver — the confmap/otelcol.Config analog.

The reference resolves every config through a Resolver
(confmap/resolver.go:145+): retrieve each source URI via scheme providers
(``file:``, ``env:``, ``yaml:``; confmap/provider/*), **merge the maps in
order** (Conf.Merge: nested maps merge recursively, scalars/lists
override), then **expand embedded ``${scheme:value}`` URIs** inside string
values (regexes at resolver.go:42-48, recursion-capped —
errTooManyRecursiveExpansions) plus the legacy ``${ENVVAR}`` form
(confmap/converter/expandconverter). ``resolve_config`` reproduces that
pipeline; ``load_config`` then unmarshals into the typed tree and
validates (otelcol/unmarshaler.go, cfg.Validate() at
otelcol/collector.go:160-162; cycle error format mirrors
service/graph.go:315-353).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class ConfigError(ValueError):
    pass


# scheme name per resolver.go:30-41 (letter, then letters/digits/+/./-)
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]+):(.*)$", re.S)
# embedded provider URI inside a string value (resolver.go:44-45)
_EMBEDDED_URI_RE = re.compile(r"\$\{([A-Za-z][A-Za-z0-9+.-]+):(.*?)\}")
# legacy expandconverter form: ${ENV_VAR} with no scheme
_LEGACY_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")

_MAX_EXPANSIONS = 100  # errTooManyRecursiveExpansions analog

# the intersection of the reference's compression enum
# (configcompression/compressionType.go:21-28) and parquet's codec set;
# "none" maps to parquet's uncompressed
_PARQUET_CODECS = {"gzip", "snappy", "zstd", "none"}

# configtelemetry.Level (config/configtelemetry/configtelemetry.go:11-25)
_TELEMETRY_LEVELS = {"none", "basic", "normal", "detailed"}


def _yaml_load(text: str):
    """yaml.safe_load with parse failures wrapped as ConfigError — a bad
    config must produce a diagnosable config error, not a YAML stack
    trace (found by the parser fuzz tests)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ConfigError(f"invalid YAML in config source: {e}") from e


# injectable http(s) fetcher (confmap/provider/{httpprovider,httpsprovider}
# analog). Tests inject a fake so resolution stays hermetic; the default
# uses urllib with a short timeout.
_HTTP_FETCHER = None


def set_http_fetcher(fn) -> None:
    """Install a ``url -> str`` fetcher for the ``http:``/``https:``
    schemes (None restores the urllib default)."""
    global _HTTP_FETCHER
    _HTTP_FETCHER = fn


def _default_http_fetch(url: str) -> str:
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def _retrieve(scheme: str, value: str, env: dict[str, str], strict_env: bool):
    """Scheme providers (confmap/provider/*): env / file / yaml / http(s)."""
    if scheme == "env":
        if value not in env:
            if strict_env:
                raise ConfigError(f"environment variable {value!r} is not set")
            return ""  # envprovider: os.Getenv semantics — unset → empty
        # the env provider yaml-parses the content, so numeric/bool values
        # keep their type when the URI is the whole string
        raw = env[value]
        return _yaml_load(raw) if raw.strip() else ""
    if scheme == "file":
        if not os.path.exists(value):
            raise ConfigError(f"file {value!r} referenced by file: provider not found")
        with open(value) as f:
            return _yaml_load(f.read())
    if scheme == "yaml":
        return _yaml_load(value)
    if scheme in ("http", "https"):
        fetch = _HTTP_FETCHER or _default_http_fetch
        try:
            body = fetch(f"{scheme}:{value}")
        except Exception as e:  # fetch failures are config errors
            raise ConfigError(f"http config source {scheme}:{value} failed: {e}") from e
        return _yaml_load(body)
    raise ConfigError(f"unsupported config scheme {scheme!r}")


def _expand_str(s: str, env: dict[str, str], strict_env: bool, depth: int):
    if depth > _MAX_EXPANSIONS:
        raise ConfigError("too many recursive expansions in config value")

    # whole-string URI keeps the retrieved value's type (resolver
    # expandValueRecursively: a value that IS one URI resolves typed).
    # match()+end check, NOT fullmatch(): under fullmatch the lazy value
    # group is forced to absorb the rest of the string, so
    # "${env:A}${env:B}" would parse as ONE uri with value "A}${env:B"
    # instead of two adjacent references.
    m = _EMBEDDED_URI_RE.match(s)
    if m and m.end() == len(s):
        got = _retrieve(m.group(1), m.group(2), env, strict_env)
        return _expand_value(got, env, strict_env, depth + 1)

    def sub_uri(mt: re.Match) -> str:
        got = _retrieve(mt.group(1), mt.group(2), env, strict_env)
        got = _expand_value(got, env, strict_env, depth + 1)
        return "" if got is None else str(got)

    out = _EMBEDDED_URI_RE.sub(sub_uri, s)

    def sub_env(mt: re.Match) -> str:
        name = mt.group(1)
        if name not in env:
            if strict_env:
                raise ConfigError(f"environment variable {name!r} is not set")
            return ""
        return env[name]

    out = _LEGACY_ENV_RE.sub(sub_env, out)
    if out != s and (_EMBEDDED_URI_RE.search(out) or _LEGACY_ENV_RE.search(out)):
        # expansion produced further URIs — recurse, bounded
        return _expand_str(out, env, strict_env, depth + 1)
    return out


def _expand_value(v, env: dict[str, str], strict_env: bool, depth: int = 0):
    if isinstance(v, str):
        return _expand_str(v, env, strict_env, depth)
    if isinstance(v, dict):
        return {k: _expand_value(x, env, strict_env, depth) for k, x in v.items()}
    if isinstance(v, list):
        return [_expand_value(x, env, strict_env, depth) for x in v]
    return v


def _merge_maps(base: dict, overlay: dict) -> dict:
    """Conf.Merge semantics: nested maps merge key-wise (overlay wins on
    conflicts), every other value type overrides wholesale.

    Overlay values are deep-copied on insert: a caller-supplied dict source
    must never be aliased into the merged tree, where a later source's merge
    (or the caller mutating its own dict) would silently edit both — the
    watcher re-resolves the same source objects every poll."""
    import copy

    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _merge_maps(base[k], v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def resolve_config(
    sources: list[str | dict] | str | dict,
    env: dict[str, str] | None = None,
    strict_env: bool = False,
) -> dict:
    """confmap.Resolver.Resolve analog: retrieve each source in order
    (``file:path`` / ``env:VAR`` / ``yaml:inline`` URI, bare path, inline
    YAML string, or dict), merge, then expand embedded ``${scheme:value}``
    and legacy ``${ENVVAR}`` references. ``env`` defaults to os.environ;
    ``strict_env=True`` turns unset variables into ConfigError instead of
    the provider's empty-string default."""
    if yaml is None:  # pragma: no cover
        raise ConfigError("pyyaml not available")
    env = dict(os.environ) if env is None else env
    if not isinstance(sources, list):
        sources = [sources]

    merged: dict = {}
    for src in sources:
        if isinstance(src, dict):
            raw = src
        else:
            m = _SCHEME_RE.match(src)
            if m and m.group(1) in ("file", "env", "yaml", "http", "https"):
                raw = _retrieve(m.group(1), m.group(2), env, strict_env)
            elif "\n" not in src and src.endswith((".yaml", ".yml")):
                raw = _retrieve("file", src, env, strict_env)
            else:
                raw = _yaml_load(src)
        if raw is None:
            continue
        if not isinstance(raw, dict):
            raise ConfigError(f"config source must resolve to a mapping, got {type(raw).__name__}")
        _merge_maps(merged, raw)

    expanded = _expand_value(merged, env, strict_env)
    if not isinstance(expanded, dict):  # pragma: no cover — defensive
        raise ConfigError("config root must be a mapping after expansion")
    return expanded


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
    # extensions: declared under top-level `extensions:`, ENABLED by
    # listing in `service.extensions` (service/service.go ordering) —
    # a receiver's `auth:` option may only name an enabled one
    # (config/configauth/configauth.go:29-52 "authenticator not found")
    extensions: dict[str, ComponentConfig] = field(default_factory=dict)
    enabled_extensions: list[str] = field(default_factory=list)
    # service::telemetry::metrics::level (configtelemetry.go:11-25):
    # none  — no obsreport counters at all
    # basic — receiver + exporter boundaries only
    # normal/detailed — every stage boundary (current full grain)
    telemetry_level: str = "normal"

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
        for x in self.enabled_extensions:
            if x not in self.extensions:
                raise ConfigError(
                    f"service.extensions references unknown extension {x!r}"
                )
        if self.telemetry_level not in _TELEMETRY_LEVELS:
            raise ConfigError(
                f"service.telemetry.metrics.level: unknown level "
                f"{self.telemetry_level!r} (configtelemetry levels: "
                f"{sorted(_TELEMETRY_LEVELS)})"
            )
        # exporter compression (configcompression analog,
        # config/configcompression/compressionType.go:21-28). The parquet
        # writer supports a strict subset of the reference's enum; zlib/
        # deflate exist on the reference's wire but have no parquet codec.
        for e in self.exporters.values():
            comp = e.options.get("compression")
            if comp is None:
                continue
            if comp in ("zlib", "deflate"):
                raise ConfigError(
                    f"exporter {e.name!r}: compression {comp!r} is a wire "
                    "codec with no parquet equivalent — use gzip, snappy, "
                    "zstd, or none"
                )
            if comp not in _PARQUET_CODECS:
                raise ConfigError(
                    f"exporter {e.name!r}: unsupported compression {comp!r} "
                    f"(supported: {sorted(_PARQUET_CODECS)})"
                )
        for p in self.pipelines.values():
            # exporters sharing one pipeline share its single fan-out write
            # (one parquet job, partitionBy(sink)) — the per-connection
            # codec choice the reference allows per exporter therefore must
            # agree within a pipeline; mixing codecs means separate
            # pipelines (and separate writes)
            codecs = {
                self.exporters[e].options["compression"]
                for e in p.exporters
                if e in self.exporters
                and self.exporters[e].options.get("compression") is not None
            }
            if len(codecs) > 1:
                raise ConfigError(
                    f"pipeline {p.name!r}: exporters declare conflicting "
                    f"compression codecs {sorted(codecs)} but share one "
                    "fan-out write — split them into separate pipelines"
                )
        for r in self.receivers.values():
            auth = r.options.get("auth")
            if auth is None:
                continue
            # configauth.GetServerAuthenticator resolves the id against the
            # ENABLED extension set (config/configauth/configauth.go:40-52)
            if auth not in self.extensions:
                raise ConfigError(
                    f"receiver {r.name!r}: authenticator not found: {auth!r}"
                )
            if auth not in self.enabled_extensions:
                raise ConfigError(
                    f"receiver {r.name!r}: authenticator {auth!r} is declared "
                    "but not listed in service.extensions"
                )
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


class ConfigWatcher:
    """``ConfigProvider.Watch()`` analog (otelcol/collector.go:221-251):
    the collector blocks on a watch channel and, on change, runs the full
    stop → resolve → rebuild → restart reload. Here the watch signal is a
    content hash of the RESOLVED config (so a change in a referenced
    ``file:``/``env:``/``http:`` source also fires, not just the root
    file); polling keeps it dependency-free and hermetic in tests.

    Use ``poll()`` for a synchronous check (returns the new resolved dict
    once after each change, else None) — the reload loop in
    streaming.stream drives it.
    """

    def __init__(
        self,
        sources: list[str | dict] | str | dict,
        env: dict[str, str] | None = None,
        strict_env: bool = False,
        max_consecutive_failures: int = 5,
    ):
        self.sources = sources
        self.env = env
        self.strict_env = strict_env
        # a durably-broken config must SURFACE, not keep the stale
        # pipeline running silently forever: the reference run loop
        # returns reload errors and terminates (otelcol/collector.go:
        # 224-231). Transient flips (half-written file, http hiccup)
        # stay tolerated up to this many consecutive polls.
        self.max_consecutive_failures = max_consecutive_failures
        self._consecutive_failures = 0
        self._last_error: Exception | None = None
        self._last_digest, _ = self._digest()

    def _resolve(self) -> dict:
        return resolve_config(self.sources, env=self.env, strict_env=self.strict_env)

    def _digest(self) -> tuple[str, dict | None]:
        """(digest, resolved) — ONE resolution per poll. A transient
        resolve failure (half-written file mid-flip, an http fetch
        hiccup) is NOT a change event: the previous digest is returned
        and the next poll sees the complete write."""
        import hashlib
        import json

        try:
            resolved = self._resolve()
        except (ConfigError, OSError) as e:
            # OSError: the root file itself can vanish/reappear mid-flip
            # (editor rename dance) between the exists() check and open()
            self._consecutive_failures += 1
            self._last_error = e
            prev = self._last_digest if hasattr(self, "_last_digest") else ""
            return prev, None
        self._consecutive_failures = 0
        self._last_error = None
        digest = hashlib.sha256(
            json.dumps(resolved, sort_keys=True, default=str).encode()
        ).hexdigest()
        return digest, resolved

    def poll(self) -> dict | None:
        """Return the newly-resolved config dict if it changed since the
        last poll (or construction), else None. Transient resolve
        failures are tolerated; after ``max_consecutive_failures``
        consecutive ones the last error RE-RAISES as a ConfigError so a
        permanently broken config is distinguishable from a flip (the
        collector.go:224-231 terminate-on-reload-error contract)."""
        d, resolved = self._digest()
        if (
            self._consecutive_failures >= self.max_consecutive_failures
            and self._last_error is not None
        ):
            raise ConfigError(
                f"config failed to resolve {self._consecutive_failures} "
                f"consecutive polls: {self._last_error}"
            ) from self._last_error
        if d != self._last_digest:
            self._last_digest = d
            return resolved
        return None


def load_config(
    source: str | dict | list,
    env: dict[str, str] | None = None,
    strict_env: bool = False,
) -> CollectorConfig:
    """Load + resolve from one or more sources (YAML string/path/dict or a
    list of them — later sources override earlier per Conf.Merge), with
    ``${env:VAR}`` / ``${file:path}`` / ``${yaml:...}`` / ``${ENVVAR}``
    expansion (confmap resolver semantics)."""
    if yaml is None:
        raise ConfigError("pyyaml not available; pass a dict")
    raw = resolve_config(source, env=env, strict_env=strict_env)
    return config_from_resolved(raw)


def config_from_resolved(raw: dict) -> CollectorConfig:
    """Parse + validate an ALREADY-RESOLVED config mapping — no
    ``${...}`` expansion. The hot-reload loop hands the exact dict the
    watcher's digest saw straight in here: re-resolving from the sources
    would double the I/O and open a TOCTOU window where the file changes
    between the digest and the build (and would re-expand ``${...}``
    sequences the first resolution legitimately produced)."""
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
        extensions=_parse_components(raw.get("extensions")),
        enabled_extensions=list(service.get("extensions") or []),
        telemetry_level=(
            ((service.get("telemetry") or {}).get("metrics") or {}).get(
                "level", "normal"
            )
        ),
    )
    cfg.validate()
    # --feature-gates analog (otelcol/command.go:40-52): a top-level
    # feature_gates list/string of +id/-id/id entries, applied to the
    # global registry BEFORE pipeline build so gated behavior is a
    # plan-time decision (unknown gate ids fail the load loudly)
    gates_spec = raw.get("feature_gates")
    if gates_spec is not None:
        from .featuregate import GateError, global_registry

        try:
            global_registry().apply_flags(gates_spec)
        except GateError as e:
            raise ConfigError(str(e)) from e
    return cfg
