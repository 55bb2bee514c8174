"""extension/auth + configauth analog: server authenticator at the
receiver boundary, AuthData attributes on client.auth, case-insensitive
Metadata.Get, refused counters, and config wiring
(extension/auth/server.go:29-41, config/configauth/configauth.go:29-52,
client/client.go:100-183)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.clientauth import (
    AUTH_OK_COL,
    BearerTokenAuthenticator,
    build_authenticator,
    client_attribute_stage,
    metadata_get,
)
from opentelemetry_collector_spark.plans import (
    BatchPipelineRunner,
    ConfigError,
    load_config,
)

MD_TYPE = "map<string, array<string>>"
TOKENS = {
    "tok-a": {"subject": "svc-a", "membership": "ingest"},
    "tok-b": {"subject": "svc-b"},
}


def _requests(spark):
    rows = [
        (1, {"Authorization": ["Bearer tok-a"]}),  # scheme prefix + canonical case
        (2, {"authorization": ["tok-b"]}),  # bare token, lower-case key
        (3, {"AUTHORIZATION": ["Bearer nope"]}),  # unknown token
        (4, {"x-tenant": ["t1"]}),  # no auth header at all
        (5, None),  # no metadata
    ]
    return spark.createDataFrame(
        rows, schema=f"event_id int, request_metadata {MD_TYPE}"
    )


# -- Metadata.Get (client/client.go:160-183) --------------------------------


def test_metadata_get_exact_then_case_fold(spark):
    df = spark.createDataFrame(
        [({"Host": ["a"], "host": ["b"]},), ({"X-Tenant": ["t1", "t2"]},)],
        schema=f"md {MD_TYPE}",
    )
    got = df.select(
        metadata_get(F.col("md"), "host").alias("exact_lower"),
        metadata_get(F.col("md"), "Host").alias("exact_upper"),
        metadata_get(F.col("md"), "x-tenant").alias("folded"),
        metadata_get(F.col("md"), "missing").alias("absent"),
    ).collect()
    # exact case wins when both casings exist
    assert got[0]["exact_lower"] == ["b"]
    assert got[0]["exact_upper"] == ["a"]
    # case-insensitive fallback finds differently-cased keys, full value copied
    assert got[1]["folded"] == ["t1", "t2"]
    # missing key → null (Go nil)
    assert got[0]["absent"] is None and got[1]["absent"] is None


# -- auth.Server semantics ---------------------------------------------------


def test_bearer_authenticate_populates_auth_and_flags_refused(spark):
    out = BearerTokenAuthenticator(TOKENS).authenticate(_requests(spark))
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1][AUTH_OK_COL] and rows[2][AUTH_OK_COL]
    assert rows[1]["client"]["auth"] == TOKENS["tok-a"]
    assert rows[2]["client"]["auth"] == TOKENS["tok-b"]
    # unknown token, missing header, missing metadata: all refused,
    # auth left empty (never null — AuthData is always addressable)
    for eid in (3, 4, 5):
        assert not rows[eid][AUTH_OK_COL]
        assert rows[eid]["client"]["auth"] == {}


def test_authenticate_merges_into_existing_client_struct(spark):
    df = _requests(spark).withColumn(
        "client", F.struct(F.lit("file:/x").alias("addr"))
    )
    out = BearerTokenAuthenticator(TOKENS).authenticate(df)
    row = out.where("event_id = 1").first()
    assert row["client"]["addr"] == "file:/x"  # provenance survives
    assert row["client"]["auth"]["subject"] == "svc-a"


def test_authenticate_requires_metadata_column(spark):
    with pytest.raises(ValueError, match="receiver boundary"):
        BearerTokenAuthenticator(TOKENS).authenticate(spark.range(3))


def test_authenticator_factory_and_caps():
    with pytest.raises(ValueError, match="unknown authenticator"):
        build_authenticator("oidc", {})
    with pytest.raises(ValueError, match="at least one token"):
        BearerTokenAuthenticator({})
    with pytest.raises(ValueError, match="literal-plan cap"):
        BearerTokenAuthenticator({f"t{i}": {} for i in range(10_001)})


def test_client_attribute_stage(spark):
    out = BearerTokenAuthenticator(TOKENS).authenticate(_requests(spark))
    annotated = client_attribute_stage("subject")(out.where(F.col(AUTH_OK_COL)))
    got = {r["event_id"]: r["subject"] for r in annotated.collect()}
    assert got == {1: "svc-a", 2: "svc-b"}
    with pytest.raises(ValueError, match="no client struct"):
        client_attribute_stage("subject")(spark.range(1))


# -- config wiring (configauth.GetServerAuthenticator) ----------------------


def _cfg(path: str, **over):
    base = {
        "extensions": {"auth/bearer": {"kind": "bearertoken", "tokens": TOKENS}},
        "receivers": {
            "records_parquet": {"path": path, "auth": "auth/bearer"}
        },
        "processors": {
            "client_attribute": {"attribute": "subject"},
        },
        "exporters": {"sink_all": {"kind": "parquet", "all": True}},
        "service": {
            "extensions": ["auth/bearer"],
            "pipelines": {
                "logs": {
                    "receivers": ["records_parquet"],
                    "processors": ["client_attribute"],
                    "exporters": ["sink_all"],
                }
            },
        },
    }
    base.update(over)
    return base


def test_e2e_auth_gate_with_refused_counters(spark, tmp_path):
    src = str(tmp_path / "requests")
    _requests(spark).write.parquet(src)
    runner = BatchPipelineRunner(spark, load_config(_cfg(src)), str(tmp_path / "out"))
    runner.run()
    got = runner.read_sink("logs", "sink_all")
    rows = {r["event_id"]: r for r in got.collect()}
    # refused requests never entered the pipeline
    assert set(rows) == {1, 2}
    # authprinter pattern: auth attribute annotated onto the record
    assert rows[1]["subject"] == "svc-a" and rows[2]["subject"] == "svc-b"
    # obsreport receiver accepted/refused split rides the same job
    runner.telemetry.harvest()
    # auth counters live in their own namespace so a pipeline named like
    # the receiver cannot overwrite the refused split
    c = runner.telemetry.counters("receiver_auth/records_parquet")
    assert (c.accepted, c.refused) == (2, 3)


def test_auth_config_validation(tmp_path):
    src = str(tmp_path / "nope")  # never read — validation fails first
    cfg0 = _cfg(src, extensions={})
    cfg0["service"] = dict(cfg0["service"], extensions=[])
    with pytest.raises(ConfigError, match="authenticator not found"):
        load_config(cfg0)
    cfg = _cfg(src)
    cfg["service"] = dict(cfg["service"], extensions=[])
    with pytest.raises(ConfigError, match="not listed in service.extensions"):
        load_config(cfg)
    cfg2 = _cfg(src)
    cfg2["service"] = dict(cfg2["service"], extensions=["auth/bearer", "ghost"])
    with pytest.raises(ConfigError, match="unknown extension"):
        load_config(cfg2)


def test_e2e_tenant_routing_on_auth_attribute(spark, tmp_path):
    """The client.Info consumption doc's routing use-case
    (client/client.go:47-50): fan the pipeline out per authenticator
    attribute — records from the 'ingest'-membership tenant land in
    their own sink, everything else takes the default route."""
    src = str(tmp_path / "requests")
    _requests(spark).write.parquet(src)
    cfg = _cfg(src)
    cfg["processors"] = {
        "client_attribute": {"attribute": "membership"},
    }
    cfg["exporters"] = {
        "sink_ingest": {"kind": "parquet", "predicate": 'membership == "ingest"'},
        "sink_default": {"kind": "parquet", "default": True},
    }
    cfg["service"]["pipelines"]["logs"]["exporters"] = [
        "sink_ingest",
        "sink_default",
    ]
    runner = BatchPipelineRunner(spark, load_config(cfg), str(tmp_path / "out"))
    runner.run()
    ingest = {r["event_id"] for r in runner.read_sink("logs", "sink_ingest").collect()}
    default = {r["event_id"] for r in runner.read_sink("logs", "sink_default").collect()}
    # tok-a carries membership=ingest; tok-b authenticates but has no
    # membership attribute → default; refused requests reach NO sink
    assert ingest == {1}
    assert default == {2}
