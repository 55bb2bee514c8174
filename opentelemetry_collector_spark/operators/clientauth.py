"""Client auth — the ``extension/auth`` + ``configauth`` analog.

The reference propagates per-request client identity down the pipeline as
``client.Info`` on the context (client/client.go:100-133): receivers fill
``Addr``/``Metadata``, a server authenticator extension validates the
request headers and adds ``AuthData`` attributes
(extension/auth/server.go:29-41), and downstream processors/exporters
consume them for annotation, tenant routing, or rate limiting
(client/client.go:43-54).  Receivers name their authenticator in config;
``configauth.GetServerAuthenticator`` resolves it from the *enabled*
extensions by id and errors with "authenticator not found" otherwise
(config/configauth/configauth.go:29-52).

Spark-first mapping — context is columns:

- request **metadata** is a ``map<string, array<string>>`` column (the Go
  ``map[string][]string``), carried per row from the source boundary the
  way file provenance already rides in the ``client`` struct
  (sources/tables.py ``with_client_info``);
- :func:`metadata_get` is ``client.Metadata.Get``'s case-insensitive
  lookup (client/client.go:160-183) as a pure map expression;
- :class:`BearerTokenAuthenticator` is an ``auth.Server``: the token
  table comes from config, so it folds into a **literal map expression**
  — authentication is scan-speed, zero joins, zero shuffle, and at
  1000-executor scale every task carries the (tiny, config-sized) map in
  its plan rather than shuffling anything;
- a failed ``Authenticate`` means the request is refused and never
  retried (extension/auth/server.go:32-38) → refused rows are filtered
  at the receiver boundary and counted on the receiver's obsreport
  ``refused`` counter (obsreport/obsreport_receiver.go:166-296), riding
  the same job via ``df.observe``;
- successful rows get ``client.auth`` populated (a ``map<string,string>``
  of authenticator-defined attributes — the ``AuthData.GetAttribute``
  surface, client/client.go:121-133), which the ``client_attribute``
  processor (the doc's "authprinter" pattern, client/client.go:63-88)
  copies onto records and the fan-out router can route on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "AUTH_OK_COL",
    "BearerTokenAuthenticator",
    "build_authenticator",
    "client_attribute_stage",
    "metadata_get",
]

# boolean flag added by Authenticate; the receiver boundary filters on it
# and drops it — it never reaches processors (the reference's refused
# requests never enter the pipeline either)
AUTH_OK_COL = "__auth_ok"

# a config-literal token table compiles to a create_map expression; past
# this size the plan itself becomes the problem and a broadcast dim table
# is the right shape — refuse loudly rather than degrade silently
_LITERAL_TOKEN_CAP = 10_000


def metadata_get(metadata: Column, key: str) -> Column:
    """``client.Metadata.Get`` (client/client.go:160-183): exact-case hit
    first, then a case-insensitive fold over the entries; missing key →
    null (Go nil).  Returns the ``array<string>`` value column."""
    exact = F.try_element_at(metadata, F.lit(key))
    folded = F.try_element_at(
        F.filter(
            F.map_entries(metadata),
            lambda e: F.lower(e["key"]) == F.lit(key.lower()),
        ),
        F.lit(1),
    )["value"]
    return F.coalesce(exact, folded)


class BearerTokenAuthenticator:
    """``auth.Server`` over a config-declared bearer-token table.

    ``tokens`` maps a bearer token to the attribute map its ``AuthData``
    exposes (e.g. ``{"subject": "svc-a", "membership": "ingest"}``) —
    attribute names are authenticator-defined public API
    (client/client.go:37-41).  The header value may carry an optional
    case-insensitive ``Bearer `` scheme prefix (RFC 6750 §2.1).
    """

    def __init__(
        self,
        tokens: dict[str, dict[str, str]],
        metadata_key: str = "authorization",
    ) -> None:
        if not tokens:
            raise ValueError("bearer authenticator needs at least one token")
        if len(tokens) > _LITERAL_TOKEN_CAP:
            raise ValueError(
                f"bearer token table has {len(tokens)} entries — past the "
                f"{_LITERAL_TOKEN_CAP} literal-plan cap; load it as a "
                "broadcast dim table instead of config"
            )
        self.tokens = {
            str(t): {str(k): str(v) for k, v in (attrs or {}).items()}
            for t, attrs in tokens.items()
        }
        self.metadata_key = metadata_key

    def _auth_lookup(self) -> Column:
        """token → attrs as one literal ``map<string, map<string,string>>``."""
        pairs: list[Column] = []
        for token, attrs in self.tokens.items():
            kv: list[Column] = []
            for k, v in attrs.items():
                kv.extend((F.lit(k), F.lit(v)))
            pairs.append(F.lit(token))
            pairs.append(F.create_map(*kv) if kv else F.create_map().cast("map<string,string>"))
        return F.create_map(*pairs)

    def authenticate(
        self, df: DataFrame, metadata_col: str = "request_metadata"
    ) -> DataFrame:
        """Validate each row's request metadata; populate ``client.auth``
        on success and flag failures in :data:`AUTH_OK_COL`.  The caller
        (receiver boundary) filters + counts refused rows — a failed
        authentication is never retried (extension/auth/server.go:32-38).
        """
        if metadata_col not in df.columns:
            raise ValueError(
                f"authenticate: frame has no {metadata_col!r} column — "
                "request metadata exists only at a receiver boundary"
            )
        md = F.col(metadata_col)
        raw = F.try_element_at(metadata_get(md, self.metadata_key), F.lit(1))
        token = F.regexp_replace(raw, "^(?i)bearer ", "")
        attrs = F.try_element_at(self._auth_lookup(), F.coalesce(token, F.lit("")))
        auth = F.coalesce(attrs, F.create_map().cast("map<string,string>"))
        if "client" in df.columns:
            # merge into the existing provenance struct (with_client_info)
            client = F.col("client").withField("auth", auth)
        else:
            client = F.struct(
                F.lit(None).cast("string").alias("addr"),
                auth.alias("auth"),
            )
        return df.withColumn("client", client).withColumn(
            AUTH_OK_COL, attrs.isNotNull()
        )


def build_authenticator(kind: str, options: dict) -> BearerTokenAuthenticator:
    """Authenticator factory — the ``configauth`` resolution step once the
    extension id has been validated against ``service.extensions``
    (config/configauth/configauth.go:40-52)."""
    if kind == "bearertoken":
        return BearerTokenAuthenticator(
            tokens=dict(options.get("tokens") or {}),
            metadata_key=options.get("metadata_key", "authorization"),
        )
    raise ValueError(f"unknown authenticator kind {kind!r}")


def client_attribute_stage(attribute: str, column: str | None = None):
    """The "authprinter" consumption pattern (client/client.go:63-88):
    copy one authenticator attribute from ``client.auth`` onto the record
    as a named column, for downstream annotation or tenant routing."""
    out = column or attribute

    def _annotate(df: DataFrame) -> DataFrame:
        if "client" not in df.columns:
            raise ValueError(
                "client_attribute: frame carries no client struct — "
                "declare an authenticator on the receiver first"
            )
        return df.withColumn(out, F.try_element_at(F.col("client")["auth"], F.lit(attribute)))

    return _annotate
