"""Debezium/Kafka-Connect source-connector config generation (S17).

The reference's steady-state ingestion is Debezium running inside Kafka
Connect; the engine-side artifact is the connector CONFIG — a JSON dict
of dialect-specific properties — plus deterministic naming for
connectors, replication slots, publications, and topics
(`/root/reference/backend/ingestion/debezium_config.py:14-776`). This
module re-expresses those semantics: per-dialect connector classes,
snapshot-mode remaps (each dialect accepts a different subset of
Debezium's modes), envelope-vs-unwrap transform choices, and the naming
rules downstream consumers depend on
(`functions/identifiers.topic_name` parses the same shapes back).

Everything here is pure config generation — no Kafka client, no
network — so it is fully testable offline; the Spark engine consumes
the resulting topics through `streaming/changelog_stream.kafka_source`
(or its file-feed twin where no broker exists).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class SourceConnection:
    host: str
    port: int | None
    username: str
    password: str
    database_type: str  # postgresql | sqlserver | oracle | db2 | as400
    database: str | None = None
    extra: dict = field(default_factory=dict)


_DIALECTS = {
    "postgresql": {
        "class": "io.debezium.connector.postgresql.PostgresConnector",
        "short": "pg",
        "default_schema": "public",
        "default_port": 5432,
        "unwrap": False,  # keep the envelope; the sink extracts `after`
        "schema_history": False,
    },
    "sqlserver": {
        "class": "io.debezium.connector.sqlserver.SqlServerConnector",
        "short": "mssql",
        "default_schema": "dbo",
        "default_port": 1433,
        "unwrap": True,
        "drop_tombstones": "false",
        "schema_history": True,
    },
    "oracle": {
        "class": "io.debezium.connector.oracle.OracleConnector",
        "short": "ora",
        "default_schema": None,  # Oracle schema == user, no silent default
        "default_port": 1521,
        "unwrap": False,
        "schema_history": True,
    },
    "db2": {
        "class": "io.debezium.connector.db2.Db2Connector",
        "short": "db2",
        "default_schema": None,
        "default_port": 50000,
        "unwrap": True,
        "drop_tombstones": "true",
        "schema_history": True,
    },
    "as400": {
        "class": "io.debezium.connector.db2as400.As400RpcConnector",
        "short": "as400",
        "default_schema": "QSYS",
        "default_port": 446,
        "unwrap": True,
        "drop_tombstones": "false",
        "schema_history": True,
    },
}

_ALIASES = {"mssql": "sqlserver", "ibm_i": "as400"}


def _dialect(database_type: str) -> str:
    dt = database_type.lower()
    dt = _ALIASES.get(dt, dt)
    if dt not in _DIALECTS:
        raise ValueError(f"unsupported database type for Debezium: {dt}")
    return dt


def _snake(name: str) -> str:
    return re.sub(r"[^a-z0-9_]", "_", name.lower().replace("-", "_"))


def slot_name(pipeline_name: str) -> str:
    """Postgres replication-slot name: [a-z0-9_] only."""
    return f"{_snake(pipeline_name)}_slot"


def publication_name(pipeline_name: str, extra: dict | None = None) -> str:
    ex = extra or {}
    return ex.get("publication_name") or f"{_snake(pipeline_name)}_pub"


def connector_name(pipeline_name: str, database_type: str, schema: str) -> str:
    """cdc-{pipeline}-{dialect-short}-{schema}, URL-safe."""
    short = _DIALECTS[_dialect(database_type)]["short"]
    s = re.sub(r"[^a-z0-9._-]", "_", (schema or "").lower())
    s = re.sub(r"_+", "_", s).strip("_")
    return f"cdc-{pipeline_name.lower()}-{short}-{s}"


def topic_for(
    pipeline_name: str, schema: str, table: str, database: str | None = None
) -> str:
    """Debezium topic: {prefix}.{schema}.{table} — SQL Server inserts the
    database: {prefix}.{database}.{schema}.{table}. Invalid topic chars
    become underscores."""

    def clean(x: str) -> str:
        return re.sub(r"[^a-zA-Z0-9._-]", "_", x).strip("_")

    parts = [pipeline_name]
    if database is not None:
        parts.append(clean(database))
    parts += [clean(schema), clean(table)]
    return ".".join(parts)


def resolve_connector_snapshot_mode(
    database_type: str, requested: str, has_full_load_offset: bool
) -> str:
    """Map the engine's requested mode onto what each dialect accepts.

    * postgresql: `never` streams immediately; a completed full load
      (offset captured) demotes any snapshot to `initial_only`
      (schema only — data already loaded); bare `schema_only` is not a
      PG mode and becomes `initial`.
    * sqlserver: has no `never`; with an offset use `schema_only`,
      without one fall back to `initial`.
    * oracle: has no `never` either; `initial_only` replaces it.
    * db2/as400: `never` is only safe once an offset exists (the
      journal/commit position); otherwise a full `initial` snapshot.
    """
    d = _dialect(database_type)
    r = requested
    if d == "postgresql":
        if r == "never":
            return "never"
        if has_full_load_offset:
            return "initial_only"
        return "initial" if r == "schema_only" else r
    if d == "sqlserver":
        if r == "never":
            return "schema_only" if has_full_load_offset else "initial"
        return r
    if d == "oracle":
        if r == "never":
            return "initial_only" if has_full_load_offset else "initial"
        return "initial_only" if r == "schema_only" else r
    # db2 / as400
    if r == "never" and not has_full_load_offset:
        return "initial"
    if r == "schema_only":
        return "schema_only" if has_full_load_offset else "initial"
    if has_full_load_offset:
        return "never"
    return "initial"


def debezium_source_config(
    pipeline_name: str,
    connection: SourceConnection,
    database: str,
    schema: str,
    tables: list[str],
    full_load_lsn: str | None = None,
    snapshot_mode: str = "never",
    kafka_bootstrap: str = "localhost:9092",
) -> dict:
    """The connector config dict a Kafka-Connect POST would carry."""
    d = _dialect(connection.database_type)
    spec = _DIALECTS[d]
    if not schema or not schema.strip():
        if d == "as400":
            schema = (
                connection.extra.get("library")
                or database
                or spec["default_schema"]
            )
        elif spec["default_schema"]:
            schema = spec["default_schema"]
        else:
            raise ValueError(f"{d} requires an explicit schema")
    if not tables:
        raise ValueError(f"no tables provided for pipeline {pipeline_name}")

    mode = resolve_connector_snapshot_mode(
        d, snapshot_mode, full_load_lsn is not None
    )
    host = connection.extra.get("docker_hostname", connection.host)
    port = connection.port or spec["default_port"]

    cfg = {
        "name": connector_name(pipeline_name, d, schema),
        "connector.class": spec["class"],
        "tasks.max": "1",
        "database.hostname": host,
        "database.port": str(port),
        "database.user": connection.username,
        "database.password": connection.password,
        "database.server.name": pipeline_name,
        "topic.prefix": pipeline_name,
        "table.include.list": ",".join(f"{schema}.{t}" for t in tables),
        "snapshot.mode": mode,
        "key.converter": "org.apache.kafka.connect.json.JsonConverter",
        "key.converter.schemas.enable": "false",
        "value.converter": "org.apache.kafka.connect.json.JsonConverter",
        "value.converter.schemas.enable": "true",
        "errors.tolerance": "all",
        "errors.log.enable": "true",
        "errors.log.include.messages": "true",
    }
    if d == "postgresql":
        cfg.update(
            {
                "database.dbname": database,
                "plugin.name": "pgoutput",
                "slot.name": slot_name(pipeline_name),
                "publication.name": publication_name(
                    pipeline_name, connection.extra
                ),
                "publication.autocreate.mode": connection.extra.get(
                    "publication_autocreate", "filtered"
                ),
                "snapshot.locking.mode": "none",
            }
        )
    elif d == "sqlserver":
        cfg.update(
            {
                "database.names": database,
                "snapshot.isolation.mode": "snapshot",
                "database.cdc.enabled": "true",
                "database.history.skip.unparseable.ddl": "true",
                "database.encrypt": str(
                    connection.extra.get("encrypt", False)
                ).lower(),
                "database.trustServerCertificate": str(
                    connection.extra.get("trust_server_certificate", True)
                ).lower(),
            }
        )
    elif d == "oracle":
        cfg.update(
            {
                "database.dbname": database,
                "database.connection.adapter": "logminer",
                "log.mining.strategy": "online_catalog",
                "snapshot.locking.mode": "none",
                "database.history.skip.unparseable.ddl": "true",
            }
        )
    elif d == "db2":
        cfg["database.dbname"] = database or schema
    elif d == "as400":
        cfg["database.dbname"] = (
            connection.extra.get("default_library") or database or "QGPL"
        )
        cfg["database.schema"] = schema
    if spec.get("unwrap"):
        cfg.update(
            {
                "transforms": "unwrap",
                "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
                "transforms.unwrap.drop.tombstones": spec["drop_tombstones"],
                "transforms.unwrap.delete.handling.mode": "rewrite",
                "transforms.unwrap.delete.tombstone.handling.mode": "rewrite",
                "transforms.unwrap.add.fields": "op,source.ts_ms",
            }
        )
    if spec.get("schema_history"):
        cfg.update(
            {
                "schema.history.internal": "io.debezium.storage.kafka.history.KafkaSchemaHistory",
                "schema.history.internal.kafka.bootstrap.servers": kafka_bootstrap,
                "schema.history.internal.kafka.topic": (
                    f"{pipeline_name}.schema.history.internal"
                ),
            }
        )
    return cfg
