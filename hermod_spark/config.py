"""TOML configuration surface — the reference's config schema parsed
in Python (reference: internal/config/config.go:11-90, example
examples/config.toml), driving plan construction instead of goroutine
pools.

Sections: ``[mqtt] [database] [pipeline] [logging] [[routes]]``. The
transform registry replaces Lua script paths: a route's ``script``
value is looked up in a ``{name: DataFrame->DataFrame}`` registry
(the Spark-native transform contract, SURVEY §2.3), so configs stay
declarative while transforms stay native Column builders.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field


@dataclass
class MQTTConfig:
    broker: str = ""
    client_id: str = ""
    username: str = ""
    password: str = ""
    topics: list[str] = field(default_factory=list)
    qos: int = 0


@dataclass
class DatabaseConfig:
    host: str = ""
    port: int = 5432
    user: str = ""
    password: str = ""
    database: str = ""
    sslmode: str = "disable"
    pool_size: int = 10

    def connection_string(self) -> str:
        """Byte-identical to the reference's pgx connection string
        (config.go:78-90, pinned by config_test.go:98-140)."""
        return (
            f"host={self.host} port={self.port} user={self.user}"
            f" password={self.password} dbname={self.database}"
            f" sslmode={self.sslmode} pool_max_conns={self.pool_size}"
        )

    def jdbc_url(self) -> str:
        """The same target as a Spark JDBC URL."""
        return (
            f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"
            f"?sslmode={self.sslmode}"
        )


@dataclass
class PipelineConfig:
    lua_script: str = ""  # transform-registry key here (name kept for parity)
    table_name: str = ""


@dataclass
class LoggingConfig:
    level: str = "INFO"


@dataclass
class RouteConfig:
    """One [[routes]] entry (config.go:51-58). ``workers``/``queue_size``
    are parsed for parity; Spark partitioning and backpressure replace
    them (SURVEY §2.7)."""

    filter: str = ""
    script: str = ""
    workers: int = 1
    queue_size: int = 100
    table: str = "iot_data"


@dataclass
class Config:
    mqtt: MQTTConfig = field(default_factory=MQTTConfig)
    database: DatabaseConfig = field(default_factory=DatabaseConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    routes: list[RouteConfig] = field(default_factory=list)
    dry_run: bool = False


def loads(text: str) -> Config:
    raw = tomllib.loads(text)
    return Config(
        mqtt=MQTTConfig(**raw.get("mqtt", {})),
        database=DatabaseConfig(**raw.get("database", {})),
        pipeline=PipelineConfig(**raw.get("pipeline", {})),
        logging=LoggingConfig(**raw.get("logging", {})),
        routes=[RouteConfig(**r) for r in raw.get("routes", [])],
        dry_run=bool(raw.get("dry_run", raw.get("logging", {}).get("dry_run", False))),
    )


def load(path: str) -> Config:
    """Read + parse; missing file or bad TOML raise (config.go:61-75)."""
    with open(path, "rb") as fh:
        return loads(fh.read().decode("utf-8"))
