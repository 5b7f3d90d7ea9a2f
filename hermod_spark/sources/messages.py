"""Message sources: the canonical message frame and its stream form.

The reference's unit of input is an MQTT Message{topic, payload, qos,
retain, time} (internal/router/router.go:23-30). The engine is
source-agnostic: anything that yields that five-column frame plugs into
the route planner. Provided here:

- ``message_frame`` — batch stand-in built from the ``events`` table
  (topic synthesized from event_type/user_id, payload = the JSON
  props), used by tests and the oracle;
- ``message_stream`` — the same shape as a Structured Streaming
  source (file/rate for tests; a Kafka reader maps 1:1 — Kafka rows
  already carry topic/value/timestamp);
- ``mqtt_source`` — a stub documenting the production wiring (paho →
  Kafka bridge, or a Spark 4 Python DataSource); no broker exists in
  this environment, so it raises with instructions rather than
  pretending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hermod_spark import data

MESSAGE_COLUMNS = ("time", "topic", "qos", "retain", "payload")


def message_frame(spark: SparkSession, sf_dir: str, keep: list[str] | None = None) -> DataFrame:
    """events → canonical message frame.

    topic = 'sensors/<event_type>/<user_id>' (the reference's
    'sensors/+/...' examples); payload = a JSON object combining the
    event's value and props — so routed transforms have real JSON to
    decode, like an MQTT sensor payload."""
    ev = data.table(spark, sf_dir, "events")
    return ev.select(
        *[F.col(c) for c in (keep or [])],
        F.col("ts").alias("time"),
        F.concat(
            F.lit("sensors/"), F.col("event_type"), F.lit("/"), F.col("user_id").cast("string")
        ).alias("topic"),
        F.lit(0).alias("qos"),
        F.lit(False).alias("retain"),
        F.concat(
            F.lit('{"temperature": '),
            F.col("value").cast("string"),
            F.lit(', "k": '),
            F.coalesce(F.get_json_object("props", "$.k"), F.lit("null")),
            F.lit("}"),
        ).alias("payload"),
    )


def message_stream(
    spark: SparkSession, path: str, schema=None, max_files: int = 1
) -> DataFrame:
    """File-based streaming source with the message schema — the test
    double for the MQTT/Kafka path; identical downstream plans."""
    reader = spark.readStream.option("maxFilesPerTrigger", max_files)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def mqtt_source(*_args, **_kwargs):
    """Live MQTT ingestion lives in :mod:`hermod_spark.sources.mqtt`:
    ``spark.readStream.format('mqtt')`` with a ``spool`` option (the
    engine half — offsets/partitions/reads/recovery — is implemented
    and tested against an in-process broker double; only the paho
    socket is import-gated since this container ships no broker and no
    paho). Alternatives: the ``mqtt_replay`` source over a recorded
    log, or an MQTT→Kafka bridge with
    ``spark.readStream.format('kafka')``."""
    raise NotImplementedError(mqtt_source.__doc__)
