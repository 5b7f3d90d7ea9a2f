"""CLI entry point — the reference binary's surface, Spark-shaped.

Reference: ``hermod -config config.toml [-sql]`` (cmd/hermod/main.go:
28-54). Here::

    python -m hermod_spark --config config.toml --sql
    python -m hermod_spark --config config.toml --source msgs.parquet \
        --out /data/out                      # batch run
    python -m hermod_spark --config config.toml --source log.jsonl \
        --stream --checkpoint /ckpt --out /data/out

``--sql`` prints merged DDL and exits without touching any source or
sink (main.go:49-54). The source is a parquet directory of canonical
message frames, or a recorded message spool replayed through the
``mqtt_replay`` DataSource — a ``.jsonl``/``.jsonl.gz`` log or a
SHARDED spool directory of such files. Transforms are loaded from a registry
module given with ``--transforms module.path`` exposing
``TRANSFORMS: dict[str, DataFrame->DataFrame]`` and optionally
``SCHEMAS: dict[str, Schema]``.
"""

from __future__ import annotations

import argparse
import importlib
import logging
import sys


def _is_spool(path: str) -> bool:
    """True when --source is a recorded message spool for the
    ``mqtt_replay`` DataSource: a ``.jsonl``/``.jsonl.gz`` log, or a
    directory holding such shards (a parquet source directory holds
    ``*.parquet``, so the two never collide)."""
    import glob
    import os

    if path.endswith(".jsonl") or path.endswith(".jsonl.gz"):
        return True
    if os.path.isdir(path):
        return bool(
            glob.glob(os.path.join(path, "*.jsonl"))
            or glob.glob(os.path.join(path, "*.jsonl.gz"))
        )
    return False


def _setup_logging(level: str) -> None:
    # reference levels DEBUG/INFO/ERROR (internal/logger/logger.go:13-20)
    logging.basicConfig(
        level={"DEBUG": logging.DEBUG, "INFO": logging.INFO, "ERROR": logging.ERROR}.get(
            level.upper(), logging.INFO
        ),
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hermod_spark")
    ap.add_argument("--config", required=True, help="TOML config path")
    ap.add_argument("--sql", action="store_true", help="print merged DDL and exit")
    ap.add_argument(
        "--source",
        help="parquet dir, .jsonl[.gz] message log, or sharded spool dir",
    )
    ap.add_argument("--out", help="parquet sink root (default: JDBC from config)")
    ap.add_argument("--stream", action="store_true", help="run as a stream")
    ap.add_argument("--checkpoint", help="stream checkpoint dir")
    ap.add_argument("--transforms", help="module exposing TRANSFORMS / SCHEMAS")
    ap.add_argument(
        "--quarantine",
        action="store_true",
        help="route structurally invalid records to the _quarantine "
        "table (raw + reason) instead of the reference's log-and-skip",
    )
    args = ap.parse_args(argv)

    from hermod_spark import config as C
    from hermod_spark.engine import Engine

    cfg = C.load(args.config)
    _setup_logging(cfg.logging.level)

    transforms, schemas = {}, {}
    if args.transforms:
        mod = importlib.import_module(args.transforms)
        transforms = getattr(mod, "TRANSFORMS", {})
        schemas = getattr(mod, "SCHEMAS", {})

    engine = Engine(cfg, transforms=transforms, schemas=schemas)

    if args.sql:  # offline mode: no session, no broker, no DB
        print(engine.generate_sql())
        return 0

    if not args.source:
        ap.error("--source is required unless --sql is given")

    from hermod_spark.session import get_spark

    spark = get_spark("hermod-spark-cli")
    if _is_spool(args.source):
        from hermod_spark.sources.mqtt import register as register_mqtt

        register_mqtt(spark)
        reader = (
            spark.readStream if args.stream else spark.read
        ).format("mqtt_replay").option("path", args.source)
        messages = reader.load()
    else:
        messages = (
            spark.readStream.parquet(args.source)
            if args.stream
            else spark.read.parquet(args.source)
        )

    if args.stream:
        q = engine.run_stream(
            messages,
            base_path=args.out,
            checkpoint=args.checkpoint,
            quarantine=args.quarantine,
        )
        q.awaitTermination()
    else:
        results = engine.run_batch(
            messages, base_path=args.out, quarantine=args.quarantine
        )
        for r in results:
            logging.getLogger("hermod_spark").info("wrote %s", r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
