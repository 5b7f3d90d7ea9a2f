"""hermod_spark — a PySpark-native ingestion/transform/analytics engine.

Re-expresses the capabilities of the reference engine (marcgeld/Hermod, a
Go MQTT->Lua->Postgres streaming router; see SURVEY.md) as idiomatic Spark:
declarative DataFrame plans, Catalyst-optimized routing and transforms,
Structured Streaming for the live path, plus large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis) designed for 100 TB.

Layout:
    session    — SparkSession factory tuned for the scale posture
    data       — test-table loaders
    functions/ — topic-filter compiler, scalar fn library, text & similarity
    plans/     — route planner, schema registry/validation/DDL
    operators/ — relational surface, dedup, ANN, text ops, multimodal
    sources/   — batch/stream source adapters (file, kafka-shaped, MQTT stub)
    sinks/     — multi-table foreachBatch writer, dry-run, jdbc/parquet
    streaming/ — watermarked windowed aggregation builders
"""

__version__ = "0.1.0"

from hermod_spark import config, data, operators, plans, sinks, sources, streaming  # noqa: F401
from hermod_spark.engine import Engine  # noqa: F401
from hermod_spark.session import get_spark  # noqa: F401
