"""hermod_spark — a PySpark-native ingestion/transform/analytics engine.

Re-expresses the capabilities of the reference engine (marcgeld/Hermod, a
Go MQTT->Lua->Postgres streaming router; see SURVEY.md) as idiomatic Spark:
declarative DataFrame plans, Catalyst-optimized routing and transforms,
Structured Streaming for the live path, plus large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis) designed for 100 TB.

Layout:
    session    — SparkSession factory tuned for the scale posture
    config     — the reference's TOML config schema (routes drive plans)
    engine     — config + transforms + schemas → runnable batch/stream plans
    data       — test-table loaders + partitioning guard
    functions/ — topic-filter compiler, scalar fn library, text columns
    plans/     — route planner, schema registry/validation/DDL
    operators/ — relational surface; dedup (exact/MinHash-LSH/SimHash/
                 semantic + audits); ANN (brute/LSH/IVF/PQ) + PCA/JL
                 projection + class outliers; text ops (metrics, winnow,
                 CDC, novelty, PII, quality); curation (split/chunk/pack/
                 mixture planning/shard shuffle + writer/source report);
                 sketches
                 (KMV incl. merge proof, HLL check, count-min, Bloom);
                 multimodal (decode plumbing, resize/frame/audio plans,
                 aspect-bucket batching)
    sources/   — message frames, file streams, MQTT DataSources (replay+live)
    sinks/     — multi-table writer (dry-run, exactly-once), retention,
                 compaction + Z-order clustering keys
    streaming/ — watermarked windows (tumbling/sliding/session/trending),
                 stream joins + Bloom decontamination, stateful dedup/
                 counters/EWMA/KMV
    __main__   — CLI (--config / --sql / batch / stream)
"""

__version__ = "0.1.0"

from hermod_spark import config, data, operators, plans, sinks, sources, streaming  # noqa: F401
from hermod_spark.engine import Engine  # noqa: F401
from hermod_spark.session import get_spark  # noqa: F401
