from hermod_spark.streaming.windows import hourly_rollup_stream, windowed_agg  # noqa: F401
from hermod_spark.streaming.stateful import dedup_stream, running_counts  # noqa: F401
from hermod_spark.streaming.rollup import (  # noqa: F401
    load_rollup_state,
    rollup_maintenance_sink,
    serve_rollup_state,
)
