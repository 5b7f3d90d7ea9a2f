from hermod_spark.streaming.windows import hourly_rollup_stream, windowed_agg  # noqa: F401
