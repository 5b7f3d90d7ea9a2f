from hermod_spark.sinks.writer import MultiTableWriter  # noqa: F401
