from hermod_spark.sources.messages import message_frame, message_stream  # noqa: F401
