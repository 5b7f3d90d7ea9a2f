from hermod_spark.sources.messages import message_frame, message_stream  # noqa: F401
from hermod_spark.sources.mqtt import (  # noqa: F401
    MqttDataSource,
    MqttReplayDataSource,
    write_message_log,
)
from hermod_spark.sources.mqtt import register as register_mqtt_sources  # noqa: F401
