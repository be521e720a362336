from sequin_spark.sinks.base import (
    Sink,
    SinkBatch,
    create_sink,
    register_sink,
    SINK_REGISTRY,
)

__all__ = ["Sink", "SinkBatch", "create_sink", "register_sink", "SINK_REGISTRY"]
