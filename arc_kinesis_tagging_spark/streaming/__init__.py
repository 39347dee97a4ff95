from arc_kinesis_tagging_spark.streaming.pipeline import (
    ANS_SCHEMA,
    decode_and_route,
    filter_publish_events,
    project_story_fields,
    story_pipeline,
)
from arc_kinesis_tagging_spark.streaming.source import (
    read_record_stream,
    write_stream_fixture,
)
from arc_kinesis_tagging_spark.streaming.sinks import (
    AsyncDocumentStore,
    DocumentStore,
    autotag_sink,
    autotag_sink_async,
)
from arc_kinesis_tagging_spark.streaming.kinesis_source import (
    KinesisEmuDataSource,
    write_kinesis_fixture,
)
from arc_kinesis_tagging_spark.streaming.metrics import BatchMetricsListener

__all__ = [
    "ANS_SCHEMA",
    "decode_and_route",
    "filter_publish_events",
    "project_story_fields",
    "story_pipeline",
    "read_record_stream",
    "write_stream_fixture",
    "AsyncDocumentStore",
    "DocumentStore",
    "autotag_sink",
    "autotag_sink_async",
    "KinesisEmuDataSource",
    "write_kinesis_fixture",
    "BatchMetricsListener",
]
