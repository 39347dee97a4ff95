"""Streaming surface: lazy re-exports (PEP 562).

Why lazy: every fresh Python data-source worker (stream reader host,
write tasks, the commit callback) unpickles
``streaming.kinesis_source.KinesisEmuDataSource`` by reference, which
first executes this package ``__init__``. The eager form imported the
whole streaming surface (pipeline/source/sinks/metrics and their
pyspark.sql dependency chain) into every such worker — measured
~0.4 s per fresh worker at round 15, pure startup overhead for the
exactly-once tee path. Attribute access still resolves the same
public names, now on first use only.
"""

from __future__ import annotations

_EXPORTS = {
    "ANS_SCHEMA": "pipeline",
    "decode_and_route": "pipeline",
    "filter_publish_events": "pipeline",
    "project_story_fields": "pipeline",
    "story_pipeline": "pipeline",
    "read_record_stream": "source",
    "write_stream_fixture": "source",
    "AsyncDocumentStore": "sinks",
    "DocumentStore": "sinks",
    "autotag_sink": "sinks",
    "autotag_sink_async": "sinks",
    "KinesisEmuDataSource": "kinesis_source",
    "write_kinesis_fixture": "kinesis_source",
    "BatchMetricsListener": "metrics",
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    return getattr(importlib.import_module(f"{__name__}.{mod}"), name)
