"""Record-stream sources: a file-based emulator of the reference's
sharded Kinesis stream, plus the production Kinesis connector config.

The reference consumes gzip-compressed JSON records from two hardcoded
shards with one thread each (reference app.py:16-24, 89-96). Here the
stream is a Structured Streaming DataFrame of

    (data binary, shard_id string, seq long)

— the same shape a Kinesis connector source produces (`data`,
`shardId`, `sequenceNumber`). Tests write deterministic gzip'd-JSON
fixtures as parquet into shard subdirectories and read them with the
file source + Trigger.AvailableNow; production swaps in the connector
options without touching pipeline code. Spark's source handles shard
discovery, resharding, and checkpointed offsets — replacing the
reference's fixed two-thread layout (app.py:89-93) and its silent
data loss on restart (iterator at LATEST, never persisted, app.py:18).
"""

from __future__ import annotations

import gzip
import json
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("shard_id", StringType()),
        StructField("seq", LongType()),
    ]
)


def write_stream_fixture(
    spark: SparkSession,
    out_dir: str,
    records: Iterable[tuple[Any, int]],
) -> int:
    """Write (payload, shard) records as the parquet record stream.

    ``payload`` may be a dict (JSON-encoded then gzip'd — the normal
    wire format, reference app.py:33-41), a str (gzip'd as-is — the
    oversized-document S3-pointer class, app.py:44-45), or raw bytes
    (written untouched — the garbage/dead-letter class).
    """
    rows = []
    for seq, (payload, shard) in enumerate(records):
        if isinstance(payload, bytes):
            blob = payload
        elif isinstance(payload, str):
            blob = gzip.compress(payload.encode("utf-8"), mtime=0)
        else:
            blob = gzip.compress(
                json.dumps(payload, sort_keys=True).encode("utf-8"), mtime=0
            )
        rows.append((blob, f"shardId-{shard:012d}", seq))
    df = spark.createDataFrame(rows, RECORD_SCHEMA)
    df.repartition(2, "shard_id").write.mode("append").parquet(out_dir)
    return len(rows)


def read_record_stream(
    spark: SparkSession,
    in_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame over the fixture dir (file source).

    ``maxFilesPerTrigger`` is the analog of the reference's 20-record
    fetch limit (app.py:22-24) — micro-batch admission control; the
    trigger interval (set on the writer) replaces the fixed 3 s sleep
    (app.py:29,78), and empty micro-batches cost nothing.
    """
    reader = spark.readStream.schema(RECORD_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(in_dir)


def kinesis_source_options(
    stream_name: str,
    region: str,
    starting_position: str = "LATEST",
    role_arn: str | None = None,
) -> dict[str, str]:
    """Options for a real Kinesis connector deployment (e.g. the
    spark-sql-kinesis connector): the production drop-in for
    ``read_record_stream``. Mirrors the reference's configuration
    surface: stream name + region from env (reference app.py:84-87),
    STS assume-role auth (utility/aws.py:27-44), LATEST start
    (app.py:18). Not executable in this container (no AWS)."""
    opts = {
        "streamName": stream_name,
        "region": region,
        "startingPosition": starting_position,
    }
    if role_arn:
        opts["roleArn"] = role_arn
    return opts
