"""BatchMetricsListener: per-batch progress events become a queryable
metrics table (observability the reference consumer entirely lacks)."""

import time

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.streaming.metrics import BatchMetricsListener
from arc_kinesis_tagging_spark.streaming.pipeline import story_pipeline
from arc_kinesis_tagging_spark.streaming.source import read_record_stream
from tests.test_streaming_pipeline import FIXTURE, write_stream_fixture


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream-metrics-fixture"))
    write_stream_fixture(spark, d, FIXTURE)
    return d


def test_metrics_listener_collects_batches(spark, fixture_dir, tmp_path):
    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            story_pipeline(read_record_stream(spark, fixture_dir, max_files_per_trigger=1))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt-metrics"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously (possibly after
        # termination): wait until the event stream settles
        deadline, last_n, stable_since = time.time() + 30, -1, time.time()
        while time.time() < deadline:
            n = len(listener.snapshot())
            if n != last_n:
                last_n, stable_since = n, time.time()
            elif n > 0 and time.time() - stable_since > 2.0:
                break
            time.sleep(0.25)
        rows = listener.snapshot()
        assert rows, "no progress events captured"
        totals = listener.totals()
        assert totals["rows"] > 0 and totals["batches"] >= 1
        df = listener.to_df(spark)
        assert df.filter(F.col("num_input_rows") > 0).count() >= 1
        assert df.schema["batch_duration_ms"].dataType.typeName() == "long"
    finally:
        spark.streams.removeListener(listener)
