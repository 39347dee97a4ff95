"""Stream-static and stream-stream joins — the streaming forms of the
enrichment lookup (R12) and correlation queries."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

EV_SCHEMA = "event_id long, ts timestamp, user_id long, kind string"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sj-events"))
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "purchase"),
        (2, datetime(2024, 1, 1, 10, 20), 1, "error"),
        (3, datetime(2024, 1, 1, 10, 30), 1, "purchase"),
        (4, datetime(2024, 1, 1, 11, 0), 2, "error"),
        (5, datetime(2024, 1, 1, 11, 10), 2, "purchase"),
        (6, datetime(2024, 1, 1, 13, 0), 3, "purchase"),  # advances watermark
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_stream_static_join(spark, events_dir, sf_dir, tmp_path):
    """Streaming events enriched against a static dimension — the
    streaming analog of the broadcast lookup (R12); no watermark
    needed, the static side is simply broadcast per micro-batch."""
    from arc_kinesis_tagging_spark.sources.tables import load_table

    static_docs = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("user_id"), "lang"
    )
    stream = spark.readStream.schema(EV_SCHEMA).parquet(events_dir)
    joined = stream.join(F.broadcast(static_docs), "user_id", "left")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select event_id, lang from ss_join").collect()
    assert len(rows) == 6
    assert all(r["lang"] is not None for r in rows)  # user_ids 1-3 ⊂ doc_ids


def test_stream_stream_interval_join(spark, events_dir, tmp_path):
    """Stream-stream join with watermarks + interval condition:
    purchases correlated to errors of the same user within the
    following hour. State is bounded by the watermark (Spark drops
    buffered rows older than watermark + interval)."""
    purchases = (
        spark.readStream.schema(EV_SCHEMA)
        .parquet(events_dir)
        .filter(F.col("kind") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    errors = (
        spark.readStream.schema(EV_SCHEMA)
        .parquet(events_dir)
        .filter(F.col("kind") == "error")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "10 minutes")
    )
    joined = purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_interval")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["p_id"], r["e_id"])
        for r in spark.sql("select p_id, e_id from ss_interval").collect()
    }
    # purchase 1 (10:00) -> error 2 (10:20) same user within 1h;
    # purchase 5 (11:10) has no later error; purchase 3 (10:30) -> none.
    assert got == {(1, 2)}


def test_stream_stream_left_outer_join(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs emit immediately;
    unmatched left rows emit with nulls only after the watermark passes
    their join window (the engine holds them exactly that long —
    bounded state WITH guaranteed emission). Two runs over one
    checkpoint model the live stream: run 1 ingests the working set;
    run 2's late events advance the watermark past the earlier
    purchases' windows and the trailing no-data micro-batch flushes
    their null rows. The newest purchase's own window stays open, so
    it must NOT emit."""
    src = str(tmp_path / "louter-src")
    ck = str(tmp_path / "louter-ck")
    batch1 = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "purchase"),
        (2, datetime(2024, 1, 1, 10, 20), 1, "error"),
        (3, datetime(2024, 1, 1, 10, 30), 1, "purchase"),
        (5, datetime(2024, 1, 1, 11, 10), 2, "purchase"),
    ]
    spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        purchases = (
            spark.readStream.schema(EV_SCHEMA)
            .parquet(src)
            .filter(F.col("kind") == "purchase")
            .select(
                F.col("event_id").alias("p_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        errors = (
            spark.readStream.schema(EV_SCHEMA)
            .parquet(src)
            .filter(F.col("kind") == "error")
            .select(
                F.col("event_id").alias("e_id"),
                F.col("user_id").alias("e_user"),
                F.col("ts").alias("e_ts"),
            )
            .withWatermark("e_ts", "10 minutes")
        )
        joined = purchases.join(
            errors,
            (F.col("p_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("p_ts"))
            & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
            "leftOuter",
        )
        # foreachBatch, not the memory sink: memory-sink queries cannot
        # recover from a checkpoint, and run 2 must resume run 1's state
        def sink(bdf, _bid):
            emitted.extend(
                (r["p_id"], r["e_id"]) for r in bdf.select("p_id", "e_id").collect()
            )

        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    emitted: list = []
    run_once()
    got1 = set(emitted)
    assert (1, 2) in got1  # match emits immediately
    # watermark after run 1 = 11:10 - 10min = 11:00; purchase 3's join
    # window closes 11:30 -> still held, no nulls yet
    assert not {p for p, e in got1 if e is None}

    # Late events far in the future advance the watermark to 12:50,
    # past the windows of purchases 3 (11:30) and 5 (12:10). The
    # subtlety this test pins down: the global watermark is the MIN
    # across all watermarked inputs, so BOTH sides need a late event —
    # an idle side holds the whole join's state forever. Eviction then
    # happens in the trailing no-data micro-batch of the same run.
    spark.createDataFrame(
        [
            (6, datetime(2024, 1, 1, 13, 0), 3, "purchase"),
            (60, datetime(2024, 1, 1, 13, 0), 99, "error"),
        ],
        EV_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = set(emitted)
    unmatched = {p for p, e in got2 if e is None}
    # 3 and 5 flush with nulls; 1 already matched (no null row);
    # purchase 6's window (until 14:00) is still open: must be held
    assert unmatched == {3, 5}, got2
    assert (6, None) not in got2
