"""TTL-bounded streaming dedup on transformWithStateInPandas.

Gated on a working google.protobuf: transformWithState's Python worker
needs it, and this container ships a broken install (see
streaming/stateful.py docstring). The test runs fully wherever
protobuf is intact.
"""

import tempfile

import pytest

from arc_kinesis_tagging_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    streaming_dedup_ttl,
)


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(not _protobuf_ok(), reason="google.protobuf broken in container")
def test_streaming_dedup_ttl_first_seen_wins(spark, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src = str(tmp_path / "src")
        rows = [("k%d" % (i % 4), i) for i in range(12)]
        spark.createDataFrame(rows, "k string, v long").write.parquet(src)
        stream = spark.readStream.schema("k string, v long").parquet(src)
        out = []
        q = (
            streaming_dedup_ttl(stream, ["k"], ttl_minutes=60)
            .writeStream.foreachBatch(lambda df, b: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert {r["k"] for r in out} == {"k0", "k1", "k2", "k3"}
        assert len(out) == 4  # one survivor per key within the TTL
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
