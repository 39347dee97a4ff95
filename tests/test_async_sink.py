"""Async-batched enrichment sink: concurrent per-batch GET->mutate->PUT
chains with per-record error isolation (the batched/async upgrade the
reference's own comments ask for, utility/tag.py:57-58)."""

import time

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.streaming.sinks import (
    AsyncDocumentStore,
    DocumentStore,
    autotag_sink_async,
)

TAG = {"slug": "wapo-autotag", "text": "Wapo Autotag"}


def _batch(spark, n=40, with_bad=True):
    ids = [(f"doc-{i}",) for i in range(n)]
    if with_bad:
        ids += [("doc-missing",), (None,)]
    return spark.createDataFrame(ids, "_id string")


def _seed(store, n=40):
    store.seed({f"doc-{i}": {"id": f"doc-{i}", "body": {}} for i in range(n)})


def test_async_sink_tags_and_isolates_errors(spark):
    store = AsyncDocumentStore()
    _seed(store)
    autotag_sink_async(store, tag=TAG)(_batch(spark), 0)
    for i in range(40):
        assert store.get(f"doc-{i}")["taxonomy"]["tags"] == [TAG]
    reasons = dict(store.dead_letters)
    assert "doc-missing" in reasons and "None" in reasons
    assert len(store.dead_letters) == 2
    assert store.put_count == 40


def test_async_sink_overlaps_latency(spark):
    # 40 docs x (10ms GET + 10ms PUT) = 800ms serially; with
    # max_concurrency=16 the chains overlap and the batch must finish
    # in a fraction of that (bound is loose for CI jitter).
    store = AsyncDocumentStore(latency_s=0.010)
    _seed(store)
    batch = _batch(spark, with_bad=False)
    batch.collect()  # warm the plan so timing measures only the sink
    t0 = time.time()
    autotag_sink_async(store, tag=TAG, max_concurrency=16)(batch, 0)
    elapsed = time.time() - t0
    assert store.put_count == 40
    assert elapsed < 0.55, f"async sink did not overlap latency: {elapsed:.2f}s"


def test_async_sink_adapts_sync_store(spark):
    # sync DocumentStore has no aget/aput -> to_thread adapter path
    store = DocumentStore()
    _seed(store, n=5)
    autotag_sink_async(store, tag=TAG)(_batch(spark, n=5), 0)
    for i in range(5):
        assert store.get(f"doc-{i}")["taxonomy"]["tags"] == [TAG]
    assert len(store.dead_letters) == 2


def test_async_sink_idempotent_replay(spark):
    store = AsyncDocumentStore()
    _seed(store, n=10)
    sink = autotag_sink_async(store, tag=TAG)
    b = _batch(spark, n=10, with_bad=False)
    sink(b, 0)
    sink(b, 1)  # at-least-once replay: re-tagged, never duplicated
    for i in range(10):
        assert store.get(f"doc-{i}")["taxonomy"]["tags"] == [TAG]
