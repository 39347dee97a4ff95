"""End-to-end streaming golden test: gzip'd ANS-like records through
file-source micro-batches -> decode -> route -> filter -> project ->
foreachBatch autotag sink, including dead letters and checkpoint
recovery (the guarantees the reference lacks, SURVEY.md §2.A)."""

import gzip

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.streaming.pipeline import (
    dead_letters,
    story_pipeline,
)
from arc_kinesis_tagging_spark.streaming.sinks import (
    DocumentStore,
    autotag_sink,
    modify_tags,
)
from arc_kinesis_tagging_spark.streaming.source import (
    read_record_stream,
    write_stream_fixture,
)

TAG = {"slug": "kinesis-autotag", "text": "kinesis autotag"}


def story(doc_id, published=True, operation="insert-story", created=False, tags=None):
    doc = {
        "id": doc_id,
        "operation": operation,
        "published": published,
        "created": created,
        "type": "story",
        "trigger": {"referent_update": True},
        "body": {"headlines": {"basic": f"Headline {doc_id}"}, "revision": "rev-1"},
    }
    if tags is not None:
        doc["taxonomy"] = {"tags": tags}
    return doc


FIXTURE = [
    (story("doc-1"), 0),                                   # passes filter
    (story("doc-2", tags=[TAG]), 1),                       # passes; tag already present
    (story("doc-3", published=False), 0),                  # filtered: unpublished
    (story("doc-4", operation="update-story"), 1),         # filtered: wrong op
    (story("doc-5", created=True), 0),                     # passes; first publish
    ("s3://arc-big-docs/huge-doc-1.json", 0),              # oversized -> url pointer
    (b"\x00\x01garbage-not-gzip", 1),                      # dead letter
    (story("doc-missing"), 1),                             # passes; not in store -> sink dead letter
]


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream-fixture"))
    write_stream_fixture(spark, d, FIXTURE)
    return d


def run_pipeline_batch(spark, fixture_dir):
    records = spark.read.parquet(fixture_dir)
    return story_pipeline(records)


def test_batch_projection_golden(spark, fixture_dir):
    out = {r["_id"]: r.asDict() for r in run_pipeline_batch(spark, fixture_dir).collect()}
    assert set(out) == {"doc-1", "doc-2", "doc-5", "doc-missing"}
    r = out["doc-1"]
    assert r["headline"] == "Headline doc-1"
    assert r["revision"] == "rev-1"
    assert r["referent_update"] is True
    assert r["shard_origination"] == "shardId-000000000000"
    assert out["doc-2"]["tags"] == [(TAG["slug"], TAG["text"])]
    assert out["doc-1"]["tags"] is None  # taxonomy absent projects as null


def test_first_publish_only_filter(spark, fixture_dir):
    records = spark.read.parquet(fixture_dir)
    out = story_pipeline(records, first_publish_only=True).collect()
    assert {r["_id"] for r in out} == {"doc-5"}  # created==True conjunct (app.py:54)


def test_dead_letter_routing(spark, fixture_dir):
    records = spark.read.parquet(fixture_dir)
    dl = {(r["route"], r["url"]) for r in dead_letters(records).collect()}
    assert ("url_pointer", "s3://arc-big-docs/huge-doc-1.json") in dl
    assert ("dead_letter", None) in dl
    assert len(dl) == 2


def _seeded_store():
    store = DocumentStore()
    store.seed(
        {
            "doc-1": {"id": "doc-1", "body": {}},
            "doc-2": {"id": "doc-2", "taxonomy": {"tags": [TAG]}},
            "doc-5": {"id": "doc-5", "taxonomy": {"tags": [{"slug": "x", "text": "X"}]}},
        }
    )
    return store


def test_streaming_end_to_end_with_sink(spark, fixture_dir, tmp_path):
    store = _seeded_store()
    stream = story_pipeline(read_record_stream(spark, fixture_dir, max_files_per_trigger=1))
    q = (
        stream.writeStream.foreachBatch(autotag_sink(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # tagged: doc-1 (tag added), doc-2 (no-op, already present),
    # doc-5 (appended after existing tag)
    assert store.get("doc-1")["taxonomy"]["tags"] == [TAG]
    assert store.get("doc-2")["taxonomy"]["tags"] == [TAG]
    assert store.get("doc-5")["taxonomy"]["tags"] == [{"slug": "x", "text": "X"}, TAG]
    # per-record isolation: missing doc dead-lettered, stream completed
    assert ("doc-missing" in dict(store.dead_letters))


def test_checkpoint_recovery_idempotent(spark, fixture_dir, tmp_path):
    """Restart with the same checkpoint reprocesses nothing; a replay
    without checkpoint re-tags idempotently (append-if-absent)."""
    store = _seeded_store()
    ckpt = str(tmp_path / "ckpt2")

    def run():
        stream = story_pipeline(read_record_stream(spark, fixture_dir))
        q = (
            stream.writeStream.foreachBatch(autotag_sink(store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    puts_after_first = store.put_count
    run()  # restart from checkpoint: no new data -> no new puts
    assert store.put_count == puts_after_first
    # simulate at-least-once replay (fresh checkpoint, same data):
    # documents get re-tagged but tags don't duplicate
    store2 = _seeded_store()
    stream = story_pipeline(read_record_stream(spark, fixture_dir))
    q = (
        stream.writeStream.foreachBatch(autotag_sink(store2))
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert store2.get("doc-2")["taxonomy"]["tags"] == [TAG]


def test_modify_tags_unit():
    # the four input classes (utility/tag.py:31-46)
    assert modify_tags({}, TAG)["taxonomy"]["tags"] == [TAG]
    assert modify_tags({"taxonomy": {}}, TAG)["taxonomy"]["tags"] == [TAG]
    assert modify_tags({"taxonomy": {"tags": [TAG]}}, TAG)["taxonomy"]["tags"] == [TAG]
    other = {"slug": "a", "text": "A"}
    assert modify_tags({"taxonomy": {"tags": [other]}}, TAG)["taxonomy"]["tags"] == [other, TAG]


def test_two_stream_union_topology(spark, tmp_path):
    """Stream migration/resharding topology: two independent record
    streams (e.g. the old and new Kinesis stream during a cutover)
    union into ONE pipeline and one checkpointed sink. Structured
    Streaming tracks offsets per source, so each stream's records are
    delivered exactly once through the shared downstream plan; lineage
    (shard_origination) still identifies the origin stream."""
    d1 = str(tmp_path / "stream-a")
    d2 = str(tmp_path / "stream-b")
    write_stream_fixture(spark, d1, [(story(f"a-{i}"), 0) for i in range(4)])
    write_stream_fixture(spark, d2, [(story(f"b-{i}"), 1) for i in range(3)])

    from arc_kinesis_tagging_spark.streaming.source import read_record_stream

    merged = story_pipeline(
        read_record_stream(spark, d1).unionByName(read_record_stream(spark, d2))
    )
    got = []

    def collect_batch(df, _bid):
        got.extend(df.collect())

    q = (
        merged.writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ck-union"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["_id"] for r in got)
    assert ids == sorted([f"a-{i}" for i in range(4)] + [f"b-{i}" for i in range(3)])
    shards = {r["_id"]: r["shard_origination"] for r in got}
    assert all(shards[f"a-{i}"] == "shardId-000000000000" for i in range(4))
    assert all(shards[f"b-{i}"] == "shardId-000000000001" for i in range(3))
    # restart from the checkpoint with no new data: nothing re-delivered
    got2 = []

    def collect_batch2(df, _bid):
        got2.extend(df.collect())

    q2 = (
        merged.writeStream.foreachBatch(collect_batch2)
        .option("checkpointLocation", str(tmp_path / "ck-union"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert got2 == []
