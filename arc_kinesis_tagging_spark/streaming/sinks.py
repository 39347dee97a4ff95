"""Keyed upsert sink with per-record error isolation and dead letters.

The reference's sink is two synchronous HTTP calls per record — GET the
full document, mutate, PUT it back (utility/tag.py:49-66) — with a
bare try/except around each record so one failure never stops the
stream (app.py:71-75). Here the same contract is a ``foreachBatch``
body over a DocumentStore interface:

- per micro-batch, keys are collected once and looked up in bulk (the
  async/batched upgrade the reference's own comments ask for,
  utility/tag.py:57-58);
- the tag mutation is append-if-absent (functions/arrays.py), so
  replayed micro-batches re-tag idempotently — this is what makes the
  at-least-once foreachBatch sink safe, fixing the reference's
  no-checkpoint data loss (app.py:18) without requiring an
  exactly-once sink;
- a failing record goes to the store's dead-letter list, never raises.

DocumentStore is in-memory for tests; a production implementation
keeps the same four methods over the Draft API (HTTP) or a key-value
store. At 100 TB the same pattern runs with a partition-parallel
``foreachPartition`` body instead of a driver-side loop — the
in-memory store forces driver-side here because it lives in the
driver process.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

from pyspark.sql import DataFrame

from arc_kinesis_tagging_spark.functions.arrays import AUTOTAG


class DocumentStore:
    """Thread-safe in-memory keyed document store (Draft API stand-in:
    get_document/update_document, utility/tag.py:12-29)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._docs: dict[str, dict[str, Any]] = {}
        self.dead_letters: list[tuple[str, str]] = []
        self.put_count = 0

    def seed(self, docs: dict[str, dict[str, Any]]) -> None:
        with self._lock:
            self._docs.update({k: dict(v) for k, v in docs.items()})

    def get(self, doc_id: str) -> dict[str, Any] | None:
        with self._lock:
            doc = self._docs.get(doc_id)
            return dict(doc) if doc is not None else None

    def put(self, doc_id: str, doc: dict[str, Any]) -> None:
        with self._lock:
            self._docs[doc_id] = dict(doc)
            self.put_count += 1

    def dead_letter(self, doc_id: str, reason: str) -> None:
        with self._lock:
            self.dead_letters.append((doc_id, reason))


def modify_tags(doc: dict[str, Any], tag: dict[str, str]) -> dict[str, Any]:
    """The intended ``modify_ans`` semantics (utility/tag.py:31-46):
    ensure taxonomy.tags exists, append ``tag`` iff absent. Fixes the
    reference's KeyError when taxonomy itself is missing
    (utility/tag.py:33-35 assigns into a dict that may not exist)."""
    out = dict(doc)
    taxonomy = dict(out.get("taxonomy") or {})
    tags = list(taxonomy.get("tags") or [])
    if tag not in tags:
        tags.append(tag)
    taxonomy["tags"] = tags
    out["taxonomy"] = taxonomy
    return out


def autotag_batch_sink(
    spark,
    store_path: str,
    tag: dict[str, str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Fully-distributed autotag sink: the document store is a keyed
    parquet table, and the whole R12->R15 composition runs as DataFrame
    ops — lookup is a join, the tag mutation is the Catalyst
    ``tag_upsert`` expression, writeback is the keyed upsert writer.
    Nothing iterates on the driver, so this is the shape that scales to
    a 1000-executor cluster (swap parquet for a MERGE-capable table
    format in production).

    Store schema: (_id string, revision string, tags array<struct>).
    Unknown _ids are dead-lettered to ``store_path + '.deadletter'``
    instead of failing the batch (R16).
    """
    from pyspark.sql import functions as F

    from arc_kinesis_tagging_spark.functions.arrays import make_tag, tag_upsert
    from arc_kinesis_tagging_spark.sources.readers import upsert_by_key_parquet

    t = tag or {"slug": AUTOTAG[0], "text": AUTOTAG[1]}
    tag_col = make_tag(t["slug"], t["text"])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keys = batch_df.select("_id", "seq").groupBy("_id").agg(
            F.max("seq").alias("seq")
        )
        store = spark.read.parquet(store_path)
        # enrichment lookup (R12) as a join against the store; the
        # batch's seq (version) wins over the store's stored seq.
        # Both sides must be MATERIALIZED (localCheckpoint) before the
        # upsert below overwrites the store files a lazy plan would
        # re-read.
        matched = keys.join(store.drop("seq"), "_id", "inner").localCheckpoint(eager=True)
        missing = keys.join(store, "_id", "left_anti").localCheckpoint(eager=True)
        # tag decision (R13) + idempotent array upsert (R14). The
        # written version must strictly exceed the stored one (seq+1):
        # a tagged row tying the seed's version would make the upsert
        # winner arbitrary. Replays rewrite the same seq+1 with
        # identical content, so idempotency holds.
        tagged = matched.withColumn("tags", tag_upsert(F.col("tags"), tag_col)).withColumn(
            "seq", F.col("seq") + 1
        )
        # keyed upsert writeback (R15): last-writer-wins by seq
        upsert_by_key_parquet(spark, tagged, store_path, "_id", "seq")
        # dead letters (R16): unknown documents, never a failed batch
        if not missing.isEmpty():
            missing.withColumn("reason", F.lit("document_not_found")).write.mode(
                "append"
            ).parquet(store_path + ".deadletter")

    return write_batch


def autotag_sink(
    store: DocumentStore,
    tag: dict[str, str] | None = None,
    decide: Callable[[dict[str, Any]], dict[str, str]] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: the autotag composition (utility/tag.py:49-66).

    ``decide`` is the tag-decision extension point (utility/tag.py:53-58
    marks it as the place for arbitrary business logic); default is the
    constant autotag (utility/tag.py:59-62).
    """
    default_tag = tag or {"slug": AUTOTAG[0], "text": AUTOTAG[1]}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Bulk-collect the micro-batch's keyed records once (vs the
        # reference's per-record serial HTTP round-trips). SAFETY: this
        # driver-side collect is bounded by source admission control —
        # maxRecordsPerShardPerBatch (streaming/kinesis_source.py) caps
        # a micro-batch at shards x maxRecords ids; without such a cap
        # on the source, collect() here would be corpus-sized.
        rows = batch_df.select("_id").distinct().collect()
        for row in rows:
            doc_id = row["_id"]
            try:
                if doc_id is None:
                    raise ValueError("record without id")
                doc = store.get(doc_id)
                if doc is None:
                    raise KeyError(f"document {doc_id} not found")
                chosen = decide(doc) if decide else default_tag
                store.put(doc_id, modify_tags(doc, chosen))
            except Exception as exc:  # per-record isolation (app.py:71-75)
                store.dead_letter(str(doc_id), f"{type(exc).__name__}: {exc}")

    return write_batch


class AsyncDocumentStore(DocumentStore):
    """DocumentStore with awaitable get/put and a configurable per-call
    latency — the test stand-in for an HTTP Draft API client, where each
    lookup/writeback is a network round-trip. A production
    implementation keeps ``aget``/``aput`` but backs them with an async
    HTTP client session."""

    def __init__(self, latency_s: float = 0.0) -> None:
        super().__init__()
        self.latency_s = latency_s
        # overlap telemetry: how many calls were in flight at once —
        # lets tests assert concurrency deterministically instead of
        # flaking on wall-clock under load
        self._in_flight = 0
        self.max_in_flight = 0

    async def aget(self, doc_id: str) -> dict[str, Any] | None:
        import asyncio

        with self._lock:
            self._in_flight += 1
            self.max_in_flight = max(self.max_in_flight, self._in_flight)
        try:
            if self.latency_s:
                await asyncio.sleep(self.latency_s)
            return self.get(doc_id)
        finally:
            with self._lock:
                self._in_flight -= 1

    async def aput(self, doc_id: str, doc: dict[str, Any]) -> None:
        import asyncio

        if self.latency_s:
            await asyncio.sleep(self.latency_s)
        self.put(doc_id, doc)


def autotag_sink_async(
    store: DocumentStore,
    tag: dict[str, str] | None = None,
    decide: Callable[[dict[str, Any]], dict[str, str]] | None = None,
    max_concurrency: int = 16,
) -> Callable[[DataFrame, int], None]:
    """Async-batched foreachBatch body: the reference's own comments ask
    for exactly this upgrade (utility/tag.py:57-58 — per-record serial
    GET/PUT round-trips dominate wall-clock when the store is remote).

    All of a micro-batch's GET->mutate->PUT chains run concurrently on
    one event loop, bounded by ``max_concurrency`` so a large batch
    can't stampede the remote API. Per-record error isolation is
    preserved: each chain has its own try/except routing failures to
    the dead-letter list (app.py:71-75), and one failure never cancels
    the gather. Stores without native ``aget``/``aput`` (the sync
    DocumentStore) are adapted via ``asyncio.to_thread``.

    At scale this body runs per PARTITION (foreachPartition) rather
    than driver-side, each task owning its own loop + HTTP session —
    concurrency then multiplies across executors while this per-batch
    cap still bounds the aggregate request rate per task.
    """
    import asyncio

    default_tag = tag or {"slug": AUTOTAG[0], "text": AUTOTAG[1]}
    has_async = hasattr(store, "aget") and hasattr(store, "aput")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # bounded by source admission control (maxRecordsPerShardPerBatch)
        # — see the sync sink's safety note above
        rows = batch_df.select("_id").distinct().collect()

        async def tag_one(sem: "asyncio.Semaphore", doc_id) -> None:
            async with sem:
                try:
                    if doc_id is None:
                        raise ValueError("record without id")
                    if has_async:
                        doc = await store.aget(doc_id)
                    else:
                        doc = await asyncio.to_thread(store.get, doc_id)
                    if doc is None:
                        raise KeyError(f"document {doc_id} not found")
                    chosen = decide(doc) if decide else default_tag
                    mutated = modify_tags(doc, chosen)
                    if has_async:
                        await store.aput(doc_id, mutated)
                    else:
                        await asyncio.to_thread(store.put, doc_id, mutated)
                except Exception as exc:  # per-record isolation
                    store.dead_letter(str(doc_id), f"{type(exc).__name__}: {exc}")

        async def run() -> None:
            sem = asyncio.Semaphore(max_concurrency)
            await asyncio.gather(*(tag_one(sem, r["_id"]) for r in rows))

        asyncio.run(run())

    return write_batch
