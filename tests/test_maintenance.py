"""Small-file compaction and the streaming -> durable parquet upsert
path (stream pipeline feeding upsert_by_key_parquet via foreachBatch)."""

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.sources.maintenance import (
    compact_parquet,
    parquet_file_count,
)
from arc_kinesis_tagging_spark.sources.readers import upsert_by_key_parquet
from arc_kinesis_tagging_spark.sources.tables import load_table
from arc_kinesis_tagging_spark.streaming.pipeline import story_pipeline
from arc_kinesis_tagging_spark.streaming.source import (
    read_record_stream,
    write_stream_fixture,
)


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    orders = load_table(spark, "orders", sf_dir)
    orders.repartition(64).write.parquet(out)  # fragment: 64 small files
    before_files = parquet_file_count(out)
    before = sorted(r["o_orderkey"] for r in spark.read.parquet(out).collect())
    n_files = compact_parquet(spark, out, target_rows_per_file=1_000_000)
    after_files = parquet_file_count(out)
    after = sorted(r["o_orderkey"] for r in spark.read.parquet(out).collect())
    assert before_files == 64 and n_files == 1 and after_files == 1
    assert before == after


def story(doc_id, rev):
    return {
        "id": doc_id,
        "operation": "insert-story",
        "published": True,
        "type": "story",
        "body": {"headlines": {"basic": f"h-{rev}"}, "revision": rev},
    }


def test_stream_to_parquet_upsert(spark, tmp_path):
    """Streaming pipeline -> foreachBatch(upsert_by_key_parquet):
    replays and re-publishes converge to one row per document with the
    latest revision (last-writer-wins by seq)."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    write_stream_fixture(
        spark,
        src,
        [
            (story("a", "r1"), 0),
            (story("b", "r1"), 1),
            (story("a", "r2"), 0),  # later revision of a
        ],
    )

    def upsert_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        upsert_by_key_parquet(spark, batch_df, store, "_id", "seq")

    q = (
        story_pipeline(read_record_stream(spark, src))
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["_id"]: r["revision"] for r in spark.read.parquet(store).collect()}
    assert rows == {"a": "r2", "b": "r1"}
    # replay from scratch (fresh checkpoint): still converges, no dups
    q2 = (
        story_pipeline(read_record_stream(spark, src))
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(store)
    assert got.count() == 2
    assert {r["_id"]: r["revision"] for r in got.collect()} == {"a": "r2", "b": "r1"}


def test_distributed_autotag_batch_sink(spark, tmp_path):
    """The fully-DataFrame autotag sink: store as keyed parquet,
    lookup=join, mutate=tag_upsert expression, writeback=keyed upsert;
    unknown ids dead-letter; replay is idempotent."""
    from arc_kinesis_tagging_spark.streaming.sinks import autotag_batch_sink

    TAG = {"slug": "kinesis-autotag", "text": "kinesis autotag"}
    store = str(tmp_path / "docstore")
    seed = spark.createDataFrame(
        [
            ("a", "r1", None, 0),
            ("b", "r1", [("politics", "Politics")], 0),
            ("c", "r1", [(TAG["slug"], TAG["text"])], 0),
        ],
        "_id string, revision string, tags array<struct<slug:string,text:string>>, seq long",
    )
    seed.write.parquet(store)

    src = str(tmp_path / "src")
    write_stream_fixture(
        spark,
        src,
        [(story("a", "r2"), 0), (story("c", "r2"), 1), (story("ghost", "r1"), 0)],
    )

    def run(ck):
        q = (
            story_pipeline(read_record_stream(spark, src))
            .writeStream.foreachBatch(autotag_batch_sink(spark, store))
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    rows = {r["_id"]: [t.asDict() for t in (r["tags"] or [])] for r in spark.read.parquet(store).collect()}
    assert rows["a"] == [TAG]
    assert rows["b"] == [{"slug": "politics", "text": "Politics"}]  # untouched
    assert rows["c"] == [TAG]  # idempotent: already tagged
    dl = spark.read.parquet(store + ".deadletter").collect()
    assert {r["_id"] for r in dl} == {"ghost"}
    # replay with fresh checkpoint: tags unchanged (no duplicates)
    run("ck2")
    rows2 = {r["_id"]: [t.asDict() for t in (r["tags"] or [])] for r in spark.read.parquet(store).collect()}
    assert rows2 == rows


def test_orc_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    """ORC must honor the same compaction contract as parquet
    (round-8 verdict: ORC had pushdown gates only): 64 fragment files
    rewrite to 1, row set unchanged."""
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_table,
        table_file_count,
    )

    out = str(tmp_path / "frag-orc")
    orders = load_table(spark, "orders", sf_dir)
    orders.repartition(64).write.orc(out)
    before_files = table_file_count(out, "orc")
    before = sorted(r["o_orderkey"] for r in spark.read.orc(out).collect())
    n_files = compact_table(spark, out, target_rows_per_file=1_000_000, fmt="orc")
    after_files = table_file_count(out, "orc")
    after = sorted(r["o_orderkey"] for r in spark.read.orc(out).collect())
    assert before_files == 64 and n_files == 1 and after_files == 1
    assert before == after


def test_compact_ivf_index_preserves_pruning_and_rows(spark, tmp_path):
    """Partition-preserving compaction: fragment an IVF index with
    several appends, compact, and require (a) one file per cell dir,
    (b) identical rows, (c) probes still partition-prune and return
    the same top-k."""
    import glob

    from arc_kinesis_tagging_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_ivf_index,
    )

    def vecs(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id as vec_id",
            "transform(sequence(0, 7), "
            "j -> cos(double(id % 16) + j)) as embedding",
        )

    path = str(tmp_path / "ivf")
    build_ivf_index(spark, vecs(0, 64), path, nlist=4)
    for i in range(3):  # fragment: one file set per append per cell
        append_ivf_index(spark, vecs(64 + i * 16, 80 + i * 16), path)
    before = {
        r["vec_id"]: r["cell_id"]
        for r in spark.read.parquet(path + "/index").collect()
    }
    q = vecs(0, 4).withColumnRenamed("vec_id", "query_id")
    topk_before = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in query_ivf_index(spark, path, q, k=3, round_dp=6).collect()
    }
    assert any(  # precondition: genuinely fragmented
        len(glob.glob(d + "/*.parquet")) > 1
        for d in glob.glob(path + "/index/cell_id=*")
    )
    compact_ivf_index(spark, path)
    after = {
        r["vec_id"]: r["cell_id"]
        for r in spark.read.parquet(path + "/index").collect()
    }
    assert after == before  # row- and assignment-preserving
    for d in glob.glob(path + "/index/cell_id=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1  # one file per cell
    topk_after = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in query_ivf_index(spark, path, q, k=3, round_dp=6).collect()
    }
    assert topk_after == topk_before


def test_compact_bucketed_table_keeps_zero_exchange_join(spark, tmp_path):
    """Bucket-preserving compaction: append-fragment a corpus band
    table, compact, and require identical rows AND that a same-spec
    bucketed join still plans with zero Exchange."""
    import uuid

    from arc_kinesis_tagging_spark.operators.skew import write_bucketed
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
    )

    name = "akt_cbt_" + uuid.uuid4().hex[:12]
    base = spark.range(100).selectExpr("id as digest", "id * 2 as v")
    write_bucketed(base, name, ["digest"], n_buckets=4)
    spark.range(100, 150).selectExpr(
        "id as digest", "id * 2 as v"
    ).write.mode("append").bucketBy(4, "digest").sortBy(
        "digest"
    ).format("parquet").saveAsTable(name)
    before = sorted(
        (r["digest"], r["v"]) for r in spark.table(name).collect()
    )
    compact_bucketed_table(spark, name, ["digest"], n_buckets=4)
    after = sorted(
        (r["digest"], r["v"]) for r in spark.table(name).collect()
    )
    assert after == before
    other = "akt_cbt2_" + uuid.uuid4().hex[:12]
    write_bucketed(
        spark.range(150).selectExpr("id as digest"), other, ["digest"],
        n_buckets=4,
    )
    plan = (
        spark.table(name)
        .hint("merge")
        .join(spark.table(other), "digest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # bucket spec survived compaction


def test_compact_reattached_external_gate_corpus(spark, tmp_path):
    """The post-restart path the gate corpora actually live on (the
    round-11 verdict's #1): after a driver restart the gates re-attach
    their band tables as EXTERNAL tables (dedup_gate._ensure_registered)
    — the previous in-place saveAsTable(Overwrite) compaction crashed
    there with LOCATION_ALREADY_EXISTS. End to end: append-fragment the
    corpus across 'micro-batches' -> restart (catalog entry lost, files
    survive) -> re-attach -> compact -> identical rows, fewer files,
    table still EXTERNAL, probe admissions unchanged, and a same-spec
    bucketed join still plans with zero Exchange."""
    import os
    import shutil
    import uuid

    from arc_kinesis_tagging_spark.operators.dedup import (
        phash_batch_against_corpus,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        append_phash_corpus,
        ensure_corpus_registered,
    )

    prefix = "akt_cbx_" + uuid.uuid4().hex[:12]
    name = f"{prefix}_bands"
    # three appends = three file sets, exactly how a gate fragments it
    for lo in (0, 30, 60):
        append_phash_corpus(
            spark,
            spark.createDataFrame(
                [(i, (i << 20) | 0b1010) for i in range(lo, lo + 30)],
                "media_id long, phash long",
            ),
            prefix,
        )
    loc = table_location(spark, name)
    saved = str(tmp_path / "saved")
    shutil.copytree(loc, saved)
    spark.sql(f"DROP TABLE {name}")  # managed drop deletes the files
    shutil.copytree(saved, loc)  # ... which the 'restart' restores
    assert ensure_corpus_registered(spark, prefix)
    before_rows = sorted(tuple(r) for r in spark.table(name).collect())
    before_files = parquet_file_count(loc)
    assert before_files >= 3
    compact_bucketed_table(spark, name, ["chunk"], n_buckets=16)
    assert (
        sorted(tuple(r) for r in spark.table(name).collect())
        == before_rows
    )
    # task==bucket alignment: EXACTLY one file per non-empty bucket
    assert parquet_file_count(loc) <= 16
    assert not os.path.exists(loc + "__compact_tmp")
    assert not os.path.exists(loc + "__compact_trash")
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    }
    assert desc.get("Type") == "EXTERNAL"  # a SECOND restart re-attaches
    # the probe still admits/drops identically: 100 is hamming-0 of
    # corpus id 2, 101 matches nothing
    dup = phash_batch_against_corpus(
        spark,
        spark.createDataFrame(
            [(100, (2 << 20) | 0b1010), (101, -12345)],
            "media_id long, phash long",
        ),
        prefix,
    )
    assert sorted(
        r["id_batch"] for r in dup.select("id_batch").distinct().collect()
    ) == [100]
    # bucket spec survived the swap: same-spec merge join, no Exchange
    import uuid as _uuid

    from arc_kinesis_tagging_spark.operators.skew import write_bucketed

    other = "akt_cbx2_" + _uuid.uuid4().hex[:12]
    write_bucketed(
        spark.table(name).select("chunk").distinct(),
        other,
        ["chunk"],
        n_buckets=16,
    )
    plan = (
        spark.table(name)
        .hint("merge")
        .join(spark.table(other), "chunk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_interrupted_swap_heals_instead_of_fresh_corpus(spark, tmp_path):
    """A crash between the compactor's two renames leaves the corpus
    at <loc>__compact_trash with <loc> missing. That state must NEVER
    read as 'fresh corpus': recover_interrupted_compaction restores
    it, the gates' re-attach runs the recovery before deciding, and
    the next compaction heals then compacts (the recovery copy is
    never pre-cleaned away)."""
    import os
    import shutil
    import uuid

    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
        recover_interrupted_compaction,
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        append_phash_corpus,
        ensure_corpus_registered,
    )

    prefix = "akt_heal_" + uuid.uuid4().hex[:12]
    name = f"{prefix}_bands"
    append_phash_corpus(
        spark,
        spark.createDataFrame(
            [(i, (i << 30) | 0b101) for i in range(20)],
            "media_id long, phash long",
        ),
        prefix,
    )
    loc = table_location(spark, name)
    rows = sorted(tuple(r) for r in spark.table(name).collect())
    # driver restart AND interrupted swap: catalog gone, loc at trash
    saved = str(tmp_path / "saved")
    shutil.copytree(loc, saved)
    spark.sql(f"DROP TABLE {name}")
    shutil.copytree(saved, loc + "__compact_trash")
    assert not os.path.exists(loc)
    # the gate's re-attach heals it and the corpus content is intact
    assert ensure_corpus_registered(spark, prefix)
    assert sorted(tuple(r) for r in spark.table(name).collect()) == rows
    # a SECOND interrupted swap, healed by the next compaction itself
    os.rename(loc, loc + "__compact_trash")
    spark.catalog.refreshTable(name)
    compact_bucketed_table(spark, name, ["chunk"])
    assert sorted(tuple(r) for r in spark.table(name).collect()) == rows
    assert not os.path.exists(loc + "__compact_trash")
    # idempotent no-op when nothing is interrupted
    assert recover_interrupted_compaction(spark, loc) is False


def test_compact_ivf_index_survives_interrupted_swap(spark, tmp_path):
    """The embedding gate's index compactor is temp-swap too (the
    old in-place overwrite could lose cells mid-crash while
    /centroids survived — silent admissions forever). An interrupted
    swap of /index is healed by recovery, and compaction is
    row-preserving with one file per cell dir."""
    import os

    from arc_kinesis_tagging_spark.operators.similarity import (
        build_ivf_index,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_ivf_index,
        recover_interrupted_compaction,
    )

    emb = load_table(spark, "embeddings", sf_dir="/root/testdata/sf0.001")
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.limit(200), path, nlist=4)
    idx = os.path.join(path, "index")
    n = spark.read.parquet(idx).count()
    os.rename(idx, idx + "__compact_trash")  # crashed mid-swap
    assert recover_interrupted_compaction(spark, idx)
    assert spark.read.parquet(idx).count() == n
    compact_ivf_index(spark, path)
    assert spark.read.parquet(idx).count() == n
    for d in os.listdir(idx):
        if d.startswith("cell_id="):
            files = [
                f for f in os.listdir(os.path.join(idx, d))
                if f.startswith("part-")
            ]
            assert len(files) == 1, (d, files)


def test_release_pinned_blocks_frees_localcheckpoint_pins(spark):
    """release_pinned_blocks (round-15 §5 audit) must unpersist every
    executor-pinned RDD — including the blocks a lazy localCheckpoint
    materialized — and leave the session's persistent-RDD registry
    empty. Uses a builder-shaped pin (lazy checkpoint, action, then
    release after the output is materialized)."""
    from arc_kinesis_tagging_spark.sources.maintenance import (
        release_pinned_blocks,
    )

    # Isolate from pins left by other tests in the shared session.
    release_pinned_blocks(spark)

    pinned = (
        spark.range(1000)
        .selectExpr("id", "id * 2 AS v")
        .localCheckpoint(eager=False)
    )
    out = pinned.groupBy((pinned.id % 7).alias("k")).count()
    assert out.count() == 7  # materializes the pin
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert jmap.size() >= 1  # the pin is registered

    n = release_pinned_blocks(spark)
    assert n >= 1
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
