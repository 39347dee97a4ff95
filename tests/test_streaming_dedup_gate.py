"""Streaming cross-batch image-dedup gate e2e: real PNGs through the
emulated Kinesis connector in capped micro-batches, each batch probed
against the growing persisted pHash corpus — later batches' near-dups
of earlier batches are dropped, in-batch groups keep their smallest
id, corrupt images pass through (R16), and a replayed epoch is a
no-op (marker idempotency)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.streaming.dedup_gate import (
    make_phash_dedup_gate,
)
from arc_kinesis_tagging_spark.streaming.kinesis_source import (
    KinesisEmuDataSource,
    write_kinesis_fixture,
)


def _png_blobs(spark, ids):
    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_phash_media,
    )

    df = spark.range(max(ids) + 1).withColumnRenamed("id", "doc_id")
    blobs = {
        r["media_id"]: bytes(r["media"])
        for r in attach_phash_media(df, "doc_id").collect()
        if r["media_id"] in set(ids)
    }
    return [blobs[i] for i in ids]


def test_streaming_phash_gate_dedups_across_batches(spark, tmp_path):
    # fixture groups of 4: ids i//4 share a base image, in-group
    # hamming <= 4 (pinned in tests/test_phash.py). Stream order puts
    # group representatives in batch 1 and their near-dups in batch 2.
    order = [0, 4, 8, 3, 1, 5, 9, 2]
    blobs = _png_blobs(spark, order)
    src = str(tmp_path / "src")
    write_kinesis_fixture(src, [(b, 0) for b in blobs])
    spark.dataSource.register(KinesisEmuDataSource)

    accepted: list[tuple[int, list[int]]] = []

    def sink(df, batch_id):
        accepted.append(
            (int(batch_id), sorted(r["media_id"] for r in df.collect()))
        )

    prefix = "akt_gate_" + uuid.uuid4().hex[:12]  # unique: the
    # warehouse outlives pytest runs and ensure_corpus_registered would
    # resurrect a stale corpus under a repeated tmp_path-derived name
    gate = make_phash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    q = (
        spark.readStream.format("kinesis_emu")
        .option("streamDir", src)
        .option("maxRecordsPerShardPerBatch", "4")
        .load()
        .select(
            F.col("seq").cast("long").alias("media_id"),
            F.col("data").alias("media"),
        )
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = {bid: ids for bid, ids in accepted}
    all_ids = [i for ids in emitted.values() for i in ids]
    # seq == stream position; group ids arrived in `order`:
    # batch with seqs {0,1,2,3} = media ids {0,4,8,3}: (0,3) are
    # group-0 near-dups -> keep seq of id 0; 4 and 8 are group reps.
    # batch {4..7} = ids {1,5,9,2}: every one is a near-dup of an
    # already-accepted corpus image -> all dropped.
    pos = {seq: media for seq, media in enumerate(order)}
    accepted_media = sorted(pos[s] for s in all_ids)
    assert accepted_media == [0, 4, 8]
    # corpus grew by exactly the accepted rows x 5 bands
    corpus = spark.table(f"{prefix}_bands")
    assert corpus.count() == 3 * 5
    assert corpus.select("key").distinct().count() == 3

    # replay idempotency: re-invoking a seen batch id is a no-op
    n_before = len(accepted)
    batch1 = (
        spark.read.format("kinesis_emu")
        .option("streamDir", src)
        .load()
        .filter(F.col("seq") < 4)
        .select(
            F.col("seq").cast("long").alias("media_id"),
            F.col("data").alias("media"),
        )
    )
    gate(batch1, 0)
    assert len(accepted) == n_before
    assert spark.table(f"{prefix}_bands").count() == 15


def test_streaming_phash_gate_passes_corrupt_and_skips_corpus(
    spark, tmp_path
):
    """A corrupt image must be ACCEPTED (null hash matches nothing;
    dropping it would violate per-record isolation) and must NOT
    enter the corpus."""
    import pandas as pd

    accepted = []

    def sink(df, batch_id):
        accepted.extend(r["media_id"] for r in df.collect())

    prefix = "akt_gatec_" + uuid.uuid4().hex[:12]
    gate = make_phash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    blobs = _png_blobs(spark, [0])
    batch = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0, 999], "media": [blobs[0], b"not a png"]}
        )
    )
    gate(batch, 0)
    assert sorted(accepted) == [0, 999]
    assert [
        r["key"]
        for r in spark.table(f"{prefix}_bands")
        .select("key")
        .distinct()
        .collect()
    ] == [0]


def test_ensure_corpus_registered_reattaches_after_catalog_loss(
    spark, tmp_path
):
    """Driver restart simulation: the corpus FILES survive in the
    warehouse but the session-scoped catalog entry is gone — the gate
    must re-attach (external bucketed table) instead of silently
    skipping the corpus probe and colliding on append."""
    import os
    import shutil

    from arc_kinesis_tagging_spark.operators.multimodal import phash_gray
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        append_phash_corpus,
        ensure_corpus_registered,
    )

    prefix = "akt_reg_" + uuid.uuid4().hex[:12]
    name = f"{prefix}_bands"
    blobs = _png_blobs(spark, [0, 4])
    import pandas as pd

    hashes = phash_gray(
        spark.createDataFrame(
            pd.DataFrame({"media_id": [0, 4], "media": blobs})
        ),
        "media_id",
        "media",
    )
    append_phash_corpus(spark, hashes, prefix)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, name.lower())
    saved = str(tmp_path / "saved")
    shutil.copytree(loc, saved)
    spark.sql(f"DROP TABLE {name}")  # managed drop deletes the files
    assert not spark.catalog.tableExists(name)
    shutil.copytree(saved, loc)  # ... which the 'restart' restores
    assert ensure_corpus_registered(spark, prefix)
    got = sorted(
        r["key"]
        for r in spark.table(name).select("key").distinct().collect()
    )
    assert got == [0, 4]
    # append to the re-attached external table still works
    blob8 = _png_blobs(spark, [8])[0]
    append_phash_corpus(
        spark,
        phash_gray(
            spark.createDataFrame(
                pd.DataFrame({"media_id": [8], "media": [blob8]})
            ),
            "media_id",
            "media",
        ),
        prefix,
    )
    assert spark.table(name).select("key").distinct().count() == 3
    # fresh-corpus case: no files, no table -> False, no side effects
    assert not ensure_corpus_registered(spark, "akt_reg_nonexistent")


def test_ahash_gate_dedups_audio_across_batches(spark, tmp_path):
    """The AUDIO gate (same machinery at hash_bits=60): batch 1
    accepts group representatives; batch 2's group-mates are near-dups
    of the now-persisted fingerprint corpus and are dropped."""
    import pandas as pd

    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_ahash_media,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_ahash_dedup_gate,
    )

    def wavs(ids):
        df = spark.range(max(ids) + 1).withColumnRenamed("id", "doc_id")
        blobs = {
            r["media_id"]: bytes(r["media"])
            for r in attach_ahash_media(df, "doc_id").collect()
            if r["media_id"] in set(ids)
        }
        return blobs

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["media_id"] for r in df.collect()))

    prefix = "akt_agate_" + uuid.uuid4().hex[:12]
    gate = make_ahash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    b1 = wavs([0, 4, 3])  # group reps 0, 4 + in-batch dup 3 (group 0)
    gate(
        spark.createDataFrame(
            pd.DataFrame(
                {"media_id": list(b1), "media": list(b1.values())}
            )
        ),
        0,
    )
    b2 = wavs([1, 5])  # near-dups of corpus entries 0 and 4
    gate(
        spark.createDataFrame(
            pd.DataFrame(
                {"media_id": list(b2), "media": list(b2.values())}
            )
        ),
        1,
    )
    assert accepted == [[0, 4], []]
    corpus = spark.table(f"{prefix}_bands")
    assert corpus.select("key").distinct().count() == 2
    assert corpus.count() == 2 * 5  # 5 bands at hash_bits=60


def test_vhash_gate_dedups_video_across_batches(spark, tmp_path):
    """The VIDEO gate: strict temporal criterion against the persisted
    per-frame band corpus; in-batch keeps the smallest id; a corrupt
    video is accepted (null frame hash) and stays out of the corpus."""
    import pandas as pd

    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_vhash_media,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_vhash_dedup_gate,
    )

    def vids(ids):
        df = spark.range(max(ids) + 1).withColumnRenamed("id", "doc_id")
        return {
            r["media_id"]: bytes(r["media"])
            for r in attach_vhash_media(df, "doc_id").collect()
            if r["media_id"] in set(ids)
        }

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["media_id"] for r in df.collect()))

    prefix = "akt_vgate_" + uuid.uuid4().hex[:12]
    gate = make_vhash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    b1 = vids([0, 4, 3])
    gate(
        spark.createDataFrame(
            pd.DataFrame({"media_id": list(b1), "media": list(b1.values())})
        ),
        0,
    )
    b2 = vids([1, 5])
    rows2 = pd.DataFrame(
        {
            "media_id": [*b2, 999],
            "media": [*b2.values(), b"not a y4m"],
        }
    )
    gate(spark.createDataFrame(rows2), 1)
    # batch 1: (0,3) temporal near-dups -> keep 0; batch 2: 1 and 5
    # match corpus entries 0 and 4; corrupt 999 passes through
    assert accepted == [[0, 4], [999]]
    corpus = spark.table(f"{prefix}_bands")
    assert sorted(
        r["key"] for r in corpus.select("key").distinct().collect()
    ) == [0, 4]
    # 2 sampled frames x 5 bands per accepted video
    assert corpus.count() == 2 * 2 * 5
    # marker idempotency holds for the video gate too
    gate(spark.createDataFrame(rows2), 1)
    assert accepted == [[0, 4], [999]]


def test_vhash_probe_tolerates_duplicate_corpus_rows(spark, tmp_path):
    """The append-then-crash replay can leave the same (key, frame)
    band rows twice in the video corpus; the strict temporal verify
    must still match near-dups (a duplicate-intolerant count would
    see n_aligned = 2*nf and silently ADMIT true duplicates —
    round-11 follow-up review finding)."""
    import pandas as pd

    from arc_kinesis_tagging_spark.operators.dedup import (
        vhash_batch_against_corpus,
    )
    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_vhash_media,
        vhash_frames,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        append_vhash_corpus,
    )

    def fhashes(ids):
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": ids})
        )
        return vhash_frames(
            attach_vhash_media(docs, "doc_id"), "media_id", "media",
            every=2,
        )

    prefix = "akt_vdup_" + uuid.uuid4().hex[:12]
    corpus_h = fhashes([0])
    append_vhash_corpus(spark, corpus_h, prefix)
    append_vhash_corpus(spark, corpus_h, prefix)  # the crash replay
    assert spark.table(f"{prefix}_bands").count() == 2 * 2 * 5
    got = vhash_batch_against_corpus(
        spark, fhashes([1]), prefix, "media_id", "frame_idx", "fhash"
    ).collect()
    # id 1 is id 0's in-group near-dup: MUST match despite the dups
    assert [(r["id_batch"], r["id_corpus"]) for r in got] == [(1, 0)]
    assert got[0]["n_frames"] == 2


def test_gate_id_col_is_honored(spark, tmp_path):
    """The gate factories expose id_col; the hash functions emit a
    fixed 'media_id' output, so the gate must rename — a custom id
    column used to crash with UNRESOLVED_COLUMN."""
    import pandas as pd

    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_ahash_media,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_ahash_dedup_gate,
    )

    df = spark.range(2).withColumnRenamed("id", "doc_id")
    blobs = {
        r["media_id"]: bytes(r["media"])
        for r in attach_ahash_media(df, "doc_id").collect()
    }
    accepted = []
    gate = make_ahash_dedup_gate(
        spark,
        "akt_idc_" + uuid.uuid4().hex[:12],
        str(tmp_path / "markers"),
        lambda d, b: accepted.extend(r["clip_id"] for r in d.collect()),
        id_col="clip_id",
    )
    gate(
        spark.createDataFrame(
            pd.DataFrame(
                {"clip_id": [0, 1], "media": [blobs[0], blobs[1]]}
            )
        ),
        0,
    )
    assert sorted(accepted) == [0]  # 1 is 0's in-group near-dup


def test_embedding_gate_dedups_against_growing_index(spark, tmp_path):
    """The EMBEDDING gate: batch 1 builds the IVF index; batch 2's
    near-identical vector (cos >= threshold vs the corpus) is dropped
    and its novel vector appended; batch 3's near-dup of the APPENDED
    vector is also dropped (the append path works); a null vector
    passes through; replays are no-ops."""
    import pandas as pd

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_embedding_dedup_gate,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        return v

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["vec_id"] for r in df.collect()))

    idx = str(tmp_path / "ivf")
    gate = make_embedding_dedup_gate(
        spark, idx, str(tmp_path / "markers"), sink, threshold=0.98
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": [r[0] for r in rows],
                 "embedding": [r[1] for r in rows]}
            )
        )

    # batch 0: e0, e1 (orthogonal -> both kept), plus an in-batch
    # near-dup of e0 (cos ~0.995) with the larger id -> dropped
    gate(batch([(0, vec(0)), (1, vec(1)), (2, vec(0, 0.1))]), 0)
    # batch 1: near-dup of corpus e1 -> dropped; novel e2 -> kept;
    # null vector -> accepted, not indexed
    gate(batch([(10, vec(1, 0.1)), (11, vec(2)), (12, None)]), 1)
    # batch 2: near-dup of the APPENDED e2 -> dropped
    gate(batch([(20, vec(2, 0.1))]), 2)
    assert accepted == [[0, 1], [11, 12], []]
    # replay of batch 1 is a marker no-op
    gate(batch([(10, vec(1, 0.1)), (11, vec(2)), (12, None)]), 1)
    assert accepted == [[0, 1], [11, 12], []]
    # the index holds exactly the non-null survivors
    idx_ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(idx + "/index").collect()
    )
    assert idx_ids == [0, 1, 11]


def test_text_gate_exact_dedup_unbounded_horizon(spark, tmp_path):
    """The TEXT gate (exact digests, persisted corpus): in-batch
    duplicate texts keep the smallest id; a text seen in ANY earlier
    batch never re-emerges (unbounded horizon, unlike the TTL-window
    streaming dedup); append-then-crash replay emits empty (digests
    already in the corpus) instead of double-delivering."""
    import pandas as pd

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_text_dedup_gate,
    )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_tgate_" + uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    gate = make_text_dedup_gate(spark, prefix, markers, sink)

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [r[0] for r in rows],
                 "text": [r[1] for r in rows]}
            )
        )

    gate(batch([(3, "alpha"), (1, "alpha"), (2, "beta")]), 0)
    gate(batch([(10, "alpha"), (11, "gamma"), (12, "beta")]), 1)
    assert accepted == [[1, 2], [11]]
    corpus = spark.table(f"{prefix}_digests")
    assert corpus.distinct().count() == 3  # alpha, beta, gamma
    # marker replay: no re-emit
    gate(batch([(10, "alpha"), (11, "gamma"), (12, "beta")]), 1)
    assert accepted == [[1, 2], [11]]
    # append-then-crash simulation: delete batch 2's marker after a
    # run so the replay path executes with the digests already
    # appended — the fresh set is empty, nothing double-delivers
    import os

    gate(batch([(20, "delta")]), 2)
    os.remove(os.path.join(markers, f"batch-{2:020d}"))
    gate(batch([(20, "delta")]), 2)
    assert accepted == [[1, 2], [11], [20], []]


import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(
    perm=st.permutations(list(range(12))),
    cuts=st.sets(st.integers(min_value=1, max_value=11), max_size=3),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_gate_admits_one_representative_per_group_any_batching(
    sp, tmp_path_factory, perm, cuts
):
    """PROPERTY: for ANY arrival order and ANY split of the stream
    into micro-batches, the audio gate admits EXACTLY ONE member per
    near-dup group (fixture groups = doc_id//4 cliques), and it is
    the smallest id within the earliest batch that contains any
    member of that group."""
    import uuid as _uuid

    import pandas as pd

    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_ahash_media,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_ahash_dedup_gate,
    )

    docs = sp.range(12).withColumnRenamed("id", "doc_id")
    blobs = {
        r["media_id"]: bytes(r["media"])
        for r in attach_ahash_media(docs, "doc_id").collect()
    }
    bounds = sorted(cuts) + [12]
    batches, prev = [], 0
    for b in bounds:
        if b > prev:
            batches.append(perm[prev:b])
            prev = b

    accepted: list[int] = []
    tmp = tmp_path_factory.mktemp("gate")
    gate = make_ahash_dedup_gate(
        sp,
        "akt_pgate_" + _uuid.uuid4().hex[:12],
        str(tmp / "markers"),
        lambda d, bid: accepted.extend(
            r["media_id"] for r in d.collect()
        ),
    )
    for bid, ids in enumerate(batches):
        gate(
            sp.createDataFrame(
                pd.DataFrame(
                    {"media_id": list(ids),
                     "media": [blobs[i] for i in ids]}
                )
            ),
            bid,
        )

    # expected representative per group: min id within the EARLIEST
    # batch containing any member of that group
    want = {}
    for ids in batches:
        for g in {i // 4 for i in ids}:
            if g not in want:
                want[g] = min(i for i in ids if i // 4 == g)
    assert sorted(accepted) == sorted(want.values())


def test_embedding_gate_survives_double_replay(spark, tmp_path):
    """Append-then-crash REPLAYED TWICE (the round-11 advice finding):
    each replay of an un-markered epoch re-appends the survivor's row,
    so the index holds it N times. The probe must still see the best
    REAL corpus hit — an after-rank self filter at k=2 is exhausted by
    two self-rows and silently admits a genuine near-dup; the
    pre-rank exclude_self filter is immune to any replay count."""
    import os

    import pandas as pd

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_embedding_dedup_gate,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        return v

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["vec_id"] for r in df.collect()))

    idx = str(tmp_path / "ivf")
    markers = str(tmp_path / "markers")
    gate = make_embedding_dedup_gate(
        spark, idx, markers, sink, threshold=0.98
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": [r[0] for r in rows],
                 "embedding": [r[1] for r in rows]}
            )
        )

    b0 = batch([(0, vec(0))])
    gate(b0, 0)
    # crash window twice: marker lost after the append, epoch replayed
    for _ in range(2):
        os.remove(os.path.join(markers, f"batch-{0:020d}"))
        gate(b0, 0)
    # id 0's row is now in the index three times
    idx_rows = spark.read.parquet(idx + "/index")
    assert idx_rows.filter(F.col("vec_id") == 0).count() == 3
    # at-least-once for the crash window: re-emitted every replay
    assert accepted == [[0], [0], [0]]
    # a REAL near-dup of the triplicated corpus row must still be
    # caught (cos(vec(0), vec(0, 0.1)) ~ 0.995 >= 0.98)
    gate(batch([(10, vec(0, 0.1)), (11, vec(3))]), 1)
    assert accepted == [[0], [0], [0], [11]]


def test_text_gate_accepts_every_corrupt_row(spark, tmp_path):
    """R16 parity with the media gates: null text hashes to a null
    digest; EVERY such corrupt row must pass through the gate (not one
    survivor of an accidental all-nulls group) and none may enter the
    digest corpus."""
    import pandas as pd

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_text_dedup_gate,
    )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_tnull_" + uuid.uuid4().hex[:12]
    gate = make_text_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                 "text": [r[1] for r in rows]}
            )
        )

    # three corrupt rows + one real text in one batch: all four pass
    gate(batch([(1, None), (2, None), (3, "alpha"), (4, None)]), 0)
    assert accepted == [[1, 2, 3, 4]]
    # corpus holds only the real digest -> corrupt rows never dedup
    assert spark.table(f"{prefix}_digests").count() == 1
    # and they don't poison later batches either
    gate(batch([(10, None), (11, "alpha")]), 1)
    assert accepted == [[1, 2, 3, 4], [10]]


def test_text_gate_auto_compacts_on_cadence_across_restart(spark, tmp_path):
    """Auto-compaction cadence (round-12): every compact_every-th
    durable marker the gate compacts its own corpus table — including
    AFTER a driver restart, when the corpus is a re-attached EXTERNAL
    table (the path where the pre-r12 compactor crashed with
    LOCATION_ALREADY_EXISTS). Admissions must be identical to an
    uncompacted run and the file count must drop at each cadence
    point."""
    import os
    import shutil

    import pandas as pd

    from arc_kinesis_tagging_spark.sources.maintenance import (
        parquet_file_count,
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_text_dedup_gate,
    )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_tcad_" + uuid.uuid4().hex[:12]
    name = f"{prefix}_digests"
    markers = str(tmp_path / "markers")
    gate = make_text_dedup_gate(
        spark, prefix, markers, sink, compact_every=2
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                 "text": [r[1] for r in rows]}
            )
        )

    gate(batch([(1, "a"), (2, "b")]), 0)   # 1 marker: no compaction
    gate(batch([(3, "c"), (4, "a")]), 1)   # 2 markers: compacts
    loc = table_location(spark, name)
    files_after_compact = parquet_file_count(loc)
    # two appends would leave >= 2 file sets; compaction leaves one
    # file per non-empty bucket of 3 digests
    assert files_after_compact <= 3
    # -- driver restart: catalog entry dies, files survive --
    saved = str(tmp_path / "saved")
    shutil.copytree(loc, saved)
    spark.sql(f"DROP TABLE {name}")
    shutil.copytree(saved, loc)
    gate(batch([(5, "d"), (6, "b")]), 2)   # re-attaches; 3 markers
    gate(batch([(7, "e"), (8, "e")]), 3)   # 4 markers: compacts EXTERNAL
    assert parquet_file_count(loc) <= 5    # one per non-empty bucket
    # admissions identical to the no-compaction semantics throughout
    assert accepted == [[1, 2], [3], [5], [7]]
    # corpus still dedups after both compactions
    gate(batch([(9, "a"), (10, "f")]), 4)
    assert accepted[-1] == [10]


def test_embedding_gate_auto_compacts_ivf_index(spark, tmp_path):
    """The embedding gate's cadence compacts the cell-partitioned IVF
    index (one file set per touched cell per batch otherwise) without
    changing verdicts."""
    import os

    import pandas as pd

    from arc_kinesis_tagging_spark.sources.maintenance import (
        parquet_file_count,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_embedding_dedup_gate,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        return v

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["vec_id"] for r in df.collect()))

    idx = str(tmp_path / "ivf")
    gate = make_embedding_dedup_gate(
        spark, idx, str(tmp_path / "markers"), sink, threshold=0.98,
        nlist=2, compact_every=2,
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": [r[0] for r in rows],
                 "embedding": [r[1] for r in rows]}
            )
        )

    gate(batch([(0, vec(0)), (1, vec(1))]), 0)  # builds index
    gate(batch([(2, vec(2)), (3, vec(3))]), 1)  # appends; then compacts
    files = parquet_file_count(os.path.join(idx, "index"))
    # after compaction: one file per non-empty cell (nlist=2)
    assert files <= 2
    # the compacted index still drives verdicts
    gate(batch([(10, vec(0, 0.1)), (11, vec(4))]), 2)
    assert accepted == [[0, 1], [2, 3], [11]]


def test_media_gate_auto_compacts_band_corpus(spark, tmp_path):
    """The image/audio gate's cadence path (same _maybe_compact, but
    the band-table target with bucket cols ['chunk']): verdicts are
    unchanged across a compaction and the band table ends at one file
    per non-empty bucket. Uses an injected precomputed-hash hash_fn
    so the test exercises the GATE plumbing, not the decoder."""
    import pandas as pd

    from arc_kinesis_tagging_spark.sources.maintenance import (
        parquet_file_count,
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_phash_dedup_gate,
    )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["media_id"] for r in df.collect()))

    def precomputed(df, id_col, media_col):
        return df.select(F.col(id_col).alias("media_id"), "phash")

    prefix = "akt_mcad_" + uuid.uuid4().hex[:12]
    gate = make_phash_dedup_gate(
        spark,
        prefix,
        str(tmp_path / "markers"),
        sink,
        hash_fn=precomputed,
        compact_every=2,
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"media_id": pd.array([r[0] for r in rows], dtype="int64"),
                 "phash": pd.array([r[1] for r in rows], dtype="int64")}
            )
        )

    h0, h1, h2 = 0, (1 << 63) - 1, 0x7FFF  # pairwise hamming >= 15
    gate(batch([(0, h0), (1, h1)]), 0)
    gate(batch([(2, h2)]), 1)  # 2 markers -> compacts
    name = f"{prefix}_bands"
    loc = table_location(spark, name)
    assert parquet_file_count(loc) <= 16  # one per non-empty bucket
    # post-compaction probe still drops a hamming-2 near-dup of id 0
    # and admits a far hash
    gate(batch([(10, h0 | 0b11), (11, 0x3FF00000000)]), 2)
    assert accepted == [[0, 1], [2], [11]]


def test_auto_cadence_scales_with_corpus_over_batch(spark, tmp_path, monkeypatch):
    """compact_every='auto' (round-12 verdict task 5): the cadence
    re-derives as clamp(2*sqrt(corpus_rows/batch_rows), MIN, MAX) at
    each compaction (the sqrt cost-balance rule the round-13 ladder
    measured; the linear rule was rejected 4x — SCALE.md), lives
    durably in <markers_dir>/__cadence (survives a restart that
    empties the in-process cache), and a corrupt state file degrades
    to a fresh start instead of an exception."""
    from arc_kinesis_tagging_spark.streaming import dedup_gate as dg

    monkeypatch.setattr(dg, "AUTO_CADENCE_START", 2)
    monkeypatch.setattr(dg, "AUTO_CADENCE_MIN", 1)
    markers = str(tmp_path / "m")
    dg._markers_init(spark, markers)
    dg._CADENCE_CACHE.clear()
    calls = []
    # corpus 8 rows / batch 2 rows -> re-derived cadence 2*sqrt(4) = 4
    kw = dict(spark=spark, markers_dir=markers,
              batch_rows_fn=lambda: 2, corpus_rows_fn=lambda: 8)
    dg._maybe_compact(0, "auto", lambda: calls.append(0), **kw)
    assert calls == []  # first sight initializes state, no compaction
    assert dg._cadence_read(spark, markers) == {"last": 0, "every": 2}
    dg._maybe_compact(1, "auto", lambda: calls.append(1), **kw)
    assert calls == []  # 1 - 0 < START
    dg._maybe_compact(2, "auto", lambda: calls.append(2), **kw)
    assert calls == [2]  # compacts; next cadence = 2*sqrt(8//2) = 4
    assert dg._cadence_read(spark, markers) == {"last": 2, "every": 4}
    dg._maybe_compact(5, "auto", lambda: calls.append(5), **kw)
    assert calls == [2]  # 5 - 2 < 4
    # -- restart: in-process cache gone, durable state re-read --
    dg._CADENCE_CACHE.clear()
    dg._maybe_compact(6, "auto", lambda: calls.append(6), **kw)
    assert calls == [2, 6]  # 6 - 2 >= 4
    # corpus >> batch clamps at AUTO_CADENCE_MAX (the fragmentation
    # window stays bounded no matter how big the corpus gets:
    # 2*sqrt(1e7/2) ~ 4472 -> 1024)
    dg._CADENCE_CACHE.clear()
    dg._cadence_write(spark, markers, {"last": 6, "every": 1})
    dg._maybe_compact(
        7, "auto", lambda: calls.append(7),
        **dict(kw, corpus_rows_fn=lambda: 10_000_000),
    )
    assert calls == [2, 6, 7]
    assert dg._cadence_read(spark, markers)["every"] == dg.AUTO_CADENCE_MAX
    # corrupt state file: fresh start, not an exception
    fs_uri = dg._cadence_uri(markers)
    from arc_kinesis_tagging_spark.sources.maintenance import _hpath
    fs, p = _hpath(spark, fs_uri)
    out = fs.create(p, True); out.write(bytearray(b"{not json")); out.close()
    dg._CADENCE_CACHE.clear()
    dg._maybe_compact(8, "auto", lambda: calls.append(8), **kw)
    assert calls == [2, 6, 7]  # re-initialized, no compaction
    assert dg._cadence_read(spark, markers) == {"last": 8, "every": 2}


def test_text_gate_auto_mode_admits_identically_and_compacts(
    spark, tmp_path, monkeypatch
):
    """A real gate driven with compact_every='auto': admissions are
    identical to fixed-cadence semantics, the corpus compacts at the
    auto cadence points, and the re-derived cadence lands at
    clamp(corpus/batch) after the first compaction."""
    import uuid as _uuid

    import pandas as pd

    from arc_kinesis_tagging_spark.sources.maintenance import (
        parquet_file_count,
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming import dedup_gate as dg

    monkeypatch.setattr(dg, "AUTO_CADENCE_START", 2)
    monkeypatch.setattr(dg, "AUTO_CADENCE_MIN", 1)
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_acad_" + _uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    gate = dg.make_text_dedup_gate(
        spark, prefix, markers, sink, compact_every="auto"
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                 "text": [r[1] for r in rows]}
            )
        )

    gate(batch([(1, "a"), (2, "b")]), 0)   # init: state written
    gate(batch([(3, "c"), (4, "a")]), 1)   # 1-0 < 2: no compaction
    gate(batch([(5, "d"), (6, "b")]), 2)   # 2-0 >= 2: compacts
    st = dg._cadence_read(spark, markers)
    # corpus digests at compaction: {a,b,c,d} = 4 rows (pre-batch-2
    # appends land before the compact), batch survivors 1 (only d is
    # fresh) -> 2 * sqrt(4 // 1) = 4
    assert st is not None and st["last"] == 2
    assert st["every"] == 4
    loc = table_location(spark, f"{prefix}_digests")
    assert parquet_file_count(loc) <= 4  # one per non-empty bucket
    # admissions exactly the no-compaction semantics
    assert accepted == [[1, 2], [3], [5]]
    gate(batch([(7, "a"), (8, "e")]), 3)
    assert accepted[-1] == [8]


def test_decontamination_gate_semantics_and_restart(spark, tmp_path):
    """Streaming train-side decontamination
    (make_decontamination_gate): batch docs sharing >= min_shared
    distinct 3-gram shingles with the frozen benchmark are dropped,
    everything else passes (incl. null text — R16), replayed epochs
    are marker-skipped, and after a 'restart' (catalog wiped, fresh
    gate built with a DIFFERENT benchmark df) the PERSISTED benchmark
    table remains the frozen truth."""
    import uuid as _uuid

    import pandas as pd

    from arc_kinesis_tagging_spark.sources.maintenance import (
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_decontamination_gate,
    )

    BENCH = "the quick brown fox jumps over the lazy dog"
    CLEAN = "pack my box with five dozen liquor jugs tonight"
    # shares exactly two 3-grams with BENCH ("quick brown fox",
    # "brown fox jumps") -> below min_shared=3, kept
    NEAR = "a quick brown fox jumps away from everything else here"

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_decon_" + _uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    bench = spark.createDataFrame(
        [(100, BENCH)], "doc_id long, text string"
    )
    gate = make_decontamination_gate(
        spark, bench, prefix, markers, sink, min_shared=3
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                 "text": [r[1] for r in rows]}
            )
        )

    # 1 contaminated (verbatim benchmark), 2 clean, 3 below the
    # overlap bar, 4 corrupt (null text: empty shingle set -> passes)
    gate(batch([(1, BENCH), (2, CLEAN), (3, NEAR), (4, None)]), 0)
    assert accepted == [[2, 3, 4]]
    # replayed epoch: marker no-op, nothing re-emitted
    gate(batch([(1, BENCH), (2, CLEAN), (3, NEAR), (4, None)]), 0)
    assert accepted == [[2, 3, 4]]

    # -- restart: catalog entry dropped, files survive; the fresh
    # gate gets an EMPTY benchmark df, which must be IGNORED because
    # the persisted table re-attaches as the frozen truth --
    import shutil

    name = f"{prefix}_benchsh"
    loc = table_location(spark, name)
    saved = str(tmp_path / "saved")
    shutil.copytree(loc, saved)
    spark.sql(f"DROP TABLE {name}")
    shutil.copytree(saved, loc)
    gate2 = make_decontamination_gate(
        spark,
        spark.createDataFrame([], "doc_id long, text string"),
        prefix,
        markers,
        sink,
        min_shared=3,
    )
    gate2(batch([(5, BENCH), (6, CLEAN + " again")]), 1)
    assert accepted == [[2, 3, 4], [6]]


def test_decontamination_gate_duplicate_benchmark_rows(spark, tmp_path):
    """The initial benchmark-table build must dedupe bench keys the
    same way append_benchmark_shingles does (round-14 advice): the
    overlap count assumes UNIQUE per-(doc, bench) shingle rows, so a
    benchmark fed in with duplicated rows would double every match
    count and spuriously clear min_shared. A doc sharing exactly 2
    shingles under min_shared=3 must SURVIVE even when the benchmark
    df carries its row three times (and a repeated doc_id with
    different text — first text per key wins, as on append)."""
    import uuid as _uuid

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_decontamination_gate,
    )

    BENCH = "the quick brown fox jumps over the lazy dog"
    # shares exactly two 3-grams with BENCH -> below min_shared=3
    NEAR = "a quick brown fox jumps away from everything else here"

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_decondup_" + _uuid.uuid4().hex[:12]
    bench = spark.createDataFrame(
        [(100, BENCH), (100, BENCH), (100, BENCH),
         (100, "an unrelated second text for the same key")],
        "doc_id long, text string",
    )
    gate = make_decontamination_gate(
        spark, bench, prefix, str(tmp_path / "markers"), sink,
        min_shared=3,
    )
    batch = spark.createDataFrame(
        [(1, BENCH), (2, NEAR)], "doc_id long, text string"
    )
    gate(batch, 0)
    # 1 is verbatim contamination (>=3 shared even un-doubled);
    # 2 shares 2 -- kept, and would have been dropped (2*3=6 >= 3)
    # had the duplicated rows inflated the count
    assert accepted == [[2]]
    spark.sql(f"DROP TABLE {prefix}_benchsh")


def test_auto_cadence_crash_interleavings(spark, tmp_path, monkeypatch):
    """PROPERTY (seeded fuzz, the kinesis-interleaving discipline):
    200 batches through the auto-cadence state machine under random
    restarts (cache cleared), injected crashes BETWEEN compact_fn and
    the state write, and corrupted state files. Invariants: the
    derived cadence always lands inside [MIN, MAX]; state['last']
    never exceeds the current batch and never goes backwards; between
    two compactions with an intact recorded state and no corruption,
    the batch gap honors the recorded cadence; an immediate
    re-compaction happens ONLY right after a crashed one (each crash
    buys at most one); corruption re-initializes instead of
    raising."""
    import random

    from arc_kinesis_tagging_spark.sources.maintenance import _hpath
    from arc_kinesis_tagging_spark.streaming import dedup_gate as dg

    monkeypatch.setattr(dg, "AUTO_CADENCE_START", 4)
    monkeypatch.setattr(dg, "AUTO_CADENCE_MIN", 2)
    monkeypatch.setattr(dg, "AUTO_CADENCE_MAX", 8)
    rng = random.Random(5)
    markers = str(tmp_path / "m")
    dg._markers_init(spark, markers)
    dg._CADENCE_CACHE.clear()

    compactions: list[int] = []
    crashed_bids: list[int] = []
    corpus_rows = 0
    # (bid, every_recorded, state_write_ok) of the last compaction
    last_ok: tuple | None = None
    dirty = False  # a crash or corruption happened since last_ok

    for bid in range(200):
        if rng.random() < 0.10:
            dg._CADENCE_CACHE.clear()  # driver restart
        if rng.random() < 0.03:
            fs, p = _hpath(spark, dg._cadence_uri(markers))
            out = fs.create(p, True)
            out.write(bytearray(b"junk"))
            out.close()
            dg._CADENCE_CACHE.clear()
            dirty = True
        batch = rng.randint(1, 50)
        corpus_rows += batch
        crash = rng.random() < 0.15

        def fn(b=bid, c=crash):
            compactions.append(b)
            if c:
                raise RuntimeError("injected crash before state write")

        b_rows, c_rows = batch, corpus_rows
        try:
            dg._maybe_compact(
                bid, "auto", fn,
                spark=spark, markers_dir=markers,
                batch_rows_fn=lambda: b_rows,
                corpus_rows_fn=lambda: c_rows,
            )
        except RuntimeError:
            dirty = True
            crashed_bids.append(bid)
        if compactions and compactions[-1] == bid:
            st = dg._cadence_read(spark, markers)
            if last_ok is not None and not dirty:
                # clean gap honors the recorded cadence
                assert bid - last_ok[0] >= last_ok[1], (
                    bid, last_ok, compactions
                )
            if not crash:
                assert st is not None and st["last"] == bid
                last_ok = (bid, int(st["every"]))
                dirty = False
        st = dg._cadence_read(spark, markers)
        if st is not None:
            assert 2 <= int(st["every"]) <= 8, st
            assert int(st["last"]) <= bid, (st, bid)

    # the machine actually exercised every branch
    assert len(compactions) >= 10
    # an immediate (next-batch) re-compaction is legal ONLY when the
    # previous compaction crashed before its state write — each crash
    # buys at most one retry, so consecutive-bid chains must be
    # crash-backed all the way to their first element
    crashed = set(crashed_bids)
    for x, y in zip(compactions, compactions[1:]):
        if y == x + 1:
            assert x in crashed, (x, y, sorted(crashed))


def test_decontamination_benchmark_append_is_idempotent(spark, tmp_path):
    """append_benchmark_shingles: newly released eval docs start
    knocking out contaminated batch docs, and a REPLAYED append of the
    same docs is a no-op — duplicate bench shingle rows would inflate
    the per-(doc, bench) overlap count past min_shared (a doc sharing
    only TWO shingles with a double-appended bench doc would count 4),
    so idempotence here is a correctness property, not a tidiness
    one."""
    import uuid as _uuid

    import pandas as pd

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        append_benchmark_shingles,
        make_decontamination_gate,
    )

    BENCH1 = "the quick brown fox jumps over the lazy dog"
    BENCH2 = "pack my box with five dozen liquor jugs tonight ok"
    # shares exactly TWO 3-grams with BENCH2 ("pack my box",
    # "my box with") — below min_shared=3 unless counts inflate
    NEAR2 = "pack my box with everything else entirely different now"

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_dcap_" + _uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    gate = make_decontamination_gate(
        spark,
        spark.createDataFrame([(100, BENCH1)], "doc_id long, text string"),
        prefix,
        markers,
        sink,
        min_shared=3,
    )

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                 "text": [r[1] for r in rows]}
            )
        )

    # BENCH2 not yet in the table: its verbatim copy passes
    gate(batch([(1, BENCH2)]), 0)
    assert accepted == [[1]]
    # release BENCH2; append twice (the second is a replay)
    newb = spark.createDataFrame(
        [(200, BENCH2)], "doc_id long, text string"
    )
    assert append_benchmark_shingles(spark, newb, prefix) == 1
    assert append_benchmark_shingles(spark, newb, prefix) == 0  # no-op
    # verbatim BENCH2 copy now dropped; the two-shingle NEAR2 doc must
    # be KEPT — it would be wrongly dropped if the replayed append had
    # inflated counts (2 shared shingles x 2 copies = 4 >= 3)
    gate(batch([(2, BENCH2), (3, NEAR2)]), 1)
    assert accepted == [[1], [3]]


def test_classifier_gate_semantics_and_replay(spark, tmp_path):
    """Streaming supervised-classifier admission gate
    (make_classifier_gate): batch docs predicted OUTSIDE admit_labels
    are dropped, admitted predictions pass, docs with no scorable
    features (null text) PASS THROUGH (R16 — a gate that cannot read
    a row must not destroy it), replayed epochs are marker-skipped,
    and unknown admit labels fail fast."""
    import pytest as _pytest

    from arc_kinesis_tagging_spark.operators.quality_clf import (
        train_quality_classifier,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_classifier_gate,
    )

    train = spark.createDataFrame(
        [(i, "hq", t) for i, t in enumerate(
            ["alpha beta gamma", "beta gamma alpha delta",
             "delta alpha beta", "gamma delta"])]
        + [(10 + i, "lq", t) for i, t in enumerate(
            ["zig zag zap", "zag zor zig", "zor zap zag zig",
             "zip zag zor"])],
        "doc_id long, label string, text string",
    )
    model = train_quality_classifier(
        train, "text", "label", n_buckets=32, epochs=5, lr=2.0
    )

    with _pytest.raises(ValueError):
        make_classifier_gate(
            spark, model, str(tmp_path / "m0"), lambda d, b: None,
            admit_labels=["nonexistent"],
        )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    gate = make_classifier_gate(
        spark, model, str(tmp_path / "markers"), sink,
        admit_labels=["hq"],
    )
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),   # hq-vocab -> admitted
         (2, "zig zag zor zap"),          # lq-vocab -> dropped
         (3, None),                       # no features -> passes (R16)
         (4, "beta delta alpha")],        # hq-vocab -> admitted
        "doc_id long, text string",
    )
    gate(batch, 0)
    assert accepted == [[1, 3, 4]]
    # replayed epoch: marker no-op, nothing re-emitted
    gate(batch, 0)
    assert accepted == [[1, 3, 4]]
    gate(spark.createDataFrame(
        [(5, "zor zip zag")], "doc_id long, text string"), 1)
    assert accepted == [[1, 3, 4], []]


def test_substring_clip_gate_semantics_and_restart(spark, tmp_path):
    """Streaming ExactSubstr clip (make_substring_clip_gate): the
    first arrival of a span emits verbatim; later batches repeating
    it get the merged span clipped out (keep-first-arrival); brand-new
    content duplicated WITHIN a batch is clipped from all occurrences
    (the batch operator's remove-all); null / short texts pass
    verbatim (R16); replayed epochs are marker-skipped; the emitted
    schema equals the input schema; and after a restart (catalog
    dropped, files restored) the persisted window corpus still clips."""
    import shutil
    import uuid as _uuid

    from arc_kinesis_tagging_spark.sources.maintenance import (
        table_location,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_substring_clip_gate,
    )

    S = "alpha beta gamma delta epsilon zeta"   # 6 tokens, w=4
    T = "tok1 tok2 tok3 tok4"                   # exactly one window

    emitted = []

    def sink(df, batch_id):
        emitted.append(
            {r["doc_id"]: r["text"] for r in df.collect()}
        )
        assert df.columns == ["doc_id", "text"]

    prefix = "akt_subclip_" + _uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    gate = make_substring_clip_gate(
        spark, prefix, markers, sink, window_tokens=4
    )

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # batch 0: S's first arrival + a unique doc + corrupt + short
    gate(batch([(1, S + " one two"), (2, "all brand new words here"),
                (3, None), (4, "too short")]), 0)
    assert emitted == [{1: S + " one two",
                        2: "all brand new words here",
                        3: None, 4: "too short"}]

    # batch 1: doc 5 repeats S inside other text -> S clipped; docs
    # 6/7 share brand-new T within the batch -> clipped from BOTH
    gate(batch([(5, "intro " + S + " outro"),
                (6, "pre " + T), (7, T + " post")]), 1)
    assert emitted[-1] == {5: "intro outro", 6: "pre", 7: "post"}

    # replayed epoch: marker no-op
    gate(batch([(5, "intro " + S + " outro"),
                (6, "pre " + T), (7, T + " post")]), 1)
    assert len(emitted) == 2

    # restart: catalog entry dropped, warehouse files survive
    name = f"{prefix}_windows"
    loc = table_location(spark, name)
    saved = str(tmp_path / "saved_windows")
    shutil.copytree(loc, saved)
    spark.sql(f"DROP TABLE {name}")
    shutil.copytree(saved, loc)
    gate2 = make_substring_clip_gate(
        spark, prefix, markers, sink, window_tokens=4
    )
    gate2(batch([(8, S + " closing")]), 2)
    assert emitted[-1] == {8: "closing"}


def test_text_gate_sees_cross_epoch_appends(spark, tmp_path):
    """Regression pin for the foreachBatch stale-listing bug: under a
    real stream, corpus appends execute on the micro-batch's CLONED
    session, and saveAsTable invalidates only the writer's
    table-relation cache — without the explicit refreshTable on the
    gate's captured session (_append_bucketed_bands), every probe
    after epoch 1 reads the file listing cached at first probe and a
    doc appended in epoch 2 is NOT deduped against in epoch 3. Three
    epochs: fresh -> fresh (appended to the EXISTING table) -> exact
    dup of the epoch-2 doc, which must be dropped."""
    import uuid as _uuid

    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_text_dedup_gate,
    )

    emitted = []

    def sink(df, batch_id):
        emitted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_xepoch_" + _uuid.uuid4().hex[:12]
    gate = make_text_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def epoch(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.mode("append").json(src)
        q = (
            spark.readStream.schema("doc_id long, text string")
            .json(src)
            .writeStream.foreachBatch(gate)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    epoch([(1, "first document text")])
    epoch([(2, "second document text")])     # appends to EXISTING table
    epoch([(3, "second document text")])     # dup of the epoch-2 doc
    assert emitted == [[1], [2], []]
