"""Streaming cross-batch MEDIA dedup gates (image / audio / video) —
the production composition of the connector and the incremental
perceptual-dedup operators: each micro-batch's media are
fingerprinted (map-only Arrow), probed against the PERSISTED corpus
band table (operators/dedup.py — batch broadcast, zero corpus
Exchange), near-dups of the corpus are dropped, in-batch near-dup
groups keep their smallest id, and the survivors' banded chunks are
appended to the corpus so the NEXT batch dedups against them. Image
(pHash, 63 bits) and audio (Haitsma-Kalker, 60 bits) share one gate
parametrized by the hash; video gets its own (per-frame bands +
strict temporal verify). This is the daily/continuous ingest shape
for a 100 TB media corpus: the corpus is only ever scanned (never
shuffled), and it grows by exactly the accepted rows.

Delivery semantics: the gate is made replay-safe with a per-batch
marker file — a replayed epoch whose marker exists is skipped
entirely (no double-append, no double-emit through the sink). A crash
BETWEEN the corpus append and the marker write means the replay
re-runs the batch against a corpus that already contains its own
survivors; the probe filters ``id_batch == id_corpus`` (globally
unique media ids make that pairing a replay artifact by definition),
so the survivors re-emerge, re-emit through the sink (at-least-once
for exactly this crash window) and re-append — duplicate corpus band
rows only produce duplicate candidate pairs, which the probe's
``dropDuplicates`` collapses, and routine compaction removes them.
Operations: appends fragment the corpora by one file set per batch
(bucket-aligned: at most one file per non-empty bucket — see
_append_bucketed_bands). Every gate takes ``compact_every`` (default
64 batches) and runs the layout-preserving compactor
(sources/maintenance.compact_bucketed_table for band/digest tables,
compact_ivf_index for the embedding gate's index) itself, AFTER the
marker write, every ``compact_every``-th checkpoint-durable batch_id
— so the 100 TB continuous-ingest shape never depends on an operator
remembering a maintenance job, and a crash mid-compaction costs no
admissions: the compactors write a complete temp copy first, swap it
in with two renames, and an interrupted swap is HEALED (the original
restored from <loc>__compact_trash) at the next compaction or corpus
re-attach via maintenance.recover_interrupted_compaction — never
read as a fresh corpus. The default is measured (SCALE.md
round-12 fragmentation ladder, 512k-row digest corpus, 16 buckets):
probe latency is LINEAR in file count at ~0.33 ms/file — 4096 files
is 4.8x the 16-file compacted floor — so cadence 64 (peak 1024
files) caps the probe at ~1.9x the floor, averaging ~1.5x, for one
corpus rewrite per 64 batches. Tune by the trade-off's two sides:
the rewrite is O(corpus size) amortized over the cadence, the
fragmentation penalty is O(batches since last compaction) — bigger
corpora want a LONGER cadence, chattier streams a shorter one. Set 0
to disable and schedule externally, or ``compact_every="auto"`` to
let the gate scale the cadence itself: at each compaction the next
cadence is re-derived as clamp(2*sqrt(corpus_rows/batch_rows), 16,
1024) — the sqrt balances the O(corpus)/cadence amortized rewrite
against the linear-in-cadence probe-fragmentation ramp, and was
MEASURED against the naive linear rule on the round-13 corpus>>batch
ladder regime, which rejected linear by 4x (SCALE.md; rationale at
the AUTO_CADENCE constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Markers through the Hadoop FileSystem API: the replay markers must
# live on the SAME durable store as the checkpoint (DEPLOY.md), which
# at 100 TB is hdfs:/s3a:, not the driver's local disk — plain
# open()/os.replace() on an hdfs:// URI is a FileNotFoundError. A bare
# local path resolves to the local FS, so tests and the local harness
# behave exactly as before. (Same rationale and helper as
# sources/maintenance.py's compactor file ops.) On rename-as-copy
# stores (S3) the marker write is not atomic; the gates' replay
# semantics already tolerate a lost marker (at-least-once for that
# window, never loss), so the degradation is bounded by design.
# ---------------------------------------------------------------------------


def _markers_init(spark, markers_dir: str) -> None:
    from arc_kinesis_tagging_spark.sources.maintenance import _hpath

    fs, p = _hpath(spark, markers_dir)
    fs.mkdirs(p)


def _marker_uri(markers_dir: str, batch_id: int) -> str:
    return f"{markers_dir.rstrip('/')}/batch-{int(batch_id):020d}"


def _marker_exists(spark, marker: str) -> bool:
    from arc_kinesis_tagging_spark.sources.maintenance import _fs_exists

    return _fs_exists(spark, marker)


def _write_marker(spark, marker: str) -> None:
    """Write the marker via create-temp + rename (atomic on HDFS-like
    stores; the local FS keeps the old os.replace semantics). A rename
    that fails because the destination already exists means a replay
    raced us to the same durable fact — success either way."""
    from arc_kinesis_tagging_spark.sources.maintenance import _hpath

    fs, tmp = _hpath(spark, marker + ".tmp")
    fs.create(tmp, True).close()
    _, dst = _hpath(spark, marker)
    if not fs.rename(tmp, dst) and not fs.exists(dst):
        raise IOError(f"marker write failed: {marker}")


# Auto-cadence rule (compact_every="auto"): cadence ~=
# 2 * sqrt(corpus_rows / batch_rows), clamped. SQRT, not linear: per
# window of W batches a cadence c pays (W/c) corpus rewrites plus a
# probe-overhead ramp of W * slope * c / 2 (probe latency is linear
# in file count, files grow ~constant per batch), so the cost
# minimum sits at c* = sqrt(2 * rewrite_s / slope). Rewrite time is
# proportional to corpus rows and the slope is corpus-independent,
# hence c* grows as sqrt(corpus/batch). The round-13 corpus>>batch
# ladder (SCALE.md) measured the linear rule (c = ratio = 256) at
# 391 s/window vs fixed-64's 99 s — REJECTED — while the sqrt rule
# lands at the measured optimum (c* ~ 35 for a 512k-row corpus and
# 2k-row batches; the factor 2 calibrates the rule to that point).
# The clamp bounds both failure modes: MIN keeps chatty streams from
# rewriting a big corpus every few batches, MAX caps the
# fragmentation window (peak files ~= cadence x buckets) outright.
AUTO_CADENCE_MIN = 16
AUTO_CADENCE_MAX = 1024
AUTO_CADENCE_START = 64

# In-process cadence state cache, keyed by markers_dir (one gate per
# markers_dir by construction). A restart empties it; the durable
# copy in <markers_dir>/__cadence is re-read on first miss.
_CADENCE_CACHE: dict[str, dict] = {}


def _cadence_uri(markers_dir: str) -> str:
    return f"{markers_dir.rstrip('/')}/__cadence"


def _cadence_read(spark, markers_dir: str) -> dict | None:
    import json

    from arc_kinesis_tagging_spark.sources.maintenance import _hpath

    fs, p = _hpath(spark, _cadence_uri(markers_dir))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    try:
        st = json.loads(data.decode("utf-8"))
        return st if isinstance(st, dict) and "last" in st else None
    except ValueError:
        return None  # corrupt state file: fall back to a fresh start


def _cadence_write(spark, markers_dir: str, state: dict) -> None:
    """Durable cadence state via temp + delete + rename. The
    delete+rename pair is not atomic; a crash in between just loses
    the state file, and the next batch re-initializes at
    AUTO_CADENCE_START — a bounded, self-healing degradation (one
    early compaction), never corruption."""
    import json

    from arc_kinesis_tagging_spark.sources.maintenance import _hpath

    uri = _cadence_uri(markers_dir)
    fs, tmp = _hpath(spark, uri + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(state).encode("utf-8")))
    finally:
        out.close()
    _, dst = _hpath(spark, uri)
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst) and not fs.exists(dst):
        raise IOError(f"cadence state write failed: {uri}")


def _maybe_compact(
    batch_id: int,
    every,
    compact_fn,
    *,
    spark=None,
    markers_dir: str | None = None,
    batch_rows_fn=None,
    corpus_rows_fn=None,
) -> None:
    """Run the layout-preserving compactor once per ``every`` epochs
    (0 = never), keyed on the structured-streaming batch_id — which
    is monotonic and checkpoint-durable, so the cadence survives
    driver restarts in O(1) (an earlier marker-COUNTING version paid
    an os.listdir over every marker ever written, O(total batches),
    on each micro-batch of exactly the long-lived stream this is
    for). Replayed epochs return on their marker before reaching
    this, so an epoch triggers at most one compaction; a crash
    between the marker write and the compaction just defers to the
    next cadence point.

    ``every="auto"`` (round-12 verdict task 5) self-scales the
    cadence instead of a fixed count: SCALE.md's own trade-off note
    says the rewrite is O(corpus) amortized over the cadence while
    the fragmentation penalty is O(batches since last compaction), so
    bigger corpora want a LONGER cadence. At each compaction the next
    cadence is re-derived as clamp(2 * sqrt(corpus_rows /
    batch_rows), AUTO_CADENCE_MIN, AUTO_CADENCE_MAX) — the sqrt
    cost-balance rule measured on the round-13 corpus>>batch ladder
    (see the AUTO_CADENCE constants; the verdict-prescribed LINEAR
    rule was ladder-tested and rejected 4x). The sizes are observed
    AT COMPACTION TIME only (one corpus-rows count per compaction,
    batch-rows from the already-pinned survivor table), never per
    batch. State ({last, every}) lives in <markers_dir>/__cadence
    next to the replay markers (same durable store as the
    checkpoint) plus an in-process cache; a crash between compact_fn
    and the state write re-compacts once at the next batch
    (idempotent, layout-preserving), a lost/corrupt state file
    re-initializes at AUTO_CADENCE_START."""
    if not every:
        return
    if every != "auto":
        if (int(batch_id) + 1) % int(every) == 0:
            compact_fn()
        return
    bid = int(batch_id)
    st = _CADENCE_CACHE.get(markers_dir) or _cadence_read(
        spark, markers_dir
    )
    if st is None:
        st = {"last": bid, "every": AUTO_CADENCE_START}
        _CADENCE_CACHE[markers_dir] = st
        _cadence_write(spark, markers_dir, st)
        return
    _CADENCE_CACHE[markers_dir] = st
    if bid - int(st["last"]) < int(st["every"]):
        return
    compact_fn()
    import math

    batch_rows = max(int(batch_rows_fn() or 0), 1)
    corpus_rows = int(corpus_rows_fn() or 0)
    nxt = max(
        AUTO_CADENCE_MIN,
        min(
            AUTO_CADENCE_MAX,
            2 * math.isqrt(max(corpus_rows // batch_rows, 0)),
        ),
    )
    st = {"last": bid, "every": nxt}
    _CADENCE_CACHE[markers_dir] = st
    _cadence_write(spark, markers_dir, st)


def _append_bucketed_bands(
    spark, df: DataFrame, name: str, bucket_cols: list[str],
    n_buckets: int
) -> None:
    """``mode("append")`` into the bucketed corpus band table,
    creating it on first use — shared by every corpus-growth path.

    The pre-write ``repartition(n_buckets, bucket_cols)`` aligns rows
    to their bucket (repartition's hash IS the bucket hash), so each
    append adds AT MOST one file per non-empty bucket. Without it a
    bucketed write emits one file per (task, bucket) pair — measured
    on the round-12 fragmentation ladder at ~500 files per micro-batch
    on local[32] (~32,000 files by batch 64), with probe latency
    LINEAR in file count (~0.35 ms/file: 12.3 s at 32k files vs 1.7 s
    at 4k). The shuffle is batch-sized (survivors only), negligible
    next to the decode+hash the batch already paid.

    ``spark`` must be the LONG-LIVED session the gates capture and
    probe with, and the append ends with ``refreshTable`` on it:
    under ``foreachBatch`` the write executes on the micro-batch's
    CLONED session (``df`` descends from its batch frame), and
    ``saveAsTable`` invalidates only the WRITING session's
    table-relation cache — the capturing session keeps the stale
    file listing it cached at first probe, leaving every later probe
    blind to rows appended after epoch 1 (near-dups of epoch-2+
    content sail through). Found by the substring-clip gate's
    three-epoch walkthrough; pinned for the exact gate by
    test_text_gate_sees_cross_epoch_appends."""
    cols = [F.col(c) for c in bucket_cols]
    (
        df.repartition(n_buckets, *cols)
        .write.mode("append")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(name)
    )
    spark.catalog.refreshTable(name)


def _ensure_registered(
    spark, name: str, ddl: str, bucket_cols: list[str], n_buckets: int
) -> bool:
    """Re-attach an on-disk corpus band table to a FRESH session's
    catalog. The default catalog is session-scoped (in-memory, see
    operators/skew.py:write_bucketed), so after a driver restart
    ``tableExists`` is false even though the warehouse directory —
    and the markers — survived; without this, the first post-restart
    batch would silently skip the corpus probe (admitting near-dups
    of the entire corpus) and the subsequent append would collide
    with the orphaned location. Registers an EXTERNAL bucketed table
    over the existing files; returns True when a corpus is available
    (already registered or re-attached). Before deciding the corpus
    is 'genuinely fresh', heal an interrupted compaction swap — a
    crash between the compactor's two renames leaves the corpus at
    <loc>__compact_trash, and treating that as fresh would silently
    forget the entire dedup history."""
    if spark.catalog.tableExists(name):
        return True
    wh = spark.conf.get("spark.sql.warehouse.dir")
    # Scheme-preserving join (the warehouse is a URI on hdfs:/s3a:
    # deployments; the local harness passes file:/... or a bare path
    # through unchanged — both resolve to the same physical location)
    loc = wh.rstrip("/") + "/" + name.lower()
    from arc_kinesis_tagging_spark.sources.maintenance import (
        _fs_exists,
        recover_interrupted_compaction,
    )

    recover_interrupted_compaction(spark, loc)
    if not _fs_exists(spark, loc):
        return False  # genuinely fresh corpus: first batch creates it
    cols = ", ".join(bucket_cols)
    spark.sql(
        f"CREATE TABLE {name} ({ddl}) USING parquet "
        f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
    )
    return True


def append_phash_corpus(
    spark,
    hashes: DataFrame,
    table_prefix: str,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 4,
    hash_bits: int = 63,
    n_buckets: int = 16,
) -> None:
    """Append a batch's banded pHash chunks to the bucketed corpus
    band table — the growth half of write_phash_corpus
    (operators/dedup.py), same table layout, same bucketing."""
    from arc_kinesis_tagging_spark.operators.dedup import _phash_chunks

    ph = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("key"), F.col(hash_col).alias("ph")
    )
    _append_bucketed_bands(
        spark,
        _phash_chunks(ph, max_hamming, hash_bits),
        f"{table_prefix}_bands",
        ["chunk"],
        n_buckets,
    )


def ensure_corpus_registered(
    spark,
    table_prefix: str,
    hash_bits: int = 63,
    n_buckets: int = 16,
) -> bool:
    """Image/audio corpus re-attach (see _ensure_registered)."""
    return _ensure_registered(
        spark,
        f"{table_prefix}_bands",
        "key BIGINT, ph BIGINT, band INT, chunk BIGINT",
        ["chunk"],
        n_buckets,
    )


def make_phash_dedup_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "media_id",
    media_col: str = "media",
    max_hamming: int = 4,
    hash_fn=None,
    hash_col: str = "phash",
    hash_bits: int = 63,
    compact_every: int | str = 64,
):
    """Build the ``foreachBatch`` function: hash -> probe corpus ->
    drop corpus near-dups -> keep-smallest-id within the batch ->
    append survivors' bands to the corpus -> hand survivors to
    ``accepted_sink(df, batch_id)`` -> every ``compact_every``-th
    durable marker, compact the corpus band table in place
    (layout-preserving temp-swap; see the module docstring for the
    measured cadence rationale; 0 disables).

    ``hash_fn(df, id_col, media_col) -> (id, hash)`` defaults to the
    image pHash (operators/multimodal.py:phash_gray); the AUDIO gate
    is the same machinery at hash_bits=60 over Haitsma-Kalker
    fingerprints — see make_ahash_dedup_gate. (Video needs the
    temporal verify and is not expressible as a single-hash gate.)

    Corrupt media (null hash) are ACCEPTED but not added to the
    corpus — they cannot match anything, and silently dropping them
    would violate the engine's per-record error isolation (R16);
    route them by ``hash is NULL`` downstream if quarantine is
    wanted."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        phash_batch_against_corpus,
        phash_near_dup_pairs,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
    )

    if hash_fn is None:
        from arc_kinesis_tagging_spark.operators.multimodal import phash_gray

        hash_fn = phash_gray

    _markers_init(spark, markers_dir)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already appended + emitted
        hashes = (
            hash_fn(batch_df, id_col, media_col)
            # the hash fns emit a FIXED (media_id, <hash>) schema
            # regardless of the input id column; rename both so the
            # id_col/hash_col knobs are real, not illusory
            .withColumnRenamed("media_id", id_col)
            .withColumnRenamed(hash_col, "phash")
            .localCheckpoint(eager=True)
            # eager pin: the hash table feeds the corpus probe, the
            # in-batch pair join (both sides), the survivor anti-joins
            # and the corpus append — recomputing the decode+hash five
            # times would dominate the batch
        )
        drop = None
        if ensure_corpus_registered(spark, table_prefix):
            dup_vs_corpus = (
                phash_batch_against_corpus(
                    spark, hashes, table_prefix,
                    id_col, "phash", max_hamming=max_hamming,
                    hash_bits=hash_bits,
                )
                # replay safety: a crash AFTER the corpus append but
                # BEFORE the marker means this batch's own survivors
                # are already corpus rows — without this guard the
                # replay would self-match every one at hamming 0,
                # drop the whole batch, then write the marker:
                # permanent downstream loss. Ids are globally unique
                # media ids, so id_batch == id_corpus can ONLY be the
                # replay artifact; filtering it makes the
                # append-then-crash replay emit the same survivors
                # again (at-least-once into the sink, duplicate
                # corpus band rows collapsed by the probe's dedup).
                .filter(F.col("id_batch") != F.col("id_corpus"))
                .select(F.col("id_batch").alias(id_col))
                .distinct()
            )
            drop = dup_vs_corpus
        # within-batch near-dup groups keep their smallest id: drop
        # id_b of every pair (id_a < id_b by construction) — survivors
        # are exactly the per-group minima
        in_batch = phash_near_dup_pairs(
            hashes, id_col, "phash", max_hamming=max_hamming,
            hash_bits=hash_bits,
        ).select(F.col("id_b").alias(id_col)).distinct()
        drop = in_batch if drop is None else drop.unionByName(in_batch)
        survivors = hashes.join(
            F.broadcast(drop.distinct()), id_col, "left_anti"
        ).localCheckpoint(eager=True)  # pin: append AND sink read it
        append_phash_corpus(
            spark,
            survivors,
            table_prefix,
            id_col,
            "phash",
            max_hamming=max_hamming,
            hash_bits=hash_bits,
        )
        accepted = batch_df.join(
            F.broadcast(survivors.select(id_col)), id_col, "left_semi"
        )
        accepted_sink(accepted, batch_id)
        _write_marker(spark, marker)  # atomic-ish: marker is LAST
        name = f"{table_prefix}_bands"
        if spark.catalog.tableExists(name):
            _maybe_compact(
                batch_id,
                compact_every,
                lambda: compact_bucketed_table(spark, name, ["chunk"]),
                spark=spark,
                markers_dir=markers_dir,
                # auto mode: doc-level batch count (the pinned
                # survivor table) vs band-level corpus count — the
                # constant bands-per-doc factor only LENGTHENS the
                # cadence, absorbed by the AUTO_CADENCE_MAX clamp
                batch_rows_fn=lambda: survivors.count(),
                corpus_rows_fn=lambda: spark.table(name).count(),
            )

    return gate


def make_ahash_dedup_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "media_id",
    media_col: str = "media",
    max_hamming: int = 4,
    compact_every: int | str = 64,
):
    """The AUDIO gate: identical machinery over Haitsma-Kalker
    fingerprints (operators/multimodal.py:ahash_wav, 60 bits -> 5
    pigeonhole bands of 12) — streaming cross-batch audio dedup
    against a persisted fingerprint corpus."""
    from arc_kinesis_tagging_spark.operators.multimodal import ahash_wav

    return make_phash_dedup_gate(
        spark,
        table_prefix,
        markers_dir,
        accepted_sink,
        id_col,
        media_col,
        max_hamming=max_hamming,
        hash_fn=ahash_wav,
        hash_col="ahash",
        hash_bits=60,
        compact_every=compact_every,
    )


def append_vhash_corpus(
    spark,
    frame_hashes: DataFrame,
    table_prefix: str,
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    hash_col: str = "fhash",
    max_hamming: int = 4,
    hash_bits: int = 63,
    n_buckets: int = 16,
) -> None:
    """Append a batch's per-frame banded chunks (with the sampled-
    frame count denormalized onto every band row) to the bucketed
    video corpus band table, creating it on first use — the growth
    half of write_vhash_corpus (operators/dedup.py), same layout."""
    from arc_kinesis_tagging_spark.operators.dedup import _frame_chunks

    fh = frame_hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("key"),
        F.col(frame_col).alias("f"),
        F.col(hash_col).alias("fh"),
    )
    nf = fh.groupBy("key").agg(F.count(F.lit(1)).alias("nf"))
    _append_bucketed_bands(
        spark,
        _frame_chunks(fh, max_hamming, hash_bits).join(nf, "key"),
        f"{table_prefix}_bands",
        ["f", "chunk"],
        n_buckets,
    )


def ensure_vhash_corpus_registered(
    spark, table_prefix: str, n_buckets: int = 16
) -> bool:
    """Video corpus re-attach (see _ensure_registered): the surviving
    (key, f, fh, band, chunk, nf) band table."""
    return _ensure_registered(
        spark,
        f"{table_prefix}_bands",
        "key BIGINT, f INT, fh BIGINT, band INT, chunk BIGINT, nf BIGINT",
        ["f", "chunk"],
        n_buckets,
    )


def make_vhash_dedup_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "media_id",
    media_col: str = "media",
    max_hamming: int = 4,
    every: int = 2,
    compact_every: int | str = 64,
):
    """The VIDEO gate: per-micro-batch frame hashing (every
    ``every``-th frame through the shared integer-DCT pHash), probe of
    the persisted per-frame band corpus under the STRICT temporal
    criterion (vhash_batch_against_corpus — every aligned sampled
    frame within threshold AND equal frame counts), keep-smallest-id
    for in-batch pairs (vhash_near_dup_pairs), survivors' frame bands
    appended. Same marker idempotency and append-then-crash
    at-least-once semantics as the image gate; the self-match guard
    is the same id-equality filter. Corrupt videos (null-hash frame
    row) are accepted and kept out of the corpus (R16)."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        vhash_batch_against_corpus,
        vhash_near_dup_pairs,
    )
    from arc_kinesis_tagging_spark.operators.multimodal import vhash_frames
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
    )

    _markers_init(spark, markers_dir)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already appended + emitted
        fh = (
            vhash_frames(batch_df, id_col, media_col, every=every)
            .withColumnRenamed("media_id", id_col)  # fixed output name
            .localCheckpoint(eager=True)
            # eager pin: feeds the corpus probe, the in-batch temporal
            # pair join, the survivor anti-joins, and the append
        )
        drop = None
        if ensure_vhash_corpus_registered(spark, table_prefix):
            drop = (
                vhash_batch_against_corpus(
                    spark, fh, table_prefix,
                    id_col, "frame_idx", "fhash",
                    max_hamming=max_hamming,
                )
                .filter(F.col("id_batch") != F.col("id_corpus"))
                .select(F.col("id_batch").alias(id_col))
                .distinct()
            )
        in_batch = vhash_near_dup_pairs(
            fh, id_col, "frame_idx", "fhash", max_hamming=max_hamming
        ).select(F.col("id_b").alias(id_col)).distinct()
        drop = in_batch if drop is None else drop.unionByName(in_batch)
        survivor_ids = (
            fh.select(id_col)
            .distinct()
            .join(F.broadcast(drop.distinct()), id_col, "left_anti")
            .localCheckpoint(eager=True)
        )
        append_vhash_corpus(
            spark,
            fh.join(F.broadcast(survivor_ids), id_col, "left_semi"),
            table_prefix,
            id_col,
            "frame_idx",
            "fhash",
            max_hamming=max_hamming,
        )
        accepted = batch_df.join(
            F.broadcast(survivor_ids), id_col, "left_semi"
        )
        accepted_sink(accepted, batch_id)
        _write_marker(spark, marker)  # atomic-ish: marker is LAST
        name = f"{table_prefix}_bands"
        if spark.catalog.tableExists(name):
            _maybe_compact(
                batch_id,
                compact_every,
                lambda: compact_bucketed_table(
                    spark, name, ["f", "chunk"]
                ),
                spark=spark,
                markers_dir=markers_dir,
                batch_rows_fn=lambda: survivor_ids.count(),
                corpus_rows_fn=lambda: spark.table(name).count(),
            )

    return gate


def make_embedding_dedup_gate(
    spark,
    index_path: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    nlist: int = 16,
    nprobe: int = 4,
    compact_every: int | str = 64,
):
    """The EMBEDDING gate — with this the streaming dedup-gate family
    spans every modality the engine ingests (text exact/TTL dedup in
    streaming/stateful.py, embeddings HERE, image/audio/video above):
    each micro-batch's vectors probe the PERSISTED cell-partitioned
    IVF index (operators/similarity.py:query_ivf_index — probe cells
    arrive as partition filters, so the corpus is pruned, never
    shuffled); a batch vector whose best non-self hit scores
    ``cos >= threshold`` is a near-duplicate of the corpus and is
    dropped; in-batch pairs (cosine_threshold_pairs — exact
    triangle-inequality-pruned, never all-pairs) keep the smaller id;
    survivors are APPENDED to the index against its frozen centroids
    (append_ivf_index — one narrow assignment pass + a partitioned
    append; the first batch builds the index). Probes pass
    ``exclude_self`` so a survivor's own index row — present once per
    append-then-crash replay of this epoch, any number of times — is
    dropped BEFORE ranking and the verdict always comes from the best
    real corpus hit (the pre-r12 k=2 after-rank filter saw past ONE
    self-row but a twice-replayed append left two, hiding a real
    near-dup at rank 3 — the perceptual gates collapse duplicate
    corpus rows via the probe's dropDuplicates; this is this gate's
    equivalent). Same marker idempotency; null vectors are accepted
    and kept out of the index (R16)."""
    from arc_kinesis_tagging_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        cosine_threshold_pairs,
        query_ivf_index,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_ivf_index,
        recover_interrupted_compaction,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        _fs_exists as _fs_exists_m,
    )

    _markers_init(spark, markers_dir)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already appended + emitted
        batch = (
            batch_df.select(id_col, vec_col)
            .filter(F.col(vec_col).isNotNull())
            .localCheckpoint(eager=True)
            # pin: probe, in-batch pairs (both sides), anti-join, append
        )
        # heal an interrupted index compaction swap BEFORE probing:
        # /centroids always survives (never compacted), so without
        # this a crash between the compactor's renames would leave
        # have_index True with /index missing — every probe failing —
        # or worse if existence were checked on /index: a silently
        # fresh index that forgets the whole corpus
        recover_interrupted_compaction(
            spark, index_path.rstrip("/") + "/index"
        )
        have_index = _fs_exists_m(spark, index_path.rstrip("/") + "/centroids")
        drop = None
        if have_index:
            hits = query_ivf_index(
                spark,
                index_path,
                batch.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col)
                ),
                k=1,
                nprobe=nprobe,
                id_col=id_col,
                vec_col=vec_col,
                # replayed self-rows (one per append-then-crash replay
                # of this epoch) are removed before ranking, so the
                # best hit is always a real corpus neighbor
                exclude_self=True,
            )
            drop = (
                hits.filter(F.col("cos_sim") >= threshold)
                .select(F.col("query_id").alias(id_col))
                .distinct()
            )
        in_batch = (
            cosine_threshold_pairs(batch, threshold, id_col, vec_col)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        drop = (
            in_batch if drop is None else drop.unionByName(in_batch)
        ).distinct().localCheckpoint(eager=True)
        # non-null survivors grow the index ...
        survivors = batch.join(F.broadcast(drop), id_col, "left_anti")
        if survivors.count() > 0:
            if have_index:
                append_ivf_index(
                    spark, survivors, index_path, id_col, vec_col
                )
            else:
                build_ivf_index(
                    spark, survivors, index_path, nlist=nlist,
                    id_col=id_col, vec_col=vec_col,
                )
        # ... while the ACCEPTED set anti-joins the drop list on the
        # RAW batch, so null-vector rows (never in drop — they cannot
        # match anything) pass through instead of being silently
        # swallowed by the null filter (R16)
        accepted = batch_df.join(F.broadcast(drop), id_col, "left_anti")
        accepted_sink(accepted, batch_id)
        _write_marker(spark, marker)  # atomic-ish: marker is LAST
        if _fs_exists_m(spark, index_path.rstrip("/") + "/centroids"):
            _maybe_compact(
                batch_id,
                compact_every,
                lambda: compact_ivf_index(spark, index_path),
                spark=spark,
                markers_dir=markers_dir,
                batch_rows_fn=lambda: survivors.count(),
                corpus_rows_fn=lambda: spark.read.parquet(
                    index_path.rstrip("/") + "/index"
                ).count(),
            )

    return gate


def make_text_dedup_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    compact_every: int | str = 64,
):
    """The TEXT gate (exact, unbounded horizon) — complements the
    TTL-window streaming dedup (streaming/stateful.py, which bounds
    state to one TTL window): document digests live in ONE bucketed
    corpus table, each micro-batch drops rows whose digest the corpus
    already holds (operators/dedup.py:fresh_against_corpus — the
    batch's digests Bloom-inject into the corpus scan; zero corpus
    Exchange on the bucketed table), keeps the smallest id per
    in-batch digest group, and appends the survivors' digests.

    Replay semantics (sink runs BEFORE the append in THIS gate): a
    crash after the sink but before the append replays to a still-
    fresh batch — delivered twice, appended once (at-least-once); a
    crash after the append but before the marker replays to an EMPTY
    fresh set (the survivors' digests are already corpus rows), the
    sink gets the empty frame, and the ORIGINAL pre-crash emit
    already delivered the rows — net exactly-once for that window.
    Duplicate digest rows from a double append change no verdict
    (the probe's semi-join is set-semantics)."""
    import hashlib as _hashlib  # noqa: F401 (documented digest choice)

    from arc_kinesis_tagging_spark.operators.dedup import (
        fresh_against_corpus,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
    )

    _markers_init(spark, markers_dir)
    name = f"{table_prefix}_digests"

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already emitted + appended
        digested = batch_df.withColumn(
            "digest", F.sha2(F.col(text_col).cast("string"), 256)
        ).localCheckpoint(eager=True)  # probe, group-min, sink, append
        # corrupt rows (null text -> null digest) are ACCEPTED, every
        # one of them, and kept out of the corpus — the media gates'
        # R16 contract. Without the split, groupBy(digest) lumps every
        # null-digest row into ONE group and min(id) silently drops
        # all but one corrupt row per batch.
        corrupt = digested.filter(F.col("digest").isNull())
        hashed = digested.filter(F.col("digest").isNotNull())
        have = _ensure_registered(
            spark, name, "digest STRING", ["digest"], n_buckets
        )
        fresh = (
            fresh_against_corpus(hashed, spark.table(name))
            if have
            else hashed
        )
        # keep the smallest id per in-batch digest group
        keep = fresh.groupBy("digest").agg(F.min(id_col).alias(id_col))
        accepted = fresh.join(
            F.broadcast(keep), [id_col, "digest"], "left_semi"
        ).localCheckpoint(eager=True)  # sink AND digest append read it
        accepted_sink(
            accepted.unionByName(corrupt).drop("digest"), batch_id
        )
        _append_bucketed_bands(
            spark,
            accepted.select("digest").distinct(), name, ["digest"],
            n_buckets,
        )
        _write_marker(spark, marker)  # atomic-ish: marker is LAST
        if spark.catalog.tableExists(name):
            _maybe_compact(
                batch_id,
                compact_every,
                lambda: compact_bucketed_table(
                    spark, name, ["digest"], n_buckets
                ),
                spark=spark,
                markers_dir=markers_dir,
                batch_rows_fn=lambda: accepted.count(),
                corpus_rows_fn=lambda: spark.table(name).count(),
            )

    return gate


def ensure_minhash_corpus_registered(
    spark,
    table_prefix: str,
    key_type: str = "BIGINT",
    n_buckets: int = 16,
) -> bool:
    """Re-attach BOTH minhash corpus tables (band keys + shingle-hash
    sets — the layout write_minhash_corpus materializes and
    minhash_fresh_against_corpus probes) to a fresh session. Returns
    True only when both are available: a crash between the first
    batch's two creates leaves the corpus half-built, and probing half
    a corpus would either fail (missing shingle table) or verify
    nothing — treating it as fresh is SAFE because the only rows it
    can hold are that replayed batch's own survivors, which the replay
    re-appends (duplicate band rows collapse in the probe's
    dropDuplicates, duplicate shingle rows in its verify semi-shape)."""
    have_bands = _ensure_registered(
        spark,
        f"{table_prefix}_bands",
        f"__key {key_type}, band INT, bkey STRING",
        ["bkey"],
        n_buckets,
    )
    have_shingles = _ensure_registered(
        spark,
        f"{table_prefix}_shingles",
        f"__key {key_type}, __sh_hashes ARRAY<BIGINT>",
        ["__key"],
        n_buckets,
    )
    return have_bands and have_shingles


def make_minhash_dedup_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    n_buckets: int = 16,
    compact_every: int | str = 64,
):
    """The TEXT NEAR-DUP gate (MinHash-LSH, unbounded horizon) — the
    approximate counterpart of make_text_dedup_gate, completing the
    gate family: exact digests catch byte-identical documents, this
    catches the boilerplate-variant / near-copy load (exact Jaccard >=
    threshold over word shingles, LSH-candidated) that dominates web
    corpora. Per micro-batch: ONE signature pass over the batch
    (operators/dedup.py:_minhash_sigs — each document is hashed
    exactly once and feeds the corpus probe, the in-batch pair join,
    and the survivor appends), probe the PERSISTED two-table corpus
    (band keys bucketed on bkey: batch bands broadcast, zero corpus
    Exchange; shingle sets bucketed on __key: verify join co-located),
    drop batch rows with a corpus near-dup, keep the smallest id per
    in-batch near-dup pair, append the survivors' band keys + shingle
    sets (bucket-aligned: at most one file per non-empty bucket per
    table), emit the accepted rows, write the marker LAST, and every
    ``compact_every``-th durable batch_id compact both tables
    (layout-preserving temp-swap; cadence rationale in the module
    docstring).

    Replay semantics match the perceptual gates: a replayed epoch
    whose marker exists is a no-op; an append-then-crash replay
    re-probes a corpus that already holds this batch's survivors, and
    the probe runs ``exclude_self=True`` (globally unique doc ids make
    batch_key == corpus_key a replay artifact by definition), so the
    survivors re-emerge, re-emit (at-least-once for exactly that crash
    window) and re-append — duplicate corpus rows change no verdict
    and routine compaction's distinct-free rewrite keeps them probe-
    harmless (candidate pairs are dropDuplicates'd).

    Documents that produce NO shingles (null text, or fewer than
    ``shingle_n`` tokens) cannot match anything: they are ACCEPTED,
    every one of them, and kept out of the corpus — the family's R16
    per-record isolation contract. Recall is the standard LSH band
    guarantee; exact duplicates collide in every band and are never
    missed; precision is exact (every dropped row truly has a
    >= threshold neighbor).

    Sizing ``(n_hashes, bands)`` to the threshold — collision
    probability for a true-similarity-``s`` pair is
    ``1 - (1 - s^r)^b`` with ``r = n_hashes // bands``; the default
    (16, 4) gives r=4: s=0.9 -> 0.99, s=0.8 -> 0.88, s=0.7 -> 0.67,
    s=0.5 -> 0.23. That is tuned for the near-copy/boilerplate load
    (s >= 0.8). A jaccard_threshold of 0.5 with HIGH recall needs a
    lower row count per band: (16, 8) gives r=2: s=0.5 -> 0.90,
    s=0.7 -> 0.995 — at 2x the band rows per document and more
    verify candidates (precision stays exact either way; only probe
    cost changes). Corpus band rows scale linearly in ``bands``, so
    re-banding an existing corpus means rebuilding it — pick the
    operating point before first ingest."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        _minhash_pairs_from_sigs,
        _minhash_sigs,
        _minhash_stale_keys_from_sigs,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
    )

    _markers_init(spark, markers_dir)
    bands_table = f"{table_prefix}_bands"
    shingles_table = f"{table_prefix}_shingles"

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already appended + emitted
        sigs = _minhash_sigs(
            batch_df, text_col, id_col, n_hashes, shingle_n
        ).localCheckpoint(eager=True)
        # pin: ONE decode+hash pass feeds the corpus probe, the
        # in-batch pair join (both sides), the anti-joins, and both
        # corpus appends
        drop = None
        if ensure_minhash_corpus_registered(
            spark, table_prefix, n_buckets=n_buckets
        ):
            drop = (
                _minhash_stale_keys_from_sigs(
                    spark, sigs, table_prefix, n_hashes, bands,
                    jaccard_threshold, exclude_self=True,
                )
                .select(F.col("__batch_key").alias(id_col))
                .distinct()
            )
        # within-batch near-dup pairs keep their smallest id: drop
        # key_b of every pair (key_a < key_b by construction)
        in_batch = (
            _minhash_pairs_from_sigs(
                sigs, n_hashes, bands, jaccard_threshold
            )
            .select(F.col("key_b").alias(id_col))
            .distinct()
        )
        drop = (
            in_batch if drop is None else drop.unionByName(in_batch)
        ).distinct().localCheckpoint(eager=True)
        survivors = sigs.join(
            F.broadcast(drop),
            sigs["__key"] == drop[id_col],
            "left_anti",
        ).localCheckpoint(eager=True)  # both appends read it
        from arc_kinesis_tagging_spark.operators.dedup import _band_keys

        _append_bucketed_bands(
            spark,
            _band_keys(survivors, n_hashes, bands),
            bands_table, ["bkey"], n_buckets,
        )
        _append_bucketed_bands(
            spark,
            survivors.select("__key", "__sh_hashes"),
            shingles_table, ["__key"], n_buckets,
        )
        # rows with no signature (null/too-short text) are never in
        # drop — the raw-batch anti-join passes them through (R16)
        accepted = batch_df.join(F.broadcast(drop), id_col, "left_anti")
        accepted_sink(accepted, batch_id)
        _write_marker(spark, marker)  # atomic-ish: marker is LAST
        if spark.catalog.tableExists(bands_table):
            def _compact_both():
                compact_bucketed_table(spark, bands_table, ["bkey"])
                compact_bucketed_table(spark, shingles_table, ["__key"])

            _maybe_compact(
                batch_id,
                compact_every,
                _compact_both,
                spark=spark,
                markers_dir=markers_dir,
                batch_rows_fn=lambda: survivors.count(),
                corpus_rows_fn=lambda: spark.table(bands_table).count(),
            )

    return gate


def make_simhash_dedup_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    compact_every: int | str = 64,
):
    """The TEXT NEAR-DUP gate #2 — SimHash/Hamming (Charikar's
    similarity-estimation sketch; reference for the batch analog:
    q_dedup_simhash), the bag-of-words-cosine complement of the
    MinHash/Jaccard gate above: two documents whose token SETS mostly
    overlap land within a few bits of each other in the 60-bit
    sign-vote sketch, so boilerplate variants collapse at a fixed
    per-document cost of ONE 64-bit hash — the cheapest near-dup
    operating point (8 bytes/doc of corpus state vs MinHash's
    n_hashes + shingle sets).

    Machinery: the IMAGE gate runs verbatim over the text hash —
    ``_simhash64`` (operators/dedup.py, pure JVM expression) plugs in
    as ``hash_fn`` at ``hash_bits=60``, so this gate inherits every
    property pinned for the perceptual gates: pigeonhole banding at
    ``max_hamming + 1`` bands (candidate recall EXACTLY 1.0 at the
    threshold — stronger than the batch op's fixed 4-band LSH, which
    is probabilistic above hamming 3), bucketed corpus probed with
    batch-broadcast and zero corpus Exchange, verify folded into the
    band-join condition, replay-safe markers with the
    append-then-crash self-match filter, R16 corrupt isolation (null
    text -> null hash -> accepted, never in the corpus), and
    marker-cadenced self-compaction.

    Semantics note: empty or whitespace-only text simhashes to 0
    (every bit's vote sum is empty), so all such docs are mutual
    hamming-0 dups — the first is admitted, the rest dropped. Run a
    quality gate upstream if empty docs must all pass."""
    from arc_kinesis_tagging_spark.operators.dedup import _simhash64

    def simhash_fn(df: DataFrame, id_c: str, txt_c: str) -> DataFrame:
        # the gate's hash_fn contract: fixed (media_id, <hash>) output.
        # _simhash64 folds a NULL text to 0 (its empty vote sum), which
        # would silently dedup corrupt rows against empty documents —
        # guard it to NULL so they ride the gate's R16 corrupt path
        # (accepted, never in the corpus) like every other modality.
        return df.select(
            F.col(id_c).alias("media_id"),
            F.when(F.col(txt_c).isNull(), F.lit(None).cast("long"))
            .otherwise(_simhash64(txt_c))
            .alias("simhash"),
        )

    return make_phash_dedup_gate(
        spark,
        table_prefix,
        markers_dir,
        accepted_sink,
        id_col,
        text_col,
        max_hamming=max_hamming,
        hash_fn=simhash_fn,
        hash_col="simhash",
        hash_bits=60,
        compact_every=compact_every,
    )


def make_decontamination_gate(
    spark,
    benchmark: DataFrame,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_shared: int = 3,
    n_buckets: int = 16,
):
    """Streaming train-side DECONTAMINATION gate: drop any batch doc
    sharing >= ``min_shared`` distinct word ``shingle_n``-grams with a
    FROZEN benchmark/eval set; survivors flow to ``accepted_sink``.
    Completes the ingest stack (exact -> near-dup -> decontamination,
    all valid accepted_sinks for each other): benchmark contamination
    never ENTERS the corpus, instead of waiting for the periodic batch
    refresh (tools/curation_e2e.py) to scrub it.

    Same overlap semantics as the batch analog
    (operators/dedup.py:contamination_pairs / q_contamination), but
    shingles ride as md5-prefix HASHES (the jaccard joins'
    distinct-hash set semantics) so the persisted table and join keys
    are 8 bytes.

    Scale shape — the dedup gates' corpus-probe pattern applied to a
    STATIC corpus: the benchmark's (hash, bench_key) rows are exploded
    ONCE at gate construction into a bucketed table; each batch's
    shingles BROADCAST onto it (one benchmark scan, zero benchmark
    Exchange, no growth, no compaction). The per-(doc, bench) overlap
    count shuffles only MATCHED rows. Restart-safe: the table
    re-attaches externally via the gates' shared helper, and if it is
    already registered the provided ``benchmark`` DataFrame is not
    re-read at all — the persisted table is the frozen truth. Replay
    markers make the gate idempotent; null/empty text hashes to an
    empty shingle set, so corrupt rows can never be 'contaminated'
    and pass through (R16)."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        _hashed_shingle_set,
    )

    name = f"{table_prefix}_benchsh"
    _markers_init(spark, markers_dir)
    if not _ensure_registered(
        spark, name, "bsh BIGINT, bench_key STRING", ["bsh"], n_buckets
    ):
        # The overlap COUNT below assumes each benchmark doc's shingle
        # rows are UNIQUE (append_benchmark_shingles documents and
        # enforces it on append) — the initial build must enforce the
        # same invariant: a benchmark fed in with duplicated rows or
        # repeated doc_ids would double every per-(doc, bench) match
        # count and spuriously clear min_shared, dropping clean docs.
        # Same policy as the append path: first text per bench key.
        bsh = (
            benchmark.select(
                F.col(id_col).cast("string").alias("bench_key"),
                F.col(text_col).alias("__text"),
            )
            .dropDuplicates(["bench_key"])
            .select(
                "bench_key",
                F.explode(
                    _hashed_shingle_set("__text", shingle_n)
                ).alias("bsh"),
            )
            .select("bsh", "bench_key")
        )
        _append_bucketed_bands(spark, bsh, name, ["bsh"], n_buckets)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already emitted
        doc_sh = batch_df.select(
            F.col(id_col).alias("__doc_key"),
            F.explode(_hashed_shingle_set(text_col, shingle_n)).alias(
                "bsh"
            ),
        ).localCheckpoint(eager=True)  # probe + nothing else re-derives
        drop = (
            spark.table(name)
            .join(F.broadcast(doc_sh), "bsh")
            .groupBy("__doc_key", "bench_key")
            .agg(F.count(F.lit(1)).alias("__n_shared"))
            .filter(F.col("__n_shared") >= min_shared)
            .select("__doc_key")
            .distinct()
        )
        accepted = batch_df.join(
            F.broadcast(drop),
            batch_df[id_col] == drop["__doc_key"],
            "left_anti",
        )
        accepted_sink(accepted, batch_id)
        _write_marker(spark, marker)  # atomic-ish: marker is LAST

    return gate


def append_benchmark_shingles(
    spark,
    benchmark: DataFrame,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_buckets: int = 16,
) -> int:
    """Grow a decontamination gate's benchmark table with NEWLY
    released eval docs (the one mutation a frozen benchmark needs);
    returns the number of bench docs actually added.

    The gate's per-(doc, bench) overlap COUNT assumes each benchmark
    document's shingle rows are UNIQUE — a double-appended bench doc
    would double every match count and spuriously clear min_shared.
    The helper enforces that invariant at write time: new docs are
    de-duplicated within the batch (first text per key wins) and
    anti-joined against the bench keys already in the table, so
    re-running an append (operator retry, replayed orchestration
    step) is idempotent. Shingle sets are distinct per doc by
    construction (_hashed_shingle_set). Appends ride the
    bucket-aligned path (at most one file per non-empty bucket);
    the table's self-compaction belongs to whatever cadence the
    deployment runs on bench updates — they are rare, so fragmentation
    is bounded by update count, not stream length."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        _hashed_shingle_set,
    )

    name = f"{table_prefix}_benchsh"
    fresh = benchmark.select(
        F.col(id_col).cast("string").alias("bench_key"),
        F.col(text_col).alias("__text"),
    ).dropDuplicates(["bench_key"])
    if spark.catalog.tableExists(name):
        fresh = fresh.join(
            F.broadcast(
                spark.table(name).select("bench_key").distinct()
            ),
            "bench_key",
            "left_anti",
        )
    fresh = fresh.localCheckpoint(eager=True)  # counted AND appended
    n = fresh.count()
    if n:
        bsh = fresh.select(
            "bench_key",
            F.explode(_hashed_shingle_set("__text", shingle_n)).alias(
                "bsh"
            ),
        ).select("bsh", "bench_key")
        _append_bucketed_bands(spark, bsh, name, ["bsh"], n_buckets)
    return n


def make_substring_clip_gate(
    spark,
    table_prefix: str,
    markers_dir: str,
    accepted_sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 16,
    n_buckets: int = 16,
    compact_every: int | str = 64,
):
    """Streaming ExactSubstr CLIP gate — the substring modality's
    member of the gate tier (exact / MinHash / SimHash / media /
    decontamination / classifier): every micro-batch is REWRITTEN,
    not dropped — token windows whose content the corpus has already
    seen (any earlier batch) or that repeat within the batch are
    merged into maximal spans and clipped out before emission
    (operators/substring.py), so the emitted stream never carries the
    same ``window_tokens``-token content twice beyond its single
    first arrival. The streaming policy is keep-first-ARRIVAL: the
    first batch containing a span emits it verbatim (unique so far);
    every later occurrence is clipped. Within one batch, brand-new
    duplicated content is removed from ALL its occurrences — the
    batch operator's (q_dedup_substring_clip) remove-all policy.

    Scale shape — the dedup gates' corpus-probe pattern at window
    granularity: the corpus table holds one 8-byte xxhash64 row per
    DISTINCT window ever seen, bucketed on the hash; each batch's
    distinct window set BROADCASTS onto it (one corpus scan, zero
    corpus Exchange), the clip itself is a per-doc islands window
    plus a map-side positional filter, and only UNSEEN window hashes
    append (bucket-aligned, at most one file per non-empty bucket,
    self-compacting on the shared cadence). ALL batch windows append
    — including clipped ones — so content that was removed entirely
    still blocks future arrivals.

    Replay semantics: the marker is written LAST, so a crash anywhere
    replays the whole batch; the probe is set-semantics (duplicate
    window rows from a double append change no verdict) and the
    re-emit overwrites the same sink epoch. Null-text rows emit no
    windows, join no spans, and pass through VERBATIM (R16)."""
    from arc_kinesis_tagging_spark.operators.substring import (
        clip_spans,
        merge_window_spans,
        window_hash_positions,
    )
    from arc_kinesis_tagging_spark.sources.maintenance import (
        compact_bucketed_table,
    )

    _markers_init(spark, markers_dir)
    name = f"{table_prefix}_windows"

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already emitted + appended
        wins = window_hash_positions(
            batch_df, id_col, text_col, window_tokens
        ).localCheckpoint(eager=True)  # probe + in-batch count + mark + append
        batch_whs = wins.select("wh").distinct()
        have = _ensure_registered(
            spark, name, "wh BIGINT", ["wh"], n_buckets
        )
        if have:
            # which batch windows the corpus already holds: broadcast
            # the (small) batch set onto the (huge) corpus — one scan,
            # zero corpus Exchange on the bucketed table
            seen = (
                spark.table(name)
                .join(F.broadcast(batch_whs), "wh")
                .select("wh")
                .distinct()
                # consumed by BOTH the clip verdict and the append
                # anti-join — pin so the corpus scans once per batch
                .localCheckpoint(eager=True)
            )
        else:
            seen = batch_whs.limit(0)
        in_batch_dup = (
            wins.groupBy("wh")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") >= 2)
            .select("wh")
        )
        dup_whs = seen.unionByName(in_batch_dup).distinct()
        hits = wins.join(F.broadcast(dup_whs), "wh").select(id_col, "s")
        spans = merge_window_spans(hits, id_col, window_tokens)
        accepted_sink(
            clip_spans(batch_df, spans, id_col, text_col), batch_id
        )
        # unseen hashes only: appending `seen` again would grow the
        # table without changing any future verdict (set semantics)
        _append_bucketed_bands(
            spark,
            batch_whs.join(F.broadcast(seen), "wh", "left_anti"),
            name,
            ["wh"],
            n_buckets,
        )
        _write_marker(spark, marker)  # atomic-ish: marker is LAST
        if spark.catalog.tableExists(name):
            _maybe_compact(
                batch_id,
                compact_every,
                lambda: compact_bucketed_table(
                    spark, name, ["wh"], n_buckets
                ),
                spark=spark,
                markers_dir=markers_dir,
                batch_rows_fn=lambda: batch_whs.count(),
                corpus_rows_fn=lambda: spark.table(name).count(),
            )

    return gate


def make_classifier_gate(
    spark,
    model: dict,
    markers_dir: str,
    accepted_sink,
    admit_labels,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming SUPERVISED-classifier admission gate: score each
    batch doc with a FROZEN fastText-style model
    (operators/quality_clf.py — train offline, freeze, gate the
    stream: the production shape of the wiki-vs-CommonCrawl quality
    filter) and pass only docs whose predicted label is in
    ``admit_labels``; survivors flow to ``accepted_sink``. Completes
    the admission stack alongside the unsupervised robots/LM/DSIR
    gates and the dedup/decontamination gates — all valid
    accepted_sinks for each other.

    Scale shape: the model is vocabulary-bounded (n_buckets x
    n_classes weights) and rides to executors as a broadcast join;
    scoring is the apply path's one broadcast join + one doc-keyed
    aggregate per batch (partial-agg collapses each doc's grams
    map-side), then a batch-bounded semi join back. No state grows
    with the stream — the gate is stateless by construction, so
    there is nothing to compact.

    R16 semantics (the decontamination gate's convention): docs with
    NO scorable features (null/empty text) cannot be classified and
    PASS THROUGH — an upstream corrupt row must never be silently
    destroyed by a gate that cannot even read it; route it to a
    dead-letter stage if the deployment wants it gone. Replay markers
    make the gate idempotent across epoch replays."""
    from arc_kinesis_tagging_spark.operators.quality_clf import (
        apply_quality_classifier,
    )

    admit = sorted(set(admit_labels))
    unknown = [c for c in admit if c not in model["classes"]]
    if unknown:
        raise ValueError(
            f"admit_labels {unknown} not in model classes "
            f"{model['classes']}"
        )
    _markers_init(spark, markers_dir)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_uri(markers_dir, batch_id)
        if _marker_exists(spark, marker):
            return  # replayed epoch: already emitted
        scored = apply_quality_classifier(
            batch_df, model, text_col, id_col=id_col
        )
        rejected = scored.filter(
            ~F.col("pred").isin(admit)
        ).select(F.col(id_col).alias("__rej_key"))
        accepted = batch_df.join(
            F.broadcast(rejected),
            batch_df[id_col] == rejected["__rej_key"],
            "left_anti",
        )
        accepted_sink(accepted, batch_id)
        _write_marker(spark, marker)  # atomic-ish: marker is LAST

    return gate
