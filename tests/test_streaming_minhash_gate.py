"""Streaming cross-batch TEXT NEAR-DUP gate (MinHash-LSH, persisted
two-table corpus): in-batch near-dup pairs keep the smallest id, a
near-copy of ANY earlier batch's survivor is dropped (unbounded
horizon), unshingleable rows pass through (R16), a replayed epoch is
a no-op (marker idempotency), an append-then-crash replay re-emits
instead of self-matching to zero (exclude_self), and the cadence
compaction works on re-attached EXTERNAL corpora after a simulated
driver restart.

Fixture texts are pinned: the hashing is fully deterministic
(xxhash64 seed 42 + md5-derived coefficients, operators/dedup.py),
so the measured pair set — (A0,A1) (A0,A2) (A1,A2) (B0,B1) at
jaccard 0.85-0.92, C0/D0 isolated — holds on every run and engine.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd

from arc_kinesis_tagging_spark.streaming.dedup_gate import (
    ensure_minhash_corpus_registered,
    make_minhash_dedup_gate,
)

A0 = "the quick brown fox jumps over the lazy dog near the river bank"
A1 = A0 + " today"
A2 = A0 + " again"
B0 = "pack my box with five dozen liquor jugs while the band plays on"
B1 = B0 + " tonight"
C0 = "sphinx of black quartz judge my vow under golden evening light"
D0 = "jaded zombies acted quaintly but kept driving their oxen forward"


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
             "text": [r[1] for r in rows]}
        )
    )


def test_minhash_gate_dedups_across_batches(spark, tmp_path):
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_mhgate_" + uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    gate = make_minhash_dedup_gate(spark, prefix, markers, sink)

    # batch 0: (1, 3) are near-dups -> keep smallest id 1; 4 is fresh
    gate(_batch(spark, [(3, A1), (1, A0), (4, B0)]), 0)
    assert accepted == [[1, 4]]
    bands = spark.table(f"{prefix}_bands")
    shingles = spark.table(f"{prefix}_shingles")
    assert bands.count() == 2 * 4  # 2 survivors x 4 bands
    assert sorted(
        r["__key"] for r in shingles.select("__key").collect()
    ) == [1, 4]

    # batch 1: 10 ~ corpus A0, 11 ~ corpus B0 -> dropped; 12 fresh
    gate(_batch(spark, [(10, A2), (11, B1), (12, C0)]), 1)
    assert accepted == [[1, 4], [12]]
    assert spark.table(f"{prefix}_shingles").count() == 3

    # marker replay: exact no-op (no re-emit, no corpus growth)
    gate(_batch(spark, [(10, A2), (11, B1), (12, C0)]), 1)
    assert accepted == [[1, 4], [12]]
    assert spark.table(f"{prefix}_bands").count() == 3 * 4

    # append-then-crash replay: batch 2's survivors are already corpus
    # rows when the marker is deleted; exclude_self keeps them from
    # self-matching at jaccard 1.0, so they re-emit (at-least-once)
    # instead of silently disappearing downstream
    gate(_batch(spark, [(20, D0)]), 2)
    os.remove(os.path.join(markers, f"batch-{2:020d}"))
    gate(_batch(spark, [(20, D0)]), 2)
    assert accepted == [[1, 4], [12], [20], [20]]
    # the double append left duplicate corpus rows; verdicts unchanged
    gate(_batch(spark, [(30, D0 + " anew"), (31, A0 + " anew")]), 3)
    assert accepted[-1] == []


def test_minhash_gate_accepts_unshingleable_rows(spark, tmp_path):
    """Null text and documents with fewer than shingle_n tokens have
    no signature: they cannot match anything, so EVERY one is
    accepted and none enters the corpus (the family's R16 per-record
    isolation contract)."""
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_mhr16_" + uuid.uuid4().hex[:12]
    gate = make_minhash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    gate(_batch(spark, [(1, None), (2, "hi there"), (3, A0), (4, None)]), 0)
    assert accepted == [[1, 2, 3, 4]]
    assert sorted(
        r["__key"]
        for r in spark.table(f"{prefix}_shingles").select("__key").collect()
    ) == [3]
    # unshingleable rows are accepted EVERY time they arrive (never
    # deduped — there is nothing to match on)
    gate(_batch(spark, [(10, None), (11, "hi there")]), 1)
    assert accepted == [[1, 2, 3, 4], [10, 11]]


def test_minhash_gate_compacts_reattached_corpus(spark, tmp_path):
    """Cadence compaction on BOTH corpus tables, including after a
    simulated driver restart re-attaches them as EXTERNAL tables —
    admissions identical throughout, file counts bounded by one file
    per non-empty bucket."""
    from arc_kinesis_tagging_spark.sources.maintenance import (
        parquet_file_count,
        table_location,
    )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_mhcad_" + uuid.uuid4().hex[:12]
    markers = str(tmp_path / "markers")
    gate = make_minhash_dedup_gate(
        spark, prefix, markers, sink, compact_every=2
    )
    gate(_batch(spark, [(1, A0), (2, B0)]), 0)  # 1 marker
    gate(_batch(spark, [(3, C0), (4, A1)]), 1)  # 4 ~ corpus A0; compacts
    bands_loc = table_location(spark, f"{prefix}_bands")
    sh_loc = table_location(spark, f"{prefix}_shingles")
    # 3 survivors: <= 3 shingle files; <= 12 band rows -> <= 12 files
    assert parquet_file_count(sh_loc) <= 3
    assert parquet_file_count(bands_loc) <= 12

    # -- driver restart: catalog entries die, files survive --
    saved_b = str(tmp_path / "saved_bands")
    saved_s = str(tmp_path / "saved_shingles")
    shutil.copytree(bands_loc, saved_b)
    shutil.copytree(sh_loc, saved_s)
    spark.sql(f"DROP TABLE {prefix}_bands")
    spark.sql(f"DROP TABLE {prefix}_shingles")
    shutil.copytree(saved_b, bands_loc)
    shutil.copytree(saved_s, sh_loc)
    assert ensure_minhash_corpus_registered(spark, prefix)

    gate(_batch(spark, [(5, D0), (6, B1)]), 2)  # re-attached; 6 ~ B0
    gate(_batch(spark, [(7, A2), (8, D0 + " anew")]), 3)  # compacts EXTERNAL
    assert accepted == [[1, 2], [3], [5], []]
    # post-compaction probe still dedups and appends still align
    gate(_batch(spark, [(9, C0 + " anew"), (10, "totally unrelated words for a genuinely fresh document here")]), 4)
    assert accepted[-1] == [10]
    assert parquet_file_count(sh_loc) <= 3 + 2 + 1  # bounded, not 5 file sets


import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def sp(spark):
    return spark


# 4 near-dup cliques of 3 (doc i belongs to group i//3): pinned in a
# one-off run of minhash_near_duplicates over this exact fixture —
# all 12 in-group pairs detected (jaccard 0.83-0.92, every pair
# band-collides), zero cross-group pairs. Deterministic hashing makes
# that exact pair set a constant of the engine.
_BASES = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "pack my box with five dozen liquor jugs while the band plays on",
    "sphinx of black quartz judge my vow under golden evening light tonight",
    "jaded zombies acted quaintly but kept driving their oxen forward all day",
]
_SUFS = [["", " today", " again"], ["", " today", " now"],
         ["", " today", " again"], ["", " today", " again"]]
_TEXTS = [_BASES[i // 3] + _SUFS[i // 3][i % 3] for i in range(12)]


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
def test_minhash_gate_one_representative_per_clique_any_batching(
    sp, tmp_path_factory, perm, cuts
):
    """PROPERTY: for ANY arrival order and ANY split of the stream
    into micro-batches, the MinHash gate admits EXACTLY ONE member
    per near-dup clique (fixture groups = doc_id//3), and it is the
    smallest id within the earliest batch that contains any member of
    that clique — the same invariant the perceptual gates carry."""
    import uuid as _uuid

    bounds = sorted(cuts) + [12]
    batches, prev = [], 0
    for b in bounds:
        if b > prev:
            batches.append(perm[prev:b])
            prev = b

    accepted: list[int] = []
    tmp = tmp_path_factory.mktemp("mhgate")
    gate = make_minhash_dedup_gate(
        sp,
        "akt_mhp_" + _uuid.uuid4().hex[:12],
        str(tmp / "markers"),
        lambda d, bid: accepted.extend(r["doc_id"] for r in d.collect()),
    )
    for bid, ids in enumerate(batches):
        gate(_batch(sp, [(i, _TEXTS[i]) for i in ids]), bid)

    want = {}
    for ids in batches:
        for g in {i // 3 for i in ids}:
            if g not in want:
                want[g] = min(i for i in ids if i // 3 == g)
    assert sorted(accepted) == sorted(want.values())


def test_minhash_gate_survives_crash_between_the_two_appends(
    spark, tmp_path
):
    """The two-table corpus has a crash window the single-table gates
    don't: bands appended, shingles NOT, marker missing. The replay
    must neither lose the batch (its rows self-match their own band
    rows, but those candidates die at the shingle verify inner join —
    no shingle row exists) nor corrupt later verdicts (the replay
    re-appends both tables; duplicate band rows collapse in the
    probe's dropDuplicates)."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        _band_keys,
        _minhash_sigs,
    )
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        _append_bucketed_bands,
    )

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_mhcw_" + uuid.uuid4().hex[:12]
    gate = make_minhash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    # batch 0 runs clean, establishing both corpus tables
    gate(_batch(spark, [(1, A0), (2, B0)]), 0)
    assert accepted == [[1, 2]]

    # simulate batch 1 crashing between its two appends: its
    # survivors' BAND rows land, shingles and marker do not
    b1 = _batch(spark, [(10, C0), (11, D0)])
    sigs = _minhash_sigs(b1, "text", "doc_id", 16, 3)
    _append_bucketed_bands(
        spark, _band_keys(sigs, 16, 4), f"{prefix}_bands", ["bkey"], 16
    )
    assert spark.table(f"{prefix}_bands").count() == 4 * 4  # 2 + 2 docs
    assert spark.table(f"{prefix}_shingles").count() == 2  # still batch 0

    # the replay: both fresh docs must re-emerge and both tables
    # converge to the full survivor set
    gate(b1, 1)
    assert accepted == [[1, 2], [10, 11]]
    assert sorted(
        r["__key"]
        for r in spark.table(f"{prefix}_shingles").select("__key").collect()
    ) == [1, 2, 10, 11]
    # duplicate band rows from the half-append change no later verdict
    gate(_batch(spark, [(20, C0 + " anew"), (21, A0 + " anew")]), 2)
    assert accepted[-1] == []
