"""Stacked streaming dedup gates: a gate IS a valid ``accepted_sink``
for another gate (both are ``(df, batch_id)`` callables), so the
DEPLOY.md text-ingest recipe — exact-digest gate first, MinHash
near-dup gate over its survivors — composes without any new machinery.
These tests pin the composition's semantics: each stage's corpus
grows by exactly its own survivors, replay markers make the WHOLE
stack idempotent, and the crash windows of the outer stage degrade to
the inner stage's marker no-op (no double delivery downstream)."""

from __future__ import annotations

import os
import uuid

import pandas as pd

from arc_kinesis_tagging_spark.streaming.dedup_gate import (
    make_minhash_dedup_gate,
    make_text_dedup_gate,
)

A0 = "the quick brown fox jumps over the lazy dog near the river bank"
A1 = A0 + " today"
B0 = "pack my box with five dozen liquor jugs while the band plays on"
C0 = "sphinx of black quartz judge my vow under golden evening light"


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
             "text": [r[1] for r in rows]}
        )
    )


def test_exact_then_minhash_stack(spark, tmp_path):
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    p_exact = "akt_stk_e_" + uuid.uuid4().hex[:12]
    p_mh = "akt_stk_m_" + uuid.uuid4().hex[:12]
    inner = make_minhash_dedup_gate(
        spark, p_mh, str(tmp_path / "m_mh"), sink
    )
    outer = make_text_dedup_gate(
        spark, p_exact, str(tmp_path / "m_ex"), inner
    )

    # batch 0: 2 is an EXACT dup of 1 (caught by stage 1);
    # 3 is a NEAR dup of 1 (passes stage 1, caught by stage 2)
    outer(_batch(spark, [(1, A0), (2, A0), (3, A1), (4, B0)]), 0)
    assert accepted == [[1, 4]]
    # stage-1 corpus holds its own survivors (unique texts: A0 A1 B0),
    # stage-2 corpus holds only what survived BOTH stages
    assert spark.table(f"{p_exact}_digests").distinct().count() == 3
    assert sorted(
        r["__key"]
        for r in spark.table(f"{p_mh}_shingles").select("__key").collect()
    ) == [1, 4]

    # batch 1: exact dup of an earlier batch (10 = A0), near dup of an
    # earlier batch (11 ~ B0 via stage 2? no — 11 IS B0 exactly: stage
    # 1 drops it), genuinely fresh 12
    outer(_batch(spark, [(10, A0), (11, B0), (12, C0)]), 1)
    assert accepted == [[1, 4], [12]]

    # whole-stack replay: outer marker short-circuits before the inner
    # gate ever runs — nothing re-emits, neither corpus grows
    n_mh_bands = spark.table(f"{p_mh}_bands").count()
    outer(_batch(spark, [(10, A0), (11, B0), (12, C0)]), 1)
    assert accepted == [[1, 4], [12]]
    assert spark.table(f"{p_mh}_bands").count() == n_mh_bands

    # outer append-then-crash window: delete only the OUTER marker.
    # The replay re-runs stage 1 against a corpus already holding the
    # batch's digests -> empty fresh set -> stage 2 receives the empty
    # frame for an epoch whose INNER marker exists -> inner no-op.
    # Downstream sees nothing twice.
    outer(_batch(spark, [(20, "jaded zombies acted quaintly but kept driving oxen")]), 2)
    os.remove(os.path.join(str(tmp_path / "m_ex"), f"batch-{2:020d}"))
    outer(_batch(spark, [(20, "jaded zombies acted quaintly but kept driving oxen")]), 2)
    assert accepted == [[1, 4], [12], [20]]


def test_gate_markers_accept_scheme_uris(spark, tmp_path):
    """The markers dir is documented to live on the checkpoint's
    durable store, i.e. a scheme URI on a real cluster. Drive a gate
    with an explicit file: URI (the only scheme the container has) so
    the Hadoop-FS marker path — mkdirs, exists-check, create+rename —
    is exercised on URI input, not just bare local paths."""
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_uri_" + uuid.uuid4().hex[:12]
    markers = "file:" + str(tmp_path / "markers_uri")
    gate = make_text_dedup_gate(spark, prefix, markers, sink)
    gate(_batch(spark, [(1, A0), (2, A0)]), 0)
    gate(_batch(spark, [(3, A0), (4, B0)]), 1)
    assert accepted == [[1], [4]]
    # replay short-circuits on the URI-addressed marker
    gate(_batch(spark, [(3, A0), (4, B0)]), 1)
    assert accepted == [[1], [4]]
    # the marker landed where the URI points (local file behind file:)
    assert os.path.exists(
        os.path.join(str(tmp_path / "markers_uri"), f"batch-{1:020d}")
    )


def test_exact_then_simhash_stack(spark, tmp_path):
    """The SimHash gate composes the same way (it is the phash gate
    machinery, so its sink contract is identical): exact digests
    first, SimHash near-dup over the survivors. SIM0/SIM1 differ by
    one appended token (hamming 4 <= 6, premise pinned in
    tests/test_streaming_simhash_gate.py); B0 is far from both."""
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        make_simhash_dedup_gate,
    )

    SIM0 = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps near the warm fire and the birds sing in the tall "
        "green trees outside"
    )
    SIM1 = SIM0 + " today"

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    p_exact = "akt_stk_e_" + uuid.uuid4().hex[:12]
    p_sh = "akt_stk_s_" + uuid.uuid4().hex[:12]
    inner = make_simhash_dedup_gate(
        spark, p_sh, str(tmp_path / "m_sh"), sink
    )
    outer = make_text_dedup_gate(
        spark, p_exact, str(tmp_path / "m_ex"), inner
    )

    # 2 exact-dups 1 (stage 1); 3 near-dups 1 (stage 2); 4 fresh
    outer(_batch(spark, [(1, SIM0), (2, SIM0), (3, SIM1), (4, B0)]), 0)
    assert accepted == [[1, 4]]
    # stage-2 corpus holds only what survived BOTH stages (7 bands each)
    corpus = spark.table(f"{p_sh}_bands")
    assert sorted(
        r["key"] for r in corpus.select("key").distinct().collect()
    ) == [1, 4]
    # cross-batch through the stack: exact dup of 1 dies in stage 1,
    # near dup of 1 dies in stage 2, fresh C0 survives both
    outer(_batch(spark, [(10, SIM0), (11, SIM1 + " x"), (12, C0)]), 1)
    # 11 = SIM0 + " today x": two extra tokens; verify the premise
    # dynamically rather than assuming — if it drifted past the
    # threshold the assertion below would misattribute the drop
    from arc_kinesis_tagging_spark.operators.dedup import _simhash64
    from pyspark.sql import functions as F

    hs = {
        r["doc_id"]: r["h"]
        for r in _batch(spark, [(0, SIM0), (11, SIM1 + " x")])
        .select("doc_id", _simhash64("text").alias("h"))
        .collect()
    }
    assert bin(hs[0] ^ hs[11]).count("1") <= 6
    assert accepted == [[1, 4], [12]]
