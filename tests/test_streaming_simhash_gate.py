"""Streaming cross-batch TEXT NEAR-DUP gate #2 (SimHash/Hamming over
the image-gate machinery at hash_bits=60): in-batch near-dup groups
keep the smallest id, a near-copy of ANY earlier batch's survivor is
dropped (unbounded horizon, persisted band corpus), null-text rows
pass through (R16) and stay out of the corpus, and exact copies are
always caught (hamming 0).

Fixture texts are pinned and SELF-VALIDATED: the 60-bit SimHash is
fully deterministic (md5-derived token hashes, operators/dedup.py
_simhash64), and each test first recomputes the pairwise hamming
distances and asserts the fixture's premise (NEAR <= 6 < FAR) before
exercising the gate, so a future tokenizer/hash change fails loudly
at the premise, not as a confusing admission diff."""

from __future__ import annotations

import itertools
import uuid

import pandas as pd
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.streaming.dedup_gate import (
    make_simhash_dedup_gate,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees outside"
)
NEAR = BASE + " today"  # measured hamming 4 (<= 6)
FAR = (
    "completely different content about database query optimization and "
    "distributed systems engineering with spark catalyst tungsten codegen"
)  # measured hamming 29+ from BASE/NEAR


def _hamming(spark, texts):
    from arc_kinesis_tagging_spark.operators.dedup import _simhash64

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", _simhash64("text").alias("h")).collect()
    }
    return {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a, b in itertools.combinations(sorted(hs), 2)
    }


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
                "text": [r[1] for r in rows],
            }
        )
    )


def test_simhash_gate_dedups_across_batches(spark, tmp_path):
    # premise: BASE~NEAR within threshold, FAR outside
    d = _hamming(spark, [BASE, NEAR, FAR])
    assert d[(0, 1)] <= 6 < min(d[(0, 2)], d[(1, 2)])

    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_shgate_" + uuid.uuid4().hex[:12]
    gate = make_simhash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    # batch 0: BASE admitted; its exact copy (id 11) is an in-batch
    # dup (hamming 0) and the smaller id wins
    gate(_batch(spark, [(10, BASE), (11, BASE)]), 0)
    # batch 1: NEAR is a near-dup of the persisted BASE (hamming 4),
    # FAR is new
    gate(_batch(spark, [(20, NEAR), (21, FAR)]), 1)
    # batch 2: exact copy of FAR from the corpus is dropped
    gate(_batch(spark, [(30, FAR)]), 2)
    assert accepted == [[10], [21], []]
    # corpus holds exactly the two survivors' bands (7 bands at
    # max_hamming=6 / hash_bits=60)
    corpus = spark.table(f"{prefix}_bands")
    assert sorted(
        r["key"] for r in corpus.select("key").distinct().collect()
    ) == [10, 21]
    assert corpus.count() == 2 * 7


def test_simhash_gate_accepts_null_text_rows(spark, tmp_path):
    """R16 parity: NULL text must not silently collapse into the
    hamming-0 group of empty documents (_simhash64 folds both to 0 —
    the gate's hash_fn guards NULL to a NULL hash). Every corrupt row
    is accepted and none enters the corpus; empty STRINGS are mutual
    dups by documented semantics (first admitted, rest dropped)."""
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_shgate_" + uuid.uuid4().hex[:12]
    gate = make_simhash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    gate(_batch(spark, [(1, ""), (2, None), (3, None), (4, "")]), 0)
    # both null rows pass; empty strings keep the smallest id
    assert accepted == [[1, 2, 3]]
    # a later null row still passes (the corpus holds only id 1's hash)
    gate(_batch(spark, [(5, None), (6, "")]), 1)
    assert accepted[1] == [5]
    corpus = spark.table(f"{prefix}_bands")
    assert sorted(
        r["key"] for r in corpus.select("key").distinct().collect()
    ) == [1]


def test_simhash_gate_replay_is_noop(spark, tmp_path):
    """A replayed epoch whose marker exists must not re-emit or
    re-append (inherited marker idempotency, pinned here for the text
    instantiation)."""
    accepted = []

    def sink(df, batch_id):
        accepted.append(sorted(r["doc_id"] for r in df.collect()))

    prefix = "akt_shgate_" + uuid.uuid4().hex[:12]
    gate = make_simhash_dedup_gate(
        spark, prefix, str(tmp_path / "markers"), sink
    )
    gate(_batch(spark, [(1, BASE)]), 0)
    gate(_batch(spark, [(1, BASE)]), 0)  # replay of epoch 0
    assert accepted == [[1]]
    assert spark.table(f"{prefix}_bands").count() == 7


GROUPS = [
    # 4 template families x 3 members; per-group suffixes chosen so
    # every in-group pair is hamming <= 6 and every cross-group pair
    # > 10 (the premise is re-verified in-test against _simhash64)
    (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps near the warm fire and the birds sing in the tall "
        "green trees outside",
        ["", " today", " again"],
    ),
    (
        "pack my box with five dozen liquor jugs while the marching "
        "band plays loud brass music under the bright festival "
        "lights all night long",
        ["", " today", " soon"],
    ),
    (
        "a distributed query engine partitions large datasets across "
        "many worker nodes and exchanges intermediate results "
        "through sorted shuffle files",
        ["", " today", " again"],
    ),
    (
        "fresh mountain rivers carry cold clear water down rocky "
        "slopes past pine forests toward quiet villages in the deep "
        "valley below",
        ["", " today", " again"],
    ),
]
TEXTS = {
    g * 3 + m: base + sfx
    for g, (base, sfxs) in enumerate(GROUPS)
    for m, sfx in enumerate(sfxs)
}


def test_simhash_gate_one_representative_per_group_any_batching(
    spark, tmp_path
):
    """PROPERTY (deterministic sweep of arrival orders/splits): for
    any arrival order and micro-batch split, the SimHash gate admits
    EXACTLY ONE member per template clique (groups = doc_id // 3),
    and it is the smallest id within the earliest batch containing
    any member of that group — the same invariant pinned for the
    audio gate, now over the text metric."""
    d = _hamming(spark, [TEXTS[i] for i in range(12)])
    for (a, b), dist in d.items():
        if a // 3 == b // 3:
            assert dist <= 6, (a, b, dist)
        else:
            assert dist > 10, (a, b, dist)

    # a handful of adversarial arrival orders x split points: group
    # members together, spread across batches, reversed ids (larger
    # id arrives in an EARLIER batch than its group-mates)
    scenarios = [
        ([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11], [4, 8]),
        ([11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0], [3, 6, 9]),
        ([2, 5, 8, 11, 1, 4, 7, 10, 0, 3, 6, 9], [4, 8]),
        ([0, 3, 6, 9, 1, 4, 7, 10, 2, 5, 8, 11], [6]),
    ]
    for perm, cuts in scenarios:
        bounds = sorted(cuts) + [12]
        batches, prev = [], 0
        for b in bounds:
            if b > prev:
                batches.append(perm[prev:b])
                prev = b
        accepted: list[int] = []
        prefix = "akt_shgate_" + uuid.uuid4().hex[:12]
        gate = make_simhash_dedup_gate(
            spark,
            prefix,
            str(tmp_path / f"markers_{prefix}"),
            lambda df, bid: accepted.extend(
                r["doc_id"] for r in df.collect()
            ),
        )
        for bid, ids in enumerate(batches):
            gate(_batch(spark, [(i, TEXTS[i]) for i in ids]), bid)
        want = {}
        for ids in batches:
            for g in {i // 3 for i in ids}:
                if g not in want:
                    want[g] = min(i for i in ids if i // 3 == g)
        assert sorted(accepted) == sorted(want.values()), (perm, cuts)
