"""WordPiece: likelihood-scored merge training + greedy longest-match
encoding (operators/wordpiece.py). Correctness evidence for the
rows-only registry entries q_wordpiece_train / q_wordpiece_encode."""

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.wordpiece import (
    CONT,
    UNK,
    _merge_symbols,
    wordpiece_encode,
    wordpiece_train,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _reference_train(corpus, n_merges, min_count=2):
    """Single-machine replica of the likelihood-merge loop: same
    symbol convention, same score, same tie-break."""
    from collections import Counter

    words = Counter(w for line in corpus for w in line.split())
    state = {
        tuple([w[0]] + [CONT + c for c in w[1:]]): f
        for w, f in words.items()
    }
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for syms, f in state.items():
            for s in syms:
                sc[s] += f
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        cands = [
            (c / (sc[a] * sc[b]), c, a, b)
            for (a, b), c in pc.items()
            if c >= min_count
        ]
        if not cands:
            break
        # score desc, count desc, left asc, right asc
        cands.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
        _, c, a, b = cands[0]
        merges.append((a, b, c))
        merged = _merge_symbols(a, b)
        new_state = {}
        for syms, f in state.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_state[tuple(res)] = new_state.get(tuple(res), 0) + f
        state = new_state
    return merges


def test_train_matches_reference(spark):
    """The distributed merge trajectory equals the single-machine
    replica, merge for merge — likelihood scores, counts, tie-breaks
    and all."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = wordpiece_train(df, "text", n_merges=8)
    ref = _reference_train(CORPUS, 8)
    assert [(a, b, c) for a, b, c, _ in merges] == ref
    # every merged symbol (and the full alphabet) is in the vocab
    for a, b, _, _ in merges:
        assert _merge_symbols(a, b) in vocab
    assert {"l", "##o", "##w"} <= vocab


def test_train_partitioning_independent(spark):
    """Same merges under a different shuffle-partition count — the
    exact-integer counts + deterministic tie-break guarantee."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a, _ = wordpiece_train(df, "text", n_merges=6)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b, _ = wordpiece_train(df, "text", n_merges=6)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_encode_greedy_maximal_munch(spark):
    """Every emitted piece must be the LONGEST vocab match at its
    position (the defining property of the BERT runtime algorithm),
    pieces must all be in-vocab, and stripping ## reconstructs the
    word whenever no UNK was emitted."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    _, vocab = wordpiece_train(df, "text", n_merges=8)
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "new wider lowest")],
        "doc_id long, text string",
    )
    out = wordpiece_encode(docs, vocab, "text", "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    for r in out:
        assert r["n_unk"] == 0, r
    # replicate greedily in-test and compare the sampled pieces
    def greedy(w):
        out, i = [], 0
        while i < len(w):
            pre = CONT if i > 0 else ""
            j = len(w)
            while j > i and pre + w[i:j] not in vocab:
                j -= 1
            assert j > i, (w, i)
            piece = pre + w[i:j]
            # maximal munch: no LONGER match may exist
            for jj in range(len(w), j, -1):
                assert pre + w[i:jj] not in vocab or jj == j
            out.append(piece)
            i = j
        assert "".join(p[len(CONT):] if p.startswith(CONT) else p for p in out) == w
        return out

    want1 = []
    for w in "low lower newest".split():
        want1.extend(greedy(w))
    assert by_id[1]["sample_pieces"] == "|".join(want1[:10])
    assert by_id[1]["n_pieces"] == len(want1)


def test_encode_unk_and_long_word(spark):
    """Characters outside the training alphabet encode as one [UNK]
    per word, as does a word beyond max_word_chars."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    _, vocab = wordpiece_train(df, "text", n_merges=4)
    docs = spark.createDataFrame(
        [(1, "low 你好 " + "x" * 200)], "doc_id long, text string"
    )
    r = wordpiece_encode(docs, vocab, "text", "doc_id").collect()[0]
    assert r["n_words"] == 3
    assert r["n_unk"] == 2
