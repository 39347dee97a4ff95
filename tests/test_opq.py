"""Optimized Product Quantization (opq_train / opq_assign /
q_similarity_opq): the properties that make OPQ "optimized" —
an orthogonal rotation whose quantization error never exceeds plain
PQ's — plus the distributed-vs-numpy parity and determinism pins
every rows-only registry entry carries.
"""

import numpy as np
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.similarity import (
    opq_assign,
    opq_train,
    pq_assign,
)
from arc_kinesis_tagging_spark.sources.tables import load_table


def test_opq_rotation_is_orthogonal(spark, sf_dir):
    """The learned R must be a true rotation: R R^T = I to well below
    float noise, and |det R| = 1 (orthogonal, possibly a reflection —
    Procrustes does not constrain the determinant's sign)."""
    e = load_table(spark, "embeddings", sf_dir)
    R, C = opq_train(e, m_subspaces=4, ksub=16)
    d = R.shape[0]
    assert R.shape == (d, d)
    assert np.abs(R @ R.T - np.eye(d)).max() < 1e-9
    assert abs(abs(np.linalg.det(R)) - 1.0) < 1e-9
    assert C.shape == (4, 16, d // 4)


def test_opq_error_never_exceeds_plain_pq(spark, sf_dir):
    """R = I with the same codebook convention is in OPQ's feasible
    set, and each alternation step is non-increasing on the training
    objective — so the corpus-total OPQ reconstruction error must not
    exceed plain PQ's. This is the entire point of the rotation; a
    regression here means the alternation is broken even if every
    other shape check passes."""
    e = load_table(spark, "embeddings", sf_dir)
    pq_err = pq_assign(e, 4, 16).agg(F.sum("err_u6")).collect()[0][0]
    opq_err = opq_assign(e, 4, 16).agg(F.sum("err_u6")).collect()[0][0]
    assert opq_err <= pq_err, (opq_err, pq_err)
    # and the rotation should genuinely help on this corpus, not
    # merely tie (identical error would suggest R silently = I)
    assert opq_err < pq_err, "OPQ made no improvement over PQ"


def test_opq_assign_matches_numpy_replica(spark, sf_dir):
    """Distributed assignment == an independent numpy replica built
    from the SAME trained (R, C): rotate, integer micro-unit
    subspace distances (half-up), lowest-code tie-break."""
    e = load_table(spark, "embeddings", sf_dir)
    R, C = opq_train(e, m_subspaces=4, ksub=16)
    got = {r["vec_id"]: r for r in opq_assign(e, 4, 16).collect()}

    raw = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}
    dsub = C.shape[2]
    for vid, vec in raw.items():
        v = np.array(vec, np.float64) @ R
        err = 0
        for m in range(4):
            s, t = m * dsub, (m + 1) * dsub
            dist = np.floor(
                ((v[s:t] - C[m]) ** 2).sum(axis=1) * 1e6 + 0.5
            ).astype(np.int64)
            code = int(np.argmin(dist))
            assert got[vid][f"code{m}"] == code, (vid, m)
            err += int(dist[code])
        assert got[vid]["err_u6"] == err, vid
    assert set(got) == set(raw)


def test_opq_training_is_deterministic(spark, sf_dir):
    """Two independent trains on the same table produce bit-identical
    R and codebooks — the fixed sample order, deterministic Lloyd
    init, and integer-quantized argmin leave no randomness."""
    e = load_table(spark, "embeddings", sf_dir)
    R1, C1 = opq_train(e, m_subspaces=4, ksub=16)
    R2, C2 = opq_train(e, m_subspaces=4, ksub=16)
    assert np.array_equal(R1, R2)
    assert np.array_equal(C1, C2)


def test_q_similarity_opq_registry_shape(spark, sf_dir):
    """Registry entry: one row per non-null embedding, codes in
    [0, 16), err_u6 >= 0, schema names stable."""
    from arc_kinesis_tagging_spark.plans.llmops import q_similarity_opq

    df = q_similarity_opq(spark, sf_dir)
    assert df.columns == ["vec_id", "code0", "code1", "code2", "code3", "err_u6"]
    rows = df.collect()
    n = (
        load_table(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    assert len(rows) == n
    for r in rows:
        assert all(0 <= r[f"code{m}"] < 16 for m in range(4))
        assert r["err_u6"] >= 0


def test_opq_assign_fixed_rotation_injection(spark, sf_dir):
    """rotation=/codebooks= injection (the q_opq_assign path) must
    skip training and drive the assign kernel with exactly the given
    (R, C): the fixed signed-permutation R is orthogonal and
    subspace-mixing, and the distributed output bit-matches a numpy
    replica of rotate -> blocked micro-unit argmin -> err sum."""
    from arc_kinesis_tagging_spark.plans.llmops import (
        _opq_fixed_rotation,
        q_opq_assign,
    )

    R = _opq_fixed_rotation()
    d = R.shape[0]
    assert np.abs(R @ R.T - np.eye(d)).max() == 0.0  # exactly orthogonal
    # the permutation scatters every source subspace across all four
    # target subspaces (the dimension re-mixing OPQ exists for)
    tgt_sub = {j // 16 for i in range(16) for j in [np.argmax(np.abs(R[i]))]}
    assert tgt_sub == {0, 1, 2, 3}

    got = {
        r["vec_id"]: r for r in q_opq_assign(spark, sf_dir).collect()
    }
    e = load_table(spark, "embeddings", sf_dir)
    rows = e.select("vec_id", "embedding").orderBy("vec_id").collect()
    X16 = np.array(
        [r["embedding"] for r in rows[:16]], np.float64
    ) @ R
    C = np.stack([X16[:, m * 16 : (m + 1) * 16] for m in range(4)])
    for r in rows:
        V = np.asarray(r["embedding"], np.float64) @ R
        err = 0
        for m in range(4):
            diff = V[m * 16 : (m + 1) * 16][None, :] - C[m]
            dist = np.floor(
                (diff * diff).sum(axis=1) * 1e6 + 0.5
            ).astype(np.int64)
            code = int(np.argmin(dist))
            assert got[r["vec_id"]][f"code{m}"] == code, r["vec_id"]
            err += int(dist[code])
        assert got[r["vec_id"]]["err_u6"] == err, r["vec_id"]


def test_tokenizer_fixture_vocabs_keep_edge_semantics(spark):
    """The fixed demonstration vocabularies exist to keep specific
    semantics inside the ORACLE hash surface; pin the properties a
    casual edit would silently lose: WordPiece's vocab must fail
    "query" at position 0 and "key" mid-word (whole-word [UNK]), and
    the unigram table must tie [mer,ge] with [m,er,ge] on "merge"
    (fewer-pieces break) and leave 'q' coverable only by the
    unseen-char floor."""
    from arc_kinesis_tagging_spark.operators.unigram import (
        _UNK_LP_MICRO,
        _viterbi,
    )
    from arc_kinesis_tagging_spark.plans.quality_ops import (
        UNIGRAM_FIXED_VOCAB,
        WP_FIXED_VOCAB,
    )

    wp = set(WP_FIXED_VOCAB)
    assert "q" not in wp and not any(
        p.startswith("q") or p.startswith("##y") for p in wp
    )
    pieces, _ = _viterbi("merge", UNIGRAM_FIXED_VOCAB, 6)
    assert pieces == ["mer", "ge"]  # score tie, fewer-pieces break
    assert (
        UNIGRAM_FIXED_VOCAB["mer"]
        == UNIGRAM_FIXED_VOCAB["m"] + UNIGRAM_FIXED_VOCAB["er"]
    )
    assert not any("q" in p for p in UNIGRAM_FIXED_VOCAB)
    pieces, lp = _viterbi("query", UNIGRAM_FIXED_VOCAB, 6)
    assert pieces[0] == "q" and lp <= _UNK_LP_MICRO  # floor on the path
