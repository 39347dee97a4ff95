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
