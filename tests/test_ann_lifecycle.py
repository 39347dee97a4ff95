"""ann_lifecycle: the composed OPQ-rotate -> persisted IVF build ->
append -> drift retrain -> ADC+refine serve chain (the round-7 verdict
task: the four single-step registry rows never proved the COMPOSITION —
retrained books actually served, rotation actually inside the index
geometry). Correctness evidence for the rows-only registry entry
q_ann_lifecycle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.similarity import (
    ann_lifecycle,
    cosine_topk_bruteforce,
)
from arc_kinesis_tagging_spark.sources.tables import load_table

K = 5


def _run(spark, sf_dir, tmp_path, name, **kw):
    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_lifecycle(
        spark,
        e,
        F.col("vec_id") % 5 == 0,
        str(tmp_path / name),
        q,
        k=K,
        nlist=8,
        m_subspaces=8,
        ksub=16,
        nprobe=6,
        shortlist=64,
        drift_num=1,
        drift_den=1,
        **kw,
    )


def test_lifecycle_recall_vs_bruteforce(spark, sf_dir, tmp_path):
    """Recall@5 of the served chain vs UNROTATED exact brute force
    (valid comparison: the OPQ rotation is orthogonal, so rotated
    cosines equal original cosines) must hold >= 0.9 after the append
    and the retrain — the round-7 verdict bar."""
    got = _run(spark, sf_dir, tmp_path, "idx").collect()
    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = cosine_topk_bruteforce(e, q, k=K).collect()
    t = {}
    g = {}
    for r in truth:
        t.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in got:
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(t) == set(g)
    hits = sum(len(t[qid] & g[qid]) for qid in t)
    recall = hits / (len(t) * K)
    assert recall >= 0.9, (recall, {q_: sorted(t[q_] - g[q_]) for q_ in t})


def test_lifecycle_exercises_both_drift_branches(spark, sf_dir, tmp_path):
    """With the 1:1 drift threshold on the homogeneous synthetic
    corpus, some cells drift and some do not — both the retrained and
    the frozen codebook paths must be live, and the served results
    must reflect the split (the composition property the single-step
    rows could not test)."""
    res, acct = _run(
        spark, sf_dir, tmp_path, "idx2", return_accounting=True
    )
    arows = acct.collect()
    drifted = {r["cell_id"] for r in arows if r["drifted"]}
    frozen = {r["cell_id"] for r in arows if not r["drifted"]}
    assert drifted and frozen, arows
    served = res.collect()
    for r in served:
        want = "new" if r["cell_id"] in drifted else "old"
        assert r["served_book"] == want, r
    assert {r["served_book"] for r in served} == {"old", "new"}


def test_lifecycle_rerun_identical(spark, sf_dir, tmp_path):
    """The chain is deterministic end to end (fixed OPQ sample,
    micro-unit distances, quantized ties) AND the persisted index is
    reused, so a rerun against the same path returns identical rows."""
    a = sorted(map(tuple, _run(spark, sf_dir, tmp_path, "idx3").collect()))
    b = sorted(map(tuple, _run(spark, sf_dir, tmp_path, "idx3").collect()))
    assert a == b
    assert len(a) == 8 * K


def test_lifecycle_query_scan_prunes_partitions(spark, sf_dir, tmp_path):
    """The serve path must reach the persisted index through a
    partition-pruned scan: the probe-cell IN-list shows up as a
    PartitionFilter on the index FileScan, never a full-index read."""
    df = _run(spark, sf_dir, tmp_path, "idx4")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*cell_id[^\]]*)\]", plan)
    assert m, plan
