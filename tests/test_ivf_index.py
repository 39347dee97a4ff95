"""Persisted IVF index: build partitioned by cell, query with partition
pruning, recall vs brute force."""

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk_bruteforce,
    query_ivf_index,
)
from arc_kinesis_tagging_spark.sources.tables import load_table


def test_ivf_index_build_query_prune(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, path, nlist=8)

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = query_ivf_index(spark, path, q, k=5, nprobe=3)

    # recall vs brute force
    brute = cosine_topk_bruteforce(emb, q, k=5)
    b = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    i = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    assert len(b & i) / len(b) >= 0.5
    for qid in range(10):
        assert (qid, qid) in i  # own vector always found

    # partition pruning: only probe-cell directories are read
    probe_dirs = {
        f"cell_id={r['cell_id']}"
        for r in spark.read.parquet(path + "/centroids").collect()
    }
    files = (
        spark.read.parquet(path + "/index")
        .filter(F.col("cell_id").isin([1, 2]))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    assert files and all(("cell_id=1" in r["f"]) or ("cell_id=2" in r["f"]) for r in files)
