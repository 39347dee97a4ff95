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


def test_ivf_kmeans_training_balances_cells(spark, sf_dir, tmp_path):
    """train="kmeans" must produce a working index whose recall@5 is at
    least the sample-seeded index's, with a more even cell population
    (lower max/mean imbalance) — the property that bounds worst-case
    probe cost at scale."""
    from arc_kinesis_tagging_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_bruteforce,
        query_ivf_index,
    )
    from arc_kinesis_tagging_spark.sources.tables import load_table

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk_bruteforce(e, q, k=5).collect()
    }

    recalls, imbalance = {}, {}
    for train in ("sample", "kmeans"):
        path = str(tmp_path / f"ivf-{train}")
        build_ivf_index(spark, e, path, nlist=8, train=train)
        got = {
            (r["query_id"], r["vec_id"])
            for r in query_ivf_index(spark, path, q, k=5, nprobe=4).collect()
        }
        recalls[train] = len(got & exact) / len(exact)
        sizes = [
            r["n"]
            for r in spark.read.parquet(path + "/index")
            .groupBy("cell_id").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        imbalance[train] = max(sizes) / (sum(sizes) / len(sizes))
    assert recalls["kmeans"] >= recalls["sample"] - 1e-9, (recalls, imbalance)
    assert recalls["kmeans"] >= 0.8, recalls
    assert imbalance["kmeans"] <= imbalance["sample"] + 1e-9, imbalance
