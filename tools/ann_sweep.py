"""nprobe operating-point sweep for the persisted IVF index
(round-8 verdict task 5): at an amplified corpus (default K=10 ->
5,000 vectors), build the partitioned index once, then measure
recall@5 AND query wall-clock at each nprobe against the exact
brute-force top-5. The output table goes into SCALE.md and justifies
the shipped default (query_ivf_index nprobe=4), which
tests/test_ann_sweep_default.py pins to this rationale.

Usage: python tools/ann_sweep.py [K] [nlist]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk_bruteforce,
    query_ivf_index,
)
from arc_kinesis_tagging_spark.session import get_session


def main() -> None:
    from scale_smoke import amplify_embeddings

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_session("ann-sweep")
    emb = amplify_embeddings(spark, k).persist()
    n = emb.count()
    # 50 queries spread across the id range (one per source vector id
    # block, replica 0)
    q = (
        emb.filter((F.col("vec_id") % k == 0) & (F.col("vec_id") < 50 * k))
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist()
    )
    nq = q.count()

    path = f"/tmp/akt_ann_sweep_k{k}_n{nlist}"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    build_ivf_index(spark, emb, path, nlist=nlist, train="kmeans")
    build_sec = round(time.perf_counter() - t0, 2)

    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk_bruteforce(emb, q, k=5)
        .select("query_id", "vec_id")
        .collect()
    }

    # per-cell sizes for the scanned-fraction metric: local wall-clock
    # at bench scale is fixed-overhead dominated (~2 s), but the cost
    # that scales with the corpus is rows scanned = sum of probed cell
    # sizes, i.e. ~nprobe/nlist of the corpus
    from arc_kinesis_tagging_spark.operators.similarity import _assign_cells

    sizes = {
        r["cell_id"]: r["n"]
        for r in spark.read.parquet(path + "/index")
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    centroids = F.broadcast(
        spark.read.parquet(path + "/centroids").select(
            "cell_id", F.col("embedding").alias("__centroid")
        )
    )

    report = {
        "k": k,
        "n_vectors": n,
        "n_queries": nq,
        "nlist": nlist,
        "build_sec": build_sec,
        "points": [],
    }
    for nprobe in (1, 2, 4, 6, 8, 16, nlist):
        t0 = time.perf_counter()
        got = {
            (r["query_id"], r["vec_id"])
            for r in query_ivf_index(spark, path, q, k=5, nprobe=nprobe)
            .select("query_id", "vec_id")
            .collect()
        }
        dt = round(time.perf_counter() - t0, 2)
        probed = _assign_cells(
            q.select("query_id", F.col("embedding")),
            centroids,
            "query_id",
            "embedding",
            rank_limit=nprobe,
        ).collect()
        per_q: dict = {}
        for r in probed:
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + sizes.get(
                r["cell_id"], 0
            )
        scanned = sum(per_q.values()) / max(1, len(per_q))
        report["points"].append(
            {
                "nprobe": nprobe,
                "recall_at_5": round(len(got & exact) / len(exact), 4),
                "query_sec": dt,
                "scanned_frac": round(scanned / n, 4),
            }
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
