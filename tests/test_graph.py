"""PageRank (operators/graph.py): numeric parity against a numpy
power-iteration model, mass conservation, dangling-node handling, and
the analytic two-node fixpoint."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.graph import pagerank
from arc_kinesis_tagging_spark.plans.quality_ops import q_graph_pagerank
from arc_kinesis_tagging_spark.sources.tables import load_table


def _np_pagerank(edge_list, iterations, damping=0.85):
    """Reference model with the exact same semantics as the operator:
    parallel edges act as weights; dangling mass redistributed
    uniformly; fixed iteration count."""
    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edge_list:
        deg[idx[s]] += 1
    a = np.zeros((n, n))
    for s, d in edge_list:
        a[idx[d], idx[s]] += 1.0 / deg[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (a @ r + dangling / n)
    return {node: r[i] for node, i in idx.items()}


def test_pagerank_matches_numpy_model(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).limit(500)
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=6).collect()}
    want = _np_pagerank(
        [(r["src"], r["dst"]) for r in edges.collect()], iterations=6
    )
    assert set(got) == set(want)
    for node, w in want.items():
        assert got[node] == pytest.approx(w, abs=1e-9), node


def test_pagerank_mass_conserved_with_dangling(spark):
    # b and c are dangling (no out-edges): their mass must be
    # redistributed, keeping the total at 1.0
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "a")], "src string, dst string"
    )
    ranks = pagerank(edges, iterations=12)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_two_node_fixpoint(spark):
    """a→b with damping 0.85: the 2-node chain where b also dangles.
    Verify against the numpy model run to near-fixpoint, and that b
    (the sink that also receives a's rank) outranks a."""
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=30).collect()}
    want = _np_pagerank([("a", "b")], iterations=30)
    assert got["a"] == pytest.approx(want["a"], abs=1e-12)
    assert got["b"] == pytest.approx(want["b"], abs=1e-12)
    assert got["b"] > got["a"]


def test_pagerank_query_partitioning_independent(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = [tuple(r) for r in q_graph_pagerank(spark, sf_dir).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = [tuple(r) for r in q_graph_pagerank(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_triangle_enumeration_hand_graph(spark):
    """K4 plus a pendant edge and reversed/duplicate inputs: K4 yields
    exactly its four triangles, each enumerated once in canonical
    order; the pendant vertex joins none."""
    from arc_kinesis_tagging_spark.operators.graph import triangle_enumeration

    edges = spark.createDataFrame(
        # K4 on {1,2,3,4} with mixed orientations + dup, pendant 5
        [(1, 2), (2, 1), (1, 3), (1, 4), (3, 2), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    got = sorted(
        (r["va"], r["vb"], r["vc"])
        for r in triangle_enumeration(edges).collect()
    )
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]
