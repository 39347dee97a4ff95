"""Iterative graph ranking: PageRank as a DataFrame loop.

Why an analytics engine for training corpora needs this: once dedup
has clustered near-duplicates (operators/clusters.py), picking the
CANONICAL document per cluster — and, more broadly, weighting sources
by how central they are in a citation/link/co-occurrence graph — is a
ranking problem over a graph, and PageRank is its standard answer.
The reference has no graph surface at all (SURVEY §2.B); this extends
the engine the same way the dedup/similarity operators do.

The Spark shape (what survives 100 TB):

- one iteration = one equi-join (edges ⋈ ranks on src) + one
  partial+final aggregation (sum of contributions per dst). Both
  shuffle on node keys — the same keys every round, so AQE reuses the
  partitioning decision and nothing grows with iteration count except
  the LINEAGE;
- lineage is the killer in iterative DataFrame code: each round's plan
  contains every previous round. ``localCheckpoint(eager=True)`` every
  round truncates the plan so analysis/optimization time stays
  constant — identical to the connected-components discipline
  (operators/clusters.py), the pattern this repo uses for every loop;
- dangling nodes (no out-edges) would leak rank mass; their mass is
  summed per round (a metadata-cheap 1-row aggregate, same cost class
  as the CC convergence count) and redistributed uniformly — the
  standard Google-matrix correction;
- determinism: contributions are double sums, so merge order wobbles
  the last ulps. Ranks are rounded only at OUTPUT (6 dp), which
  absorbs the wobble; the partitioning-independence test asserts it.

Iterations are fixed (default 10), not convergence-tested: a fixed
power-iteration count is deterministic, embarrassingly checkpointable,
and in practice within the rounding tolerance of the fixpoint for the
damping used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges``; ranks sum
    to ~1.0. Directed edges; parallel edges count once per occurrence
    (i.e. edge multiplicity acts as weight).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # driver scalar: sizes the uniform terms, metadata-cheap
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges annotated with the sender's degree, fixed across iterations
    ed = e.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # rank mass sitting on dangling nodes (no out-edges) this round
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # truncate lineage every round
        )
    return ranks


def triangle_enumeration(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Enumerate all triangles in an undirected graph — the motif
    behind clustering-coefficient and community diagnostics over
    co-occurrence graphs (which documents/users cluster together after
    dedup).

    The classic two-join shape with the degree-free ordering trick:
    canonicalize every edge to (lo, hi) with lo < hi and keep the set
    distinct; then triangles are exactly the paths lo<mid<hi where
    (lo,mid), (mid,hi), (lo,hi) are all edges — each triangle is
    produced ONCE, no post-hoc dedup of 6 permutations. Both joins are
    keyed shuffles on a vertex; at scale the standard refinement is to
    orient edges by degree (low-degree vertex first) so the join fan-out
    on hub vertices collapses — noted here, not needed at test sizes.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
    )
    e1 = canon.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = canon.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    paths = e1.join(e2, "b")
    closing = canon.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    return (
        paths.join(closing, ["a", "c"], "left_semi")
        .select(F.col("a").alias("va"), F.col("b").alias("vb"), F.col("c").alias("vc"))
    )
