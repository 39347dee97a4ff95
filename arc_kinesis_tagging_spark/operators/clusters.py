"""Near-duplicate clustering: connected components over candidate
pairs, and cluster-representative selection ("keep best").

Dedup at corpus scale is three stages: (1) candidate pairs (MinHash/
SimHash, operators/dedup.py), (2) transitive closure of the pairs into
clusters — THIS module, (3) keep one representative per cluster
(highest quality / lowest key) and drop the rest.

Connected components here is min-label propagation: each node starts
labeled with itself; every iteration each node takes the min label of
itself and its neighbors; converged when no label changes. Iterations
are bounded by graph diameter — near-dup graphs are overwhelmingly
tiny cliques/chains, so 3-6 rounds close them. Each round is one
shuffle (join + groupBy-min) and the label table is persisted per
round with the previous round unpersisted. For adversarial
long-chain graphs use the large-star/small-star algorithm
(Kiveris et al.) — same DataFrame building blocks, fewer rounds; not
needed for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node key of the connected cluster."""
    edges = (
        pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
        .unionByName(pairs.select(F.col(key_b).alias("src"), F.col(key_a).alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint (eager) rather than persist: iterative algorithms
    # must TRUNCATE the logical plan every round, not just cache the
    # physical result — otherwise Catalyst re-analyzes a plan that
    # doubles per iteration and analysis time grows exponentially with
    # graph diameter (a 10-round chain took minutes with persist()).
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence check: min-label propagation only ever DECREASES
    # labels, so sum(component) is strictly monotone until fixpoint —
    # an O(n) aggregation per round instead of a join + count.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("neighbor_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    score_col: str,
) -> DataFrame:
    """Drop near-duplicates, keeping the best-scoring row per cluster
    (ties break toward the lower key). Rows in no cluster are kept.

    Returns ``df`` filtered to representatives, plus a ``cluster``
    column (null for singletons).
    """
    from pyspark.sql import Window

    comps = connected_components(pairs)
    clustered = df.join(
        comps.withColumnRenamed("node", key_col), key_col, "left"
    )
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(key_col).asc()
    )
    ranked = clustered.withColumn(
        "__rn",
        F.when(F.col("component").isNull(), F.lit(1)).otherwise(F.row_number().over(w)),
    )
    return (
        ranked.filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("component", "cluster")
    )
