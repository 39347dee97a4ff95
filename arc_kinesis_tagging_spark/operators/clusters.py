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
    driver_edge_limit: int = 2_000_000,
    driver_byte_limit: int = 64 << 20,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node key of the connected cluster.

    Size-adaptive: the candidate-pair graph is tiny relative to the
    corpus (it holds only suspected duplicates), and iterative label
    propagation pays full scheduler overhead PER ROUND even on a
    500-node graph. Below ``driver_edge_limit`` edges AND
    ``driver_byte_limit`` total key bytes the graph is collected and
    closed with a driver-side union-find — one job, exact same
    (node, min-key component) result. The byte cap matters for string
    keys: 2M edges of 200-char URLs is ~800 MB of raw keys (several GB
    as Python objects), far past what an edge COUNT admits. Above the
    byte cap the graph routes to ``connected_components_star`` (bounded
    O(log n) rounds at any diameter); above only the edge count it runs
    distributed min-label propagation as before. The sizing aggregate
    that picks the path is metadata-cheap next to either branch.
    ``stats['cc_path']`` reports the chosen branch when a dict is given.
    """
    # The pairs subtree appears TWICE in the symmetrized edge union;
    # without a persist the upstream candidate-pair pipeline (MinHash
    # explode + band join — the expensive part) executes twice when
    # edges first materializes. Persist pairs for exactly that window —
    # unless the CALLER already persisted it, in which case evicting
    # their cache on the way out would be a side effect they never
    # asked for (ADVICE r03).
    lvl = pairs.storageLevel
    we_persisted = not (lvl.useMemory or lvl.useDisk)
    if we_persisted:
        pairs = pairs.persist()
    edges = (
        pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
        .unionByName(pairs.select(F.col(key_b).alias("src"), F.col(key_a).alias("dst")))
        .distinct()
        .persist()
    )
    # one job sizes the graph in both dimensions (row count + key bytes)
    size_row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.octet_length(F.col("src").cast("string"))
            + F.octet_length(F.col("dst").cast("string"))
        ).alias("key_bytes"),
    ).collect()[0]
    n_edges, key_bytes = size_row["n"], size_row["key_bytes"] or 0
    if we_persisted:
        pairs.unpersist()
    if key_bytes > driver_byte_limit:
        if stats is not None:
            stats["cc_path"] = "star"
        try:
            # edges is persisted and star's first localCheckpoint is
            # eager, so the symmetrized graph is read once from cache
            return connected_components_star(edges, "src", "dst")
        finally:
            edges.unpersist()
    if n_edges <= driver_edge_limit:
        if stats is not None:
            stats["cc_path"] = "driver"
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN key so the root IS the component label,
                # matching the propagation path's min-label semantics
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(n, find(n)) for n in parent]
        key_type = pairs.schema[key_a].dataType
        spark = pairs.sparkSession
        edges.unpersist()
        from pyspark.sql.types import StructField, StructType

        return spark.createDataFrame(
            out,
            StructType(
                [StructField("node", key_type), StructField("component", key_type)]
            ),
        )
    if stats is not None:
        stats["cc_path"] = "minlabel"
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
    # Convergence check: ONE aggregation per round over a numeric
    # surrogate of the label multiset — sum(xxhash64(component)) changes
    # whenever any label changes (collision of two full label-multiset
    # sums is vanishingly unlikely) and works for ANY key type. A plain
    # sum(component) would silently be NULL for string keys (the
    # reference domain's _id IS a string), making every round compare
    # None == None and exit after one propagation with wrong components.
    def _label_sum(lbl: DataFrame):
        # decimal accumulator: ANSI mode makes a long sum of 64-bit
        # hashes overflow-error; decimal(38,0) absorbs any node count.
        return lbl.agg(
            F.sum(
                F.xxhash64(F.col("component").cast("string")).cast("decimal(38,0)")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    prev_sum = _label_sum(labels)

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
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iterations: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the closure to use when the candidate graph exceeds the driver
    union-find limit AND may contain adversarially long chains, where
    min-label propagation needs diameter rounds. Star rounds contract
    the graph toward component-min stars in O(log^2 n) rounds worst
    case, O(log n) in practice (a 10k-node path closes in ~7 rounds —
    tests/test_clusters.py).

    Per round: large-star connects every strictly-larger neighbor of u
    to min(Gamma(u) u {u}); small-star orients edges large->small and
    connects the smaller neighborhood (plus u) to its min. Each star is
    one groupBy-min + one join — two shuffles/round — with
    ``localCheckpoint`` truncating lineage (same discipline as the
    min-label path). Convergence = edge-multiset hash-sum stable.
    ``stats['rounds']`` reports rounds when a dict is passed.
    """
    E = (
        pairs.select(F.col(key_a).alias("u"), F.col(key_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(e: DataFrame):
        # decimal accumulator over a 64-bit hash of the edge — stable
        # across engines/orderings; same rationale as _label_sum above
        return e.agg(
            F.sum(
                F.xxhash64(
                    F.col("u").cast("string"), F.col("v").cast("string")
                ).cast("decimal(38,0)")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    prev = _sig(E)
    rounds = 0
    converged = False
    for _ in range(max_iterations):
        # -- large-star: (v, m(u)) for every neighbor v > u ------------
        sym = E.unionByName(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
        )
        E = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # -- small-star: orient big->small, attach Gamma- u {u} to min -
        oriented = E.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))  # m < u
        E = (
            oriented.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds += 1
        sig = _sig(E)
        if sig == prev:
            converged = True
            break
        prev = sig
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        # A partially contracted edge set is NOT a labeling — returning
        # it would hand dedup_keep_best wrong clusters with no error.
        # Star contraction halves component diameter per round, so 40
        # rounds covers any graph this engine can hold; reaching here
        # means the input violates that bound and must be surfaced.
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_iterations} rounds; raise max_iterations"
        )
    # Converged: every edge is (node, component-min). Roots label
    # themselves; size-1 components never appear in `pairs` by contract
    # (same as connected_components).
    labels = E.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        labels.select(F.col("component").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return labels.unionByName(roots)


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    score_col: str,
    cc_fn=None,
) -> DataFrame:
    """Drop near-duplicates, keeping the best-scoring row per cluster
    (ties break toward the lower key). Rows in no cluster are kept.

    Returns ``df`` filtered to representatives, plus a ``cluster``
    column (null for singletons). ``cc_fn`` picks the closure strategy
    (default size-adaptive min-label ``connected_components``; pass
    ``connected_components_star`` for adversarial-diameter graphs).
    """
    from pyspark.sql import Window

    comps = (cc_fn or connected_components)(pairs).withColumnRenamed("node", key_col)
    # Singletons (the overwhelming majority of a deduped corpus) are
    # split off BEFORE the window: a single window over a left join
    # would put every non-clustered row into one `component IS NULL`
    # partition — a single-task straggler at corpus scale. The anti
    # join keeps them out of the shuffle entirely.
    singletons = df.join(comps, key_col, "left_anti").withColumn(
        "cluster", F.lit(None).cast(dict(comps.dtypes)["component"])
    )
    clustered = df.join(comps, key_col, "inner")
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(key_col).asc()
    )
    winners = (
        clustered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("component", "cluster")
    )
    return winners.unionByName(singletons.select(*winners.columns))
