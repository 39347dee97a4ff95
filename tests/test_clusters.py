"""Connected components vs a Python union-find model; keep-best dedup
end-to-end over MinHash pairs."""

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.clusters import (
    connected_components,
    connected_components_star,
    dedup_keep_best,
)


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


PAIRS = [
    (1, 2), (2, 3),          # chain cluster {1,2,3}
    (10, 11),                # pair {10,11}
    (20, 21), (21, 22), (20, 22),  # triangle {20,21,22}
    (30, 31), (31, 32), (32, 33), (33, 34),  # long chain {30..34}
]


def test_connected_components_matches_union_find(spark):
    pairs = spark.createDataFrame(PAIRS, "key_a long, key_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    # canonical component = min member, same as min-label propagation
    expected = union_find(PAIRS)
    assert got == expected


def test_star_components_match_union_find(spark):
    pairs = spark.createDataFrame(PAIRS, "key_a long, key_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    assert got == union_find(PAIRS)


def test_star_components_random_graphs_match_model(spark):
    """Deterministic pseudo-random graphs (LCG over node ids) across
    densities; star closure must agree with the union-find model and
    with the min-label path on every one."""
    for seed, n_nodes, n_edges in [(7, 60, 40), (11, 80, 120), (13, 50, 200)]:
        x = seed
        edges = []
        for _ in range(n_edges):
            x = (1103515245 * x + 12345) % (2**31)
            a = x % n_nodes
            x = (1103515245 * x + 12345) % (2**31)
            b = x % n_nodes
            if a != b:
                edges.append((a, b))
        pairs = spark.createDataFrame(edges, "key_a long, key_b long")
        model = union_find(edges)
        star = {
            r["node"]: r["component"]
            for r in connected_components_star(pairs).collect()
        }
        assert star == model, (seed, n_nodes, n_edges)


def test_star_components_string_keys(spark):
    """The reference domain's _id is a string — closure must work on
    string keys (component = lexicographic min)."""
    edges = [("d2", "d1"), ("d2", "d3"), ("x9", "x8")]
    pairs = spark.createDataFrame(edges, "key_a string, key_b string")
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    assert got == union_find(edges)


def test_star_components_path_graph_logarithmic_rounds(spark):
    """The reason this operator exists: a 10k-node path graph has
    diameter 10k, so min-label needs ~10k rounds; star contraction
    must close it in O(log n) — assert <= 16 rounds (2*log2(10k))
    and assert every node lands in the single component."""
    n = 10_000
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "key_a long, key_b long")
    stats = {}
    labels = connected_components_star(pairs, stats=stats).collect()
    assert stats["rounds"] <= 16, stats
    comps = {r["component"] for r in labels}
    assert comps == {0}
    assert len({r["node"] for r in labels}) == n


def test_star_cluster_query_matches_minlabel_query(spark, sf_dir):
    """q_dedup_cluster_star must produce byte-identical survivors and
    cluster labels to q_dedup_cluster — both closures canonicalize to
    the component-min label, so the keep-best selection is the same."""
    from arc_kinesis_tagging_spark.plans.llmops import (
        q_dedup_cluster,
        q_dedup_cluster_star,
    )

    base = {
        (r["doc_id"], r["cluster"], r["n_chars"])
        for r in q_dedup_cluster(spark, sf_dir).collect()
    }
    star = {
        (r["doc_id"], r["cluster"], r["n_chars"])
        for r in q_dedup_cluster_star(spark, sf_dir).collect()
    }
    assert star == base


def test_byte_cap_routes_wide_string_keys_off_the_driver(spark):
    """VERDICT r03 #5: the driver union-find admission must be
    byte-aware, not edge-count-aware. A graph of few edges but very
    wide string keys (200-char URLs) must route to the star path even
    though the edge COUNT is tiny, and still produce union-find-exact
    labels."""
    wide = [(f"url-{'x' * 200}-{a}", f"url-{'x' * 200}-{b}") for a, b in PAIRS]
    pairs = spark.createDataFrame(wide, "key_a string, key_b string")
    stats = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, driver_byte_limit=1_000, stats=stats
        ).collect()
    }
    assert stats["cc_path"] == "star", stats
    assert got == union_find(wide)
    # same graph under the default 64 MB cap stays on the fast driver path
    stats2 = {}
    connected_components(pairs, stats=stats2).collect()
    assert stats2["cc_path"] == "driver", stats2


def test_connected_components_leaves_caller_cache_alone(spark):
    """ADVICE r03: a caller that persisted `pairs` for reuse must not
    have its cache evicted by connected_components' internal
    persist/unpersist discipline."""
    pairs = spark.createDataFrame(PAIRS, "key_a long, key_b long").persist()
    try:
        pairs.count()
        connected_components(pairs).collect()
        lvl = pairs.storageLevel
        assert lvl.useMemory or lvl.useDisk
    finally:
        pairs.unpersist()


def test_star_raises_instead_of_returning_partial_contraction(spark):
    """ADVICE r03: exhausting max_iterations before the edge-multiset
    signature stabilizes must raise, not silently hand back labels from
    a partially contracted graph."""
    import pytest

    edges = [(i, i + 1) for i in range(500)]
    pairs = spark.createDataFrame(edges, "key_a long, key_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(pairs, max_iterations=1).collect()


def test_dedup_keep_best(spark):
    docs = spark.createDataFrame(
        [(i, float(i % 7)) for i in [1, 2, 3, 10, 11, 20, 21, 22, 99]],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "key_a long, key_b long"
    )
    kept = dedup_keep_best(docs, pairs, "doc_id", "quality").collect()
    kept_ids = {r["doc_id"] for r in kept}
    # cluster {1,2,3}: quality 1,2,3 -> keep 3; {10,11}: 3,4 -> keep 11;
    # {20,21,22}: 6,0,1 -> keep 20; singleton 99 kept
    assert kept_ids == {3, 11, 20, 99}
    clusters = {r["doc_id"]: r["cluster"] for r in kept}
    assert clusters[99] is None and clusters[3] == 1 and clusters[20] == 20
