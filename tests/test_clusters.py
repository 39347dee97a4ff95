"""Connected components vs a Python union-find model; keep-best dedup
end-to-end over MinHash pairs."""

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.clusters import (
    connected_components,
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
