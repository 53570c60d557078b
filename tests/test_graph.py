"""Connected components / dedup clustering."""

from __future__ import annotations

from iowa_liquor_sales_spark.operators.graph import connected_components, dedup_clusters


def test_components_chain_and_clique(spark):
    # Chain 1-2-3-4, clique {10,11,12}, isolated pair (20,21).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_components_long_path_converges(spark):
    # Path of 12 nodes: needs several propagation rounds (diameter 11,
    # but min-label reaches everything in ceil(log) + linear rounds).
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    comp = connected_components(edges)
    assert comp.filter("component <> 0").count() == 0
    assert comp.count() == n


def test_dedup_clusters_keeper(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 9)], ["doc_a", "doc_b"])
    got = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters(pairs).collect()
    }
    assert got == {(3, 3, True), (7, 3, False), (9, 3, False)}
