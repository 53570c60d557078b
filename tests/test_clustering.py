"""Deterministic integer-grid k-means."""

from __future__ import annotations

from iowa_liquor_sales_spark.operators.clustering import kmeans_e6


def _two_blobs(spark):
    # two well-separated blobs around (0,0) and (10,10)
    rows = [(i, [0.0 + 0.01 * i, 0.0 - 0.01 * i]) for i in range(10)]
    rows += [(100 + i, [10.0 + 0.01 * i, 10.0 - 0.01 * i]) for i in range(10)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_separates_blobs(spark):
    df = _two_blobs(spark)
    assigned, cents = kmeans_e6(df, "embedding", "vec_id", k=2, iters=2)
    rows = assigned.collect()
    lab = {r["vec_id"]: r["cid"] for r in rows}
    blob_a = {lab[i] for i in range(10)}
    blob_b = {lab[100 + i] for i in range(10)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    assert len(cents) == 2
    # centroids sit on the respective blobs (grid units of 1e-6)
    means = sorted(c[0] for c in cents)
    assert abs(means[0] - 45_000) < 10_000      # ~0.045
    assert abs(means[1] - 10_045_000) < 10_000  # ~10.045


def test_kmeans_is_deterministic_under_repartition(spark):
    df = _two_blobs(spark)
    a1, c1 = kmeans_e6(df, "embedding", "vec_id", k=2, iters=2)
    a2, c2 = kmeans_e6(df.repartition(7), "embedding", "vec_id", k=2, iters=2)
    assert c1 == c2
    assert a1.exceptAll(a2).isEmpty() and a2.exceptAll(a1).isEmpty()


def test_kmeans_drops_empty_clusters(spark):
    # k larger than the number of distinct points: extra clusters lose
    # all members after the first update and must disappear.
    rows = [(i, [1.0, 1.0]) for i in range(3)] + [(10, [5.0, 5.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, cents = kmeans_e6(df, "embedding", "vec_id", k=4, iters=2)
    assert len(cents) <= 2
    assert assigned.count() == 4


def test_kmeans_negative_sum_centroid_truncates_toward_zero(spark):
    """Cross-engine division semantics: Spark's div and DuckDB's
    integral // both truncate toward zero; Python's // floors. A
    centroid update over a negative coordinate sum must truncate, or
    the chained-CTE oracle diverges (-7 div 2 is -3, not -4)."""
    from iowa_liquor_sales_spark.operators.clustering import kmeans_e6

    # one obvious cluster around (-3.5e-6 mean): vectors quantize to
    # [-3, -4] on the e6 grid -> sum -7 over n=2 -> centroid -3 (trunc)
    df = spark.createDataFrame(
        [(0, [-3e-6, 10.0]), (1, [-4e-6, 10.0])],
        ["vec_id", "embedding"],
    )
    _, cents = kmeans_e6(df, "embedding", "vec_id", k=1, iters=1)
    assert cents[0][0] == -3  # floor would give -4
    assert cents[0][1] == 10_000_000
