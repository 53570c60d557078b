

def test_label_centroids_exact_grid(spark):
    from iowa_liquor_sales_spark.operators.similarity import label_centroids_e6

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.5]),
            (1, [3.0, 0.5]),
            (2, [0.000001, 0.0]),
        ],
        ["label", "embedding"],
    )
    got = {
        (r["label"], r["pos"]): (r["sum_e6"], r["n"])
        for r in label_centroids_e6(df, "embedding", "label").collect()
    }
    # floor(x*1e6 + 0.5): 1.0 -> 1_000_000, -2.5 -> -2_500_000, ...
    assert got[(1, 0)] == (4_000_000, 2)
    assert got[(1, 1)] == (-2_000_000, 2)  # -2.5e6 + 0.5e6
    assert got[(2, 0)] == (1, 1)
    assert got[(2, 1)] == (0, 1)
    # centroid mean = sum_e6 / (n * 1e6)
    assert got[(1, 0)][0] / (got[(1, 0)][1] * 1e6) == 2.0
