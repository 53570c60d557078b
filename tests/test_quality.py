

def test_dp_noisy_counts_deterministic_and_centered(spark):
    from iowa_liquor_sales_spark.operators.quality import dp_noisy_counts

    df = spark.createDataFrame(
        [(g, i) for g in ["a", "b", "c", "d"] for i in range(50)],
        ["grp", "x"],
    )
    out1 = {r["grp"]: r for r in dp_noisy_counts(df, ["grp"]).collect()}
    out2 = {r["grp"]: r for r in dp_noisy_counts(df, ["grp"]).collect()}
    assert out1.keys() == out2.keys() == {"a", "b", "c", "d"}
    for g in out1:
        assert out1[g]["n"] == 50
        # deterministic noise stream (the documented testability trade)
        assert out1[g]["noisy_count_e6"] == out2[g]["noisy_count_e6"]
        # Laplace(1) noise: |noise| beyond 15 (~e^-15 tail) means a bug
        noise = out1[g]["noisy_count_e6"] - 50_000_000
        assert abs(noise) < 15_000_000 and noise != 0
    # different keys draw different noise
    noises = {out1[g]["noisy_count_e6"] - 50_000_000 for g in out1}
    assert len(noises) > 1


def test_bucket_checksum_diff_locates_drift(spark):
    from iowa_liquor_sales_spark.operators.quality import bucket_checksum_diff

    rows = [(i, f"v{i}") for i in range(200)]
    a = spark.createDataFrame(rows, ["k", "v"])
    # drop one row and mutate another: only their buckets may surface
    b = spark.createDataFrame(
        [(k, ("MUT" if k == 7 else v)) for k, v in rows if k != 150],
        ["k", "v"],
    )
    same = bucket_checksum_diff(a, a, "k", ["k", "v"], n_buckets=16)
    assert same.count() == 0
    diff = bucket_checksum_diff(a, b, "k", ["k", "v"], n_buckets=16).collect()
    assert 1 <= len(diff) <= 2  # the buckets holding keys 7 and 150
    for r in diff:
        assert (r["checksum_a"] != r["checksum_b"]) or (
            r["n_rows_a"] != r["n_rows_b"]
        )


def test_bh_fdr_step_up_rescues_interior_hypothesis(spark):
    """The classic BH signature: p_(2) individually exceeds 2*alpha/m but
    p_(3) <= 3*alpha/m, so the step-up rejects ALL of ranks 1..3 —
    a per-rank filter would wrongly keep only ranks 1 and 3."""
    from iowa_liquor_sales_spark.operators.quality import bh_fdr

    rows = [("a", 10_000), ("b", 60_000), ("c", 70_000), ("d", 900_000)]
    df = spark.createDataFrame(rows, ["test_id", "p_ppm"])
    got = {
        r["id"]: (r["rnk"], r["reject"])
        for r in bh_fdr(df, "test_id", alpha_ppm=100_000).collect()
    }
    # m=4, thresholds i*25000: 10000<=25000 T, 60000<=50000 F,
    # 70000<=75000 T -> cutoff 3
    assert got == {
        "a": (1, True),
        "b": (2, True),
        "c": (3, True),
        "d": (4, False),
    }

    # no p-value under alpha/m -> nothing rejects
    null = spark.createDataFrame(
        [("x", 500_000), ("y", 800_000)], ["test_id", "p_ppm"]
    )
    assert all(
        not r["reject"]
        for r in bh_fdr(null, "test_id", alpha_ppm=100_000).collect()
    )
