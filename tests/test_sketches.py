"""KMV distinct sketch and Count-Min frequency sketch: accuracy,
exact-small-domain path, mergeability, never-underestimate guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.operators.sketches import (
    countmin_counters,
    countmin_lookup,
    countmin_merge,
    kmv_distinct_estimate,
    kmv_kmins,
    kmv_union_estimate,
)
from iowa_liquor_sales_spark.schemas import read_table

SF = "/root/testdata/sf0.001"


def test_kmv_accuracy(spark):
    li = read_table(spark, SF, "lineitem")
    key = F.concat_ws("-", "l_orderkey", "l_linenumber")
    exact = li.select(key.alias("k")).distinct().count()
    est = kmv_distinct_estimate(li, key, k=256).head()["est_distinct"]
    assert abs(est - exact) / exact < 0.2  # ~6% expected at k=256


def test_kmv_exact_when_domain_small(spark):
    n = read_table(spark, SF, "nation")
    est = kmv_distinct_estimate(n, "n_nationkey", k=256).head()["est_distinct"]
    assert est == 25.0  # fewer distincts than k -> sketch is exact


def test_kmv_union_merge(spark):
    """Union estimate from two sketches alone tracks the true union."""
    o = read_table(spark, SF, "orders")
    lo = o.filter("o_orderkey % 2 = 0")
    hi = o.filter("o_orderkey % 3 = 0")  # overlaps lo on multiples of 6
    sk_lo = kmv_kmins(lo, "o_orderkey", k=256)
    sk_hi = kmv_kmins(hi, "o_orderkey", k=256)
    est = kmv_union_estimate(sk_lo, sk_hi, k=256).head()["est_distinct"]
    exact = lo.select("o_orderkey").union(hi.select("o_orderkey")).distinct().count()
    assert abs(est - exact) / exact < 0.2


def test_countmin_never_underestimates(spark):
    """CM guarantee: est(k) >= true count for every key; and with
    width >> distinct keys the estimates are near-exact."""
    li = read_table(spark, SF, "lineitem")
    counters = countmin_counters(li, "l_suppkey", depth=4, width=256)
    est = countmin_lookup(counters, li, "l_suppkey", depth=4, width=256)
    exact = li.groupBy(F.col("l_suppkey").cast("string").alias("k")).count()
    joined = est.join(exact, "k").collect()
    assert len(joined) == exact.count()
    for row in joined:
        assert row["est"] >= row["count"]
    # 10 suppliers vs 1024 cells: collisions are rare -> most are exact
    n_exact = sum(1 for r in joined if r["est"] == r["count"])
    assert n_exact >= len(joined) // 2


def test_countmin_total_mass(spark):
    """Each depth row holds every input exactly once."""
    li = read_table(spark, SF, "lineitem")
    n = li.count()
    counters = countmin_counters(li, "l_suppkey", depth=4, width=256)
    per_depth = counters.groupBy("depth").agg(F.sum("cnt").alias("mass")).collect()
    assert len(per_depth) == 4
    assert all(r["mass"] == n for r in per_depth)


def test_countmin_merge_equals_full_build(spark):
    """Summing counter tables of disjoint halves == one full build —
    the mergeability that serves incremental day-over-day sketches."""
    li = read_table(spark, SF, "lineitem")
    lo = li.filter("l_orderkey % 2 = 0")
    hi = li.filter("l_orderkey % 2 = 1")
    merged = countmin_merge(
        countmin_counters(lo, "l_suppkey"), countmin_counters(hi, "l_suppkey")
    )
    full = countmin_counters(li, "l_suppkey")
    assert merged.exceptAll(full).isEmpty() and full.exceptAll(merged).isEmpty()


def test_grid_quantiles_exact_on_known_data(spark):
    from iowa_liquor_sales_spark.operators.sketches import grid_quantiles

    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    got = {r["q"]: r["bucket"] for r in grid_quantiles(df, "x").collect()}
    # cum*100 >= q*total with unit buckets over 1..100 -> bucket == q
    assert got == {50: 50, 90: 90, 99: 99}


def test_grid_quantiles_histogram_merges(spark):
    """Histogram state of disjoint halves sums to the full histogram,
    so the final quantiles agree — the mergeable-sketch contract."""
    from iowa_liquor_sales_spark.operators.sketches import grid_quantiles

    o = read_table(spark, SF, "orders")
    full = {r["q"]: r["bucket"] for r in grid_quantiles(o, "o_totalprice").collect()}
    merged_input = o.filter("o_orderkey % 2 = 0").unionByName(
        o.filter("o_orderkey % 2 = 1")
    )
    merged = {
        r["q"]: r["bucket"]
        for r in grid_quantiles(merged_input, "o_totalprice").collect()
    }
    assert full == merged


def test_bloom_no_false_negatives_and_prunes(spark):
    from iowa_liquor_sales_spark.operators.joins import (
        bloom_build,
        bloom_prefilter,
    )

    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders").filter("o_orderpriority = '1-URGENT'")
    words = bloom_build(o, "o_orderkey")
    pre = bloom_prefilter(li, "l_orderkey", words)
    truth = li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
    # no false negatives: every truly-matching row survives the prefilter
    assert truth.exceptAll(pre.select(*li.columns)).isEmpty()
    # and the filter actually prunes (false positives stay rare)
    n_all, n_pre, n_true = li.count(), pre.count(), truth.count()
    assert n_pre < n_all
    assert (n_pre - n_true) <= 0.05 * n_all


def test_hll_estimate_within_error_and_mergeable(spark):
    from iowa_liquor_sales_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    li = read_table(spark, SF, "lineitem")
    est = hll_estimate(li, "l_orderkey", p=8).collect()[0]["est_distinct"]
    exact = li.select("l_orderkey").distinct().count()
    # raw HLL stderr ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - exact) <= 0.2 * exact
    # registers merge: max-per-bucket over split inputs == whole input
    whole = {
        r["bucket"]: r["rho"]
        for r in hll_registers(li, "l_orderkey", p=8).collect()
    }
    evens = hll_registers(li.filter("l_orderkey % 2 = 0"), "l_orderkey", p=8)
    odds = hll_registers(li.filter("l_orderkey % 2 = 1"), "l_orderkey", p=8)
    merged_df = (
        evens.unionByName(odds).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    merged = {r["bucket"]: r["rho"] for r in merged_df.collect()}
    assert merged == whole


def test_hll_overlap_tracks_true_intersection(spark):
    from iowa_liquor_sales_spark.operators.sketches import hll_overlap

    # |A|=2000, |B|=2000, |A∩B|=1000 (keys 1000..1999 shared).
    a = spark.range(0, 2000).selectExpr("id AS k")
    b = spark.range(1000, 3000).selectExpr("id AS k")
    row = hll_overlap(a, "k", b, "k", p=8).first()
    # raw-HLL stderr ~6.5% at p=8 per term; give the composed estimate 3x.
    assert abs(row["est_a_micro"] / 1e6 - 2000) / 2000 < 0.2
    assert abs(row["est_union_micro"] / 1e6 - 3000) / 3000 < 0.2
    assert abs(row["est_intersect_micro"] / 1e6 - 1000) / 1000 < 0.55
    # inclusion-exclusion holds up to the independent output floors
    assert (
        abs(
            row["est_intersect_micro"]
            - (row["est_a_micro"] + row["est_b_micro"] - row["est_union_micro"])
        )
        <= 2
    )


def test_hll_overlap_disjoint_and_identical(spark):
    from iowa_liquor_sales_spark.operators.sketches import hll_overlap

    a = spark.range(0, 1500).selectExpr("id AS k")
    b = spark.range(5000, 6500).selectExpr("id AS k")
    row = hll_overlap(a, "k", b, "k", p=8).first()
    # Disjoint sets: intersection estimate must sit near zero relative
    # to the set sizes (inclusion-exclusion noise only).
    assert abs(row["est_intersect_micro"] / 1e6) < 0.25 * 1500
    same = hll_overlap(a, "k", a, "k", p=8).first()
    # Identical sets: union register table == each side's, so the
    # estimate identity est_intersect == est_a holds EXACTLY.
    assert same["est_union_micro"] == same["est_a_micro"]
    assert same["est_intersect_micro"] == same["est_a_micro"]


def test_countmin_join_size_upper_bounds_true_size(spark):
    from iowa_liquor_sales_spark.operators.sketches import countmin_join_size

    # A: keys 0..99 once each; B: key 0 x50, keys 1..9 x5 each, 10..99 once.
    a = spark.range(0, 100).selectExpr("id AS k")
    b = (
        spark.range(0, 50).selectExpr("0 AS k")
        .union(spark.range(0, 45).selectExpr("1 + CAST(id / 5 AS LONG) AS k"))
        .union(spark.range(10, 100).selectExpr("id AS k"))
    )
    true_size = a.join(b, "k").count()
    est = countmin_join_size(a, "k", b, "k", depth=4, width=1024).first()[
        "est_join_size"
    ]
    assert est >= true_size            # CM inner product never undershoots
    assert est <= true_size + 100 * b.count() // 1024 + 20  # collision slack


def test_hll_sliding_tracks_exact_trailing_distinct(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.sketches import (
        hll_sliding_distinct,
    )

    # 20 days, day d has users [d*50, d*50+300): trailing-7-day exact
    # distinct is 600 for interior days — n/m ~ 9, inside the raw
    # estimator's valid range (the operator documents no small-range
    # correction). p=6: ~13% stderr; assert within 35% (~2.7 sigma, and
    # the hash is deterministic so this never flakes).
    rows = [(d, d * 50 + u) for d in range(20) for u in range(300)]
    df = spark.createDataFrame(rows, ["day", "user_id"])
    out = {
        r["day"]: r["est_distinct"]
        for r in hll_sliding_distinct(
            df, "day", F.col("user_id"), window_days=7, p=6
        ).collect()
    }
    assert len(out) == 20
    for d in range(6, 20):
        exact = len({dd * 50 + u for dd in range(d - 6, d + 1)
                     for u in range(300)})
        assert abs(out[d] - exact) / exact < 0.35, (d, out[d], exact)
    # the window genuinely merges days: estimate well above one day's 300
    assert out[19] > 380


def test_ams_f2_exact_arithmetic_and_reasonable_error(spark):
    from iowa_liquor_sales_spark.operators.sketches import ams_f2

    import hashlib

    rows = [(f"k{i % 40}",) for i in range(1000)]
    got = ams_f2(
        spark.createDataFrame(rows, ["x"]), "x", n_estimators=9
    ).collect()[0]
    # exact F2: 40 keys x 25 each -> 40 * 625
    assert got["f2_exact"] == 40 * 625
    # python replication of the md5-parity estimator
    ests = []
    for i in range(9):
        z = 0
        for (x,) in rows:
            h = int(hashlib.md5(f"{i}|{x}".encode()).hexdigest()[:15], 16)
            z += 1 - 2 * (h % 2)
        ests.append(z * z)
    assert got["f2_est"] == sorted(ests)[4]
    # median-of-9 AMS keeps the estimate within a small factor
    assert got["err_ppm"] < 3_000_000
