"""KMV distinct sketch: accuracy, exact-small-domain path, mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.operators.sketches import (
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
