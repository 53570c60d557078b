"""Deterministic splits and stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.operators.sampling import hash_split, stratified_sample


def test_hash_split_partitions_and_is_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = hash_split(df, "k")
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # roughly proportional (md5 is uniform; 2000 rows, generous bounds)
    assert counts["train"] > 1400 and counts["val"] < 400 and counts["test"] < 400
    # identical assignment on re-run and after repartition
    b = hash_split(df.repartition(7), "k")
    assert a.select("k", "split").exceptAll(b.select("k", "split")).isEmpty()


def test_hash_split_partial_weights_drop_remainder(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    out = hash_split(df, "k", weights={"eval": 0.1})
    n_eval = out.filter("split = 'eval'").count()
    assert 20 < n_eval < 90
    assert out.filter("split IS NULL").count() == 500 - n_eval


def test_stratified_sample_fixed_n(spark):
    rows = [(g, i) for g in ["a", "b"] for i in range(20)] + [("tiny", 0)]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = stratified_sample(df, ["g"], "k", n=5)
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 5, "b": 5, "tiny": 1}
    # deterministic pick
    again = stratified_sample(df, ["g"], "k", n=5)
    assert out.drop("sample_rank").exceptAll(again.drop("sample_rank")).isEmpty()


def test_stratified_sample_fraction_exact_ceil(spark):
    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(3)]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = stratified_sample(df, ["g"], "k", fraction=0.5)
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 5, "b": 2}  # ceil(0.5*10)=5, ceil(0.5*3)=2


def test_stratified_sample_arg_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k").withColumn("g", F.lit("x"))
    try:
        stratified_sample(df, ["g"], "k")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")
