"""Python UDF surface: every Python kernel agrees with its JVM twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.functions.udfs import (
    SplitSentences,
    l2_norm_py,
    register_udfs,
)
from iowa_liquor_sales_spark.functions.vectors import l2_norm
from iowa_liquor_sales_spark.schemas import read_table

SF = "/root/testdata/sf0.001"


def test_pandas_udf_matches_expression_twin(spark):
    emb = read_table(spark, SF, "embeddings")
    both = emb.select(
        "vec_id",
        F.round(l2_norm_py("embedding"), 9).alias("py"),
        F.round(l2_norm("embedding"), 9).alias("jvm"),
    )
    assert both.filter(F.col("py") != F.col("jvm")).count() == 0


def test_udtf_splits_sentences(spark):
    df = spark.createDataFrame(
        [("a b. c d e. ",), ("",), ("nosplit",)], ["text"]
    )
    out = df.lateralJoin(
        SplitSentences(F.col("text").outer())
    ).select("sent_id", "sentence", "n_words")
    rows = {(r["sent_id"], r["sentence"], r["n_words"]) for r in out.collect()}
    assert rows == {(0, "a b", 2), (1, "c d e", 3), (0, "nosplit", 1)}


def test_udtf_sql_registration(spark):
    register_udfs(spark)
    got = spark.sql(
        "SELECT s.sentence, s.n_words "
        "FROM split_sentences('x y. z') AS s ORDER BY s.sent_id"
    ).collect()
    assert [(r["sentence"], r["n_words"]) for r in got] == [("x y", 2), ("z", 1)]
    norm = spark.sql(
        "SELECT l2_norm_py(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n"
    ).head()["n"]
    assert abs(norm - 5.0) < 1e-12
