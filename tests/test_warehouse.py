"""S9/S10: catalog DDL + full-table load (reference src/load.py:22-66)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.schemas import TESTDATA_SCHEMAS, read_table
from iowa_liquor_sales_spark.sources.warehouse import create_table, full_load

SF = "/root/testdata/sf0.001"


def test_create_table_idempotent(spark):
    create_table(spark, "tw_nation", TESTDATA_SCHEMAS["nation"])
    create_table(spark, "tw_nation", TESTDATA_SCHEMAS["nation"])  # IF NOT EXISTS
    assert spark.catalog.tableExists("tw_nation")
    assert [f.name for f in spark.table("tw_nation").schema.fields] == [
        "n_nationkey",
        "n_name",
        "n_regionkey",
    ]
    spark.sql("DROP TABLE tw_nation")


def test_full_load_and_idempotent_rerun(spark):
    src = read_table(spark, SF, "customer")
    n = full_load(src, "tw_customer")
    assert n == src.count()
    # Re-run (reference's retry semantics): overwrite keeps it exact.
    n2 = full_load(src, "tw_customer")
    assert n2 == n
    assert spark.table("tw_customer").count() == n
    spark.sql("DROP TABLE tw_customer")


def test_partitioned_load_prunes(spark):
    src = read_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    full_load(src, "tw_orders", partition_by=["order_year"])
    q = spark.table("tw_orders").filter(F.col("order_year") == 1996)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # Partition pruning: the year predicate never touches row data.
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert q.count() > 0
    spark.sql("DROP TABLE tw_orders")


def test_overwrite_partitions_incremental(spark):
    from iowa_liquor_sales_spark.sources.warehouse import overwrite_partitions

    src = read_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    full_load(src, "tw_inc", partition_by=["order_year"])
    before = spark.table("tw_inc").count()
    # Reload ONLY 1996 with a modified measure; other years untouched.
    updated = src.filter(F.col("order_year") == 1996).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000000.0
    )
    n = overwrite_partitions(updated, "tw_inc")
    assert n == updated.count()
    t = spark.table("tw_inc")
    assert t.count() == before  # same totals: one partition swapped
    assert t.filter("order_year = 1996 AND o_totalprice < 1000000").count() == 0
    assert t.filter("order_year <> 1996 AND o_totalprice >= 1000000").count() == 0
    spark.sql("DROP TABLE tw_inc")


def test_compact_small_files(spark, tmp_path):
    from iowa_liquor_sales_spark.sources.warehouse import compact

    path = str(tmp_path / "frag")
    src = read_table(spark, SF, "lineitem")
    src.repartition(40).write.parquet(path)  # fragment into 40 files
    before, after = compact(spark, path, target_records_per_file=10_000)
    assert before == 40
    assert after == 1  # 6k rows fit one file
    got = spark.read.parquet(path)
    assert got.count() == src.count()
    # Content preserved exactly.
    assert got.exceptAll(src).count() == 0 and src.exceptAll(got).count() == 0


def test_bucketed_join_no_shuffle(spark):
    from iowa_liquor_sales_spark.sources.warehouse import bucketize

    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    bucketize(li, "tb_li", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    bucketize(o, "tb_o", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("tb_li")
        b = spark.table("tb_o")
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        # Co-located buckets: the join plans with ZERO shuffles.
        assert "Exchange" not in plan
        # Same join without bucketing shuffles both sides.
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE tb_li")
        spark.sql("DROP TABLE tb_o")
