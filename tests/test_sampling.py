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


def test_weighted_sample_rate_determinism_and_nesting(spark):
    from iowa_liquor_sales_spark.operators.sampling import weighted_sample

    df = spark.range(4000).withColumnRenamed("id", "k")
    half = weighted_sample(df, "k", F.lit(0.5))
    n_half = half.count()
    assert 1800 < n_half < 2200  # ~Binomial(4000, 0.5), generous bounds
    # deterministic under repartition/rerun
    again = weighted_sample(df.repartition(9), "k", F.lit(0.5))
    assert half.exceptAll(again).isEmpty()
    # nested: everything kept at 0.3 is also kept at 0.5
    low = weighted_sample(df, "k", F.lit(0.3))
    assert low.exceptAll(half).isEmpty()
    # degenerate probabilities
    assert weighted_sample(df, "k", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "k", F.lit(1.0)).count() == 4000


def test_pack_sequences_budget_and_determinism(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.sampling import pack_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 10).alias("toks")
    )
    out = pack_sequences(df, "toks", "doc_id", budget=100, shards=4)
    rows = out.collect()
    assert len(rows) == 200
    # every doc's start offset falls inside its sequence's budget window
    for r in rows:
        assert r["seq"] * 100 <= r["start_tok"] < (r["seq"] + 1) * 100
    # sequences are contiguous from 0 within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], set()).add(r["seq"])
    for seqs in by_shard.values():
        assert seqs == set(range(max(seqs) + 1))
    # layout survives repartitioning
    again = pack_sequences(df.repartition(13), "toks", "doc_id", budget=100, shards=4)
    assert out.exceptAll(again).isEmpty()


def test_kfold_loo_complement_identity(spark):
    from iowa_liquor_sales_spark.operators.sampling import (
        kfold_loo_aggregates,
    )

    rows = [(i, 100 * (i % 9 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "cents"])
    out = kfold_loo_aggregates(df, "id", "cents", k=4).collect()
    assert len(out) == 4
    assert sum(r["n_holdout"] for r in out) == 200
    # train side of each fold == exact mean of the complement rows
    by_fold = {}
    import hashlib

    for i, cents in rows:
        h = int(hashlib.md5(f"fold{i}".encode()).hexdigest()[:15], 16) % 4
        by_fold.setdefault(h, []).append(cents)
    for r in out:
        rest = [c for f, cs in by_fold.items() if f != r["fold"]
                for c in cs]
        want = round(10.0 * sum(rest) / len(rest))
        assert r["train_mean_mc"] == want


def test_weighted_topk_sample_favors_heavy_rows(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.sampling import weighted_topk_sample

    rows = [(i, 1_000_000 if i <= 2 else 1) for i in range(1, 51)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_topk_sample(df, "doc_id", F.col("w"), k=10)
    ids = {r["doc_id"] for r in got.collect()}
    assert len(ids) == 10
    # weight 1e6 rows: ln(u)/w ~ 0 -> practically guaranteed in the top-k
    assert {1, 2} <= ids
    # deterministic: identical sample on re-run
    ids2 = {r["doc_id"] for r in weighted_topk_sample(df, "doc_id", F.col("w"), k=10).collect()}
    assert ids == ids2


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Transitive near-dup chains must land in ONE split (the whole
    point); singletons split by their own id, identically to a plain
    hash_split of the same key."""
    from iowa_liquor_sales_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], ["doc_id"]
    )
    # chain 3~7~11 (transitive: 3 and 11 never matched directly) plus
    # the pair 20~21; everyone else is a singleton
    pairs = spark.createDataFrame(
        [(3, 7), (7, 11), (20, 21)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 40
    assert (
        out[3]["cluster_id"] == out[7]["cluster_id"] == out[11]["cluster_id"] == 3
    )
    assert out[3]["split"] == out[7]["split"] == out[11]["split"]
    assert out[20]["cluster_id"] == out[21]["cluster_id"] == 20
    assert out[20]["split"] == out[21]["split"]
    # singleton assignment == plain hash_split on its own id
    singles = hash_split(
        docs.filter("doc_id NOT IN (3, 7, 11, 20, 21)"), "doc_id"
    ).collect()
    for r in singles:
        assert out[r["doc_id"]]["cluster_id"] == r["doc_id"]
        assert out[r["doc_id"]]["split"] == r["split"]



def test_stratified_kfold_balances_within_every_stratum(spark):
    from iowa_liquor_sales_spark.operators.sampling import stratified_kfold

    # wildly imbalanced strata: 97 / 11 / 3 rows
    rows = (
        [(i, "big") for i in range(97)]
        + [(100 + i, "mid") for i in range(11)]
        + [(200 + i, "rare") for i in range(3)]
    )
    out = stratified_kfold(
        spark.createDataFrame(rows, ["k", "s"]), ["s"], "k", n_folds=5
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["s"], {}).setdefault(r["fold"], 0)
        by[r["s"]][r["fold"]] += 1
    # within every stratum, fold sizes differ by at most 1
    for s, folds in by.items():
        sizes = [folds.get(f, 0) for f in range(5)]
        assert max(sizes) - min(sizes) <= 1, (s, sizes)
    # rare stratum's 3 rows land in 3 DIFFERENT folds — the guarantee
    # plain hash bucketing cannot make
    assert sorted(by["rare"].values()) == [1, 1, 1]
    # deterministic under repartitioning
    out2 = stratified_kfold(
        spark.createDataFrame(rows, ["k", "s"]).repartition(7),
        ["s"], "k", n_folds=5,
    ).collect()
    assert {(r["k"], r["fold"]) for r in out} == {
        (r["k"], r["fold"]) for r in out2
    }


def test_weighted_choice_deterministic_and_proportional(spark):
    from iowa_liquor_sales_spark.operators.sampling import weighted_choice

    import hashlib

    weights = spark.createDataFrame(
        [("a", 70), ("b", 20), ("c", 10)], ["item", "w"]
    )
    draws = spark.createDataFrame(
        [(i, s) for i in range(500) for s in range(3)], ["k", "slot"]
    )
    out = weighted_choice(
        draws, weights, ["k", "slot"], "item", "w"
    ).collect()
    assert len(out) == 1500  # exactly one item per draw
    # python replication of the hash -> interval pick
    intervals = {"a": (0, 70), "b": (70, 90), "c": (90, 100)}
    for r in out:
        h = int(
            hashlib.md5(f"choice_{r['k']}_{r['slot']}".encode())
            .hexdigest()[:15], 16,
        ) % 100
        lo, hi = intervals[r["item"]]
        assert lo <= h < hi
    # frequencies track the weights (md5 is uniform enough at n=1500)
    freq = {}
    for r in out:
        freq[r["item"]] = freq.get(r["item"], 0) + 1
    assert 0.6 < freq["a"] / 1500 < 0.8
    assert 0.05 < freq["c"] / 1500 < 0.15
    # re-running draws the identical assignment
    out2 = weighted_choice(
        draws.repartition(11), weights, ["k", "slot"], "item", "w"
    ).collect()
    assert {(r["k"], r["slot"], r["item"]) for r in out} == {
        (r["k"], r["slot"], r["item"]) for r in out2
    }


def test_weighted_choice_renamed_item_column(spark):
    # regression: the cumulative window must order the RENAMED item
    # column, not the caller's original column name
    from iowa_liquor_sales_spark.operators.sampling import weighted_choice

    weights = spark.createDataFrame(
        [("x", 1), ("y", 1)], ["src_name", "wt"]
    )
    draws = spark.createDataFrame([(1,), (2,)], ["k"])
    out = weighted_choice(
        draws, weights, ["k"], "src_name", "wt"
    ).collect()
    assert len(out) == 2 and all(r["item"] in ("x", "y") for r in out)
