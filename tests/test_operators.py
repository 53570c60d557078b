"""Unit-level operator behavior not covered by the oracle-parity sweep:
plan-shape assertions (broadcasts, pushdown, partial aggregation) and
edge-case semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.operators.aggregates import topk_per_group
from iowa_liquor_sales_spark.operators.dedup import (
    dedup_rank,
    minhash_signatures,
    shingles,
)
from iowa_liquor_sales_spark.operators.joins import fk_violations, star_join
from iowa_liquor_sales_spark.operators.similarity import rh_component
from iowa_liquor_sales_spark.schemas import read_table

SF = "/root/testdata/sf0.001"


def test_shingles_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x")], ["doc_id", "text"]
    )
    got = shingles(df, "text", "doc_id", n=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    # doc 1: two 3-shingles; docs 2/3 shorter than n: no rows (and no
    # descending-sequence corruption).
    assert by_doc == {1: {"a b c", "b c d"}}


def test_minhash_signature_stability(spark):
    df = spark.createDataFrame(
        [(1, "w x y z q"), (2, "w x y z q"), (3, "totally different text here")],
        ["doc_id", "text"],
    )
    sig = minhash_signatures(shingles(df, "text", "doc_id"), num_hashes=8)
    rows = {r["doc_id"]: [r[f"sig_{i}"] for i in range(8)] for r in sig.collect()}
    assert rows[1] == rows[2]  # identical text → identical signature
    assert rows[1] != rows[3]


def test_dedup_rank_deterministic_winner(spark):
    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("j", 9, "z")],
        ["key", "ord", "val"],
    )
    got = {
        (r["key"], r["val"])
        for r in dedup_rank(df, ["key"], ["ord"]).collect()
    }
    assert got == {("k", "a"), ("j", "z")}


def test_topk_requires_total_order(spark):
    df = spark.createDataFrame(
        [("g", i % 3, i) for i in range(9)], ["g", "score", "id"]
    )
    top = topk_per_group(df, ["g"], [F.col("score").desc(), F.col("id")], 4)
    ids = [r["id"] for r in top.orderBy("rnk").collect()]
    assert ids == [2, 5, 8, 1]  # score 2,2,2 then first score-1 by id


def test_star_join_broadcasts_dims(spark):
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    c = read_table(spark, SF, "customer")
    joined = star_join(
        li,
        [
            (o, F.col("l_orderkey") == F.col("o_orderkey")),
            (c, F.col("o_custkey") == F.col("c_custkey")),
        ],
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # Every dim side must be a broadcast hash join — zero fact shuffles.
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_parquet(spark):
    li = read_table(spark, SF, "lineitem").filter(F.col("l_orderkey") == 42).select(
        "l_orderkey", "l_quantity"
    )
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    # Column pruning: only the two selected columns are read.
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_fk_violation_broadcast_anti_join(spark):
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    v = fk_violations(li, o, "l_orderkey", "o_orderkey")
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert v.count() == 0


def test_rh_component_deterministic():
    assert rh_component(0, 0) == rh_component(0, 0)
    grid = [rh_component(j, k) for j in range(4) for k in range(16)]
    assert set(grid) == {1.0, -1.0}  # both signs occur


def test_zorder_interleaves_bits_exactly(spark):
    from iowa_liquor_sales_spark.operators.layout import zorder_value

    df = spark.createDataFrame(
        [(3, 1), (0, 0), (1, 0), (0, 1), (65535, 65535)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["zv"]
        for r in df.select(
            "x", "y", zorder_value("x", "y").alias("zv")
        ).collect()
    }
    # x bits land on odd positions, y bits on even: (3,1) -> 0b1011 = 11
    assert out[(3, 1)] == 0b1011
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 2
    assert out[(0, 1)] == 1
    assert out[(65535, 65535)] == (1 << 32) - 1


def test_minhash_est_tracks_true_jaccard(spark):
    """Signature-agreement estimate must correlate with exact Jaccard:
    identical docs estimate 1.0; the estimate is within the standard
    MinHash error band (~1/sqrt(32) ~ 0.18) of exact for candidates."""
    from iowa_liquor_sales_spark.operators.dedup import (
        jaccard_pairs,
        minhash_jaccard_est,
        shingles,
    )

    rows = [
        (1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        (2, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),          # identical to 1
        (3, "w0 w1 w2 w3 w4 w5 w6 w7 zz yy"),          # near-dup of 1
        (4, "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9"),          # unrelated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    est = {
        (r["doc_a"], r["doc_b"]): r["est_ppm"]
        for r in minhash_jaccard_est(df, "text", "doc_id", n=3).collect()
    }
    assert est[(1, 2)] == 1_000_000
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(
            shingles(df, "text", "doc_id", n=3), min_jaccard=0.0, max_df=None
        ).collect()
    }
    for pair, ppm in est.items():
        if pair in exact:
            assert abs(ppm / 1e6 - exact[pair]) < 0.25


def test_dedup_normalized_collapses_variants(spark):
    from iowa_liquor_sales_spark.operators.dedup import dedup_normalized

    docs = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO  WORLD."),
            (4, "goodbye world"),
        ],
        ["doc_id", "text"],
    )
    out = dedup_normalized(docs, "text", "doc_id").collect()
    by_keeper = {r["keeper_id"]: r["n_dups"] for r in out}
    assert by_keeper == {1: 3, 4: 1}


def test_minhash_lsh_cross_sides_only(spark):
    from iowa_liquor_sales_spark.operators.dedup import minhash_lsh_cross

    base = "the quick brown fox jumps over the lazy dog again and again"
    left = spark.createDataFrame(
        [(0, base), (2, "completely unrelated words in this one document")],
        ["doc_id", "text"],
    )
    right = spark.createDataFrame(
        # 1 = near-identical to 0 (one word changed); 3 = exact copy of 2's
        # LEFT-side sibling is absent, so no intra-side pair may leak.
        [(1, base.replace("dog", "cat")), (3, base)],
        ["doc_id", "text"],
    )
    rows = minhash_lsh_cross(
        left, right, "text", "doc_id", min_jaccard=0.5
    ).collect()
    pairs = {(r["left_id"], r["right_id"]) for r in rows}
    # 0 matches both 1 and 3; all results are (even-left, odd-right).
    assert (0, 1) in pairs and (0, 3) in pairs
    assert all(left % 2 == 0 and right % 2 == 1 for left, right in pairs)
    assert all(r["jaccard"] >= 0.5 for r in rows)


def test_global_row_number_matches_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.ranking import global_row_number

    df = spark.range(0, 997).select(
        (F.col("id") * 7919 % 997).alias("k"), F.col("id").alias("payload")
    )
    out = global_row_number(df, ["k"], out_col="rn", num_partitions=8)
    expected = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))
    )
    assert out.count() == 997
    diff = out.join(expected, ["k", "payload"]).filter(
        out["rn"] != expected["rn"]
    )
    assert diff.count() == 0
    # ranks are a permutation of 1..n (no gaps/dups across partitions)
    assert out.agg(F.min("rn"), F.max("rn"), F.countDistinct("rn")).first() == (
        1,
        997,
        997,
    )


def test_skyline_2d_semantics(spark):
    from iowa_liquor_sales_spark.operators.aggregates import skyline_2d

    rows = [
        # group g: (3,5) dominates (2,4) and (3,4); (1,9) survives on y;
        # duplicate maxima (3,5)x2 both survive (neither strictly better).
        ("g", 3, 5.0),
        ("g", 3, 5.0),
        ("g", 2, 4.0),
        ("g", 3, 4.0),
        ("g", 1, 9.0),
        # group h: single row always survives.
        ("h", 0, 0.0),
    ]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = sorted(
        (r["grp"], r["x"], r["y"]) for r in skyline_2d(df, "grp", "x", "y").collect()
    )
    assert out == [
        ("g", 1, 9.0),
        ("g", 3, 5.0),
        ("g", 3, 5.0),
        ("h", 0, 0.0),
    ]


def test_simhash_pairs_find_planted_neardup(spark):
    from iowa_liquor_sales_spark.operators.dedup import simhash_hamming_pairs

    # ~40 distinct words so a one-word edit moves few of the 60 bits
    # (each flip needs a zero vote margin); unrelated text sits near the
    # random-fingerprint expectation of ~30 bits away.
    base = " ".join(f"word{i:02d}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, " ".join(f"other{i:02d}" for i in range(40))),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_hamming_pairs(
            docs, "text", "doc_id", max_hamming=20
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 20
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_sorted_neighborhood_bounded_candidates(spark):
    from iowa_liquor_sales_spark.operators.dedup import sorted_neighborhood_pairs

    # 30 docs sharing one hot prefix would be 435 all-pairs candidates;
    # sorted-neighborhood with w=2 emits at most N*w pairs by construction
    # — the no-hot-bucket guarantee LSH bands can't make.
    # Prefix kept short so the distinguishing digits land INSIDE the
    # 24-char blocking key ("shared prefix 07" = 16 chars) — the tight
    # max_edit cap below then exercises a real nonzero edit distance.
    docs = spark.createDataFrame(
        [(i, f"shared prefix {i:02d}") for i in range(30)],
        ["doc_id", "text"],
    )
    pairs = sorted_neighborhood_pairs(
        docs, "text", "doc_id", window=2, max_edit=64
    )
    n = pairs.count()
    assert 0 < n <= 30 * 2
    # Adjacent ids differ by one digit pair -> tiny edit distance survives
    # a tight cap; the planted near-identical neighbours are found.
    tight = sorted_neighborhood_pairs(docs, "text", "doc_id", window=2, max_edit=2)
    rows = tight.collect()
    assert len(rows) > 0
    # The cap is exercised by real nonzero distances, not identical keys.
    assert max(r.edit_distance for r in rows) > 0


def test_ppjoin_observation_counters(spark):
    # The 100-TB fallback gauge: allpairs_jaccard populates Observation
    # metrics for candidate and survivor counts, piggybacked on the
    # action (no extra job). Candidates >= survivors always; here two
    # near-identical docs plus one disjoint doc give survivors < candidates.
    from iowa_liquor_sales_spark.operators.dedup import (
        allpairs_jaccard,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "entirely different words share quick nothing here"),
        ],
        ["doc_id", "text"],
    )
    sh = shingles(docs, "text", "doc_id", n=2)
    obs: dict = {}
    pairs = allpairs_jaccard(sh, min_jaccard=0.5, observations=obs)
    n_out = pairs.count()
    cand = obs["candidates"].get["n_candidates"]
    surv = obs["survivors"].get["n_survivors"]
    assert surv == n_out == 1
    assert cand >= surv
    assert cand >= 1


def test_theta_anotb_exact_small_domains(spark):
    # Domains smaller than k: every hash is retained (theta = 2^60), so
    # the "estimate" is the exact set-difference cardinality.
    from iowa_liquor_sales_spark.operators.sketches import (
        kmv_kmins,
        theta_anotb_estimate,
    )

    a = spark.range(0, 100).select(F.col("id"))
    b = spark.range(60, 200).select(F.col("id"))
    est = theta_anotb_estimate(
        kmv_kmins(a, "id", k=512), kmv_kmins(b, "id", k=512), k=512
    ).collect()[0]["est_anotb"]
    assert est == 60.0  # |{0..59}|


def test_theta_anotb_disjoint_and_subset(spark):
    from iowa_liquor_sales_spark.operators.sketches import (
        kmv_kmins,
        theta_anotb_estimate,
    )

    a = spark.range(0, 50)
    assert (
        theta_anotb_estimate(
            kmv_kmins(a, "id", 64), kmv_kmins(a, "id", 64), k=64
        ).collect()[0]["est_anotb"]
        == 0.0
    )  # A \ A = empty
    b = spark.range(1000, 1050)
    assert (
        theta_anotb_estimate(
            kmv_kmins(a, "id", 64), kmv_kmins(b, "id", 64), k=64
        ).collect()[0]["est_anotb"]
        == 50.0
    )  # disjoint: everything survives


def test_theta_anotb_sampled_estimate_in_band(spark):
    # Domains exceed k: theta < 2^60 and the scaled estimate should land
    # within the standard KMV error band (~1/sqrt(k)) of the truth.
    from iowa_liquor_sales_spark.operators.sketches import (
        kmv_kmins,
        theta_anotb_estimate,
    )

    k = 256
    a = spark.range(0, 4000)
    b = spark.range(2000, 6000)
    est = theta_anotb_estimate(
        kmv_kmins(a, "id", k), kmv_kmins(b, "id", k), k=k
    ).collect()[0]["est_anotb"]
    assert abs(est - 2000) / 2000 < 4 / (k ** 0.5)


def test_merge_intervals_chains_and_gaps(spark):
    from iowa_liquor_sales_spark.operators.temporal import merge_intervals

    rows = [
        # key 1: [0,10] overlaps [5,15]; [14,20] touches-within; gap; [30,40]
        (1, 0, 10), (1, 5, 15), (1, 14, 20), (1, 30, 40),
        # key 2: chain where a LATER start sits inside an EARLIER long
        # interval ([0,100] swallows [10,20] and [50,60])
        (2, 0, 100), (2, 10, 20), (2, 50, 60),
    ]
    df = spark.createDataFrame(rows, "key_id long, s long, e long")
    got = {
        (r["key"], r["merge_start"], r["merge_end"]): (
            r["n_merged"],
            r["covered_secs"],
        )
        for r in merge_intervals(df, "key_id", "s", "e").collect()
    }
    assert got == {
        (1, 0, 20): (3, 20),
        (1, 30, 40): (1, 10),
        (2, 0, 100): (3, 100),
    }


def test_naive_bayes_ppm_exact(spark):
    from iowa_liquor_sales_spark.operators.text import naive_bayes_token_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam ham", "a"),
            (1, "spam eggs", "a"),
            (2, "ham ham ham", "b"),
        ],
        ["doc_id", "text", "source"],
    )
    rows = naive_bayes_token_stats(
        docs, class_col="source", text_col="text", top_n=2
    ).collect()
    by = {(r["source"], r["word"]): r for r in rows}
    # class a: tokens spam=3 eggs=1 ham=1 (top2: spam, eggs—wait ham ties eggs,
    # tie breaks alphabetically: eggs before ham). totals: a=5, vocab=3.
    r = by[("a", "spam")]
    assert r["cnt"] == 3 and r["rnk"] == 1
    assert r["likelihood_ppm"] == (3 + 1) * 1_000_000 // (5 + 3)
    assert r["prior_ppm"] == 2 * 1_000_000 // 3
    assert by[("a", "eggs")]["rnk"] == 2
    r = by[("b", "ham")]
    assert r["likelihood_ppm"] == (3 + 1) * 1_000_000 // (3 + 3)
    assert r["prior_ppm"] == 1 * 1_000_000 // 3


def test_interval_join_matches_theta_join(spark):
    from iowa_liquor_sales_spark.operators.temporal import interval_join

    left = spark.createDataFrame(
        [
            (1, 10, 0, 100),     # overlaps r20 [50,150] and r21 [100,110]
            (1, 11, 200, 300),   # overlaps nothing for key 1
            (2, 12, 0, 50),      # key isolation: must not meet key 1 rows
        ],
        "k long, event_id_x long, start_s long, end_s long",
    )
    right = spark.createDataFrame(
        [
            (1, 20, 50, 150),
            (1, 21, 100, 110),   # touches left 10 exactly at 100
            (1, 22, 301, 400),   # gap of 1 after left 11 — no match
            (2, 23, 40, 60),
        ],
        "k long, event_id_x long, start_s long, end_s long",
    )
    got = {
        (r["k"], r["event_id_x_a"], r["event_id_x_b"]): r["overlap_secs"]
        for r in interval_join(left, right, key="k", bucket_secs=30).collect()
    }
    # Bucketed plan result == naive theta-join truth, incl. boundary touch.
    assert got == {(1, 10, 20): 50, (1, 10, 21): 0, (2, 12, 23): 10}


def test_interval_join_no_duplicate_pairs(spark):
    from iowa_liquor_sales_spark.operators.temporal import interval_join

    # One long interval spans MANY buckets of the other — the pair meets
    # in every shared bucket and must still come out exactly once.
    left = spark.createDataFrame(
        [(1, 1, 0, 10_000)], "k long, iid long, start_s long, end_s long"
    )
    right = spark.createDataFrame(
        [(1, 2, 5_000, 9_000)], "k long, iid long, start_s long, end_s long"
    )
    rows = interval_join(left, right, key="k", bucket_secs=100).collect()
    assert len(rows) == 1 and rows[0]["overlap_secs"] == 4_000


def test_label_propagation_two_communities(spark):
    from iowa_liquor_sales_spark.operators.graph import label_propagation

    # Two 4-cliques joined by ONE bridge edge: frequency voting keeps the
    # cliques in separate communities (connected_components would merge
    # them — the operators genuinely differ on this graph).
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        clique1 + clique2 + [(3, 10)], ["src", "dst"]
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert len({labels[n] for n in range(4)}) == 1
    assert len({labels[n] for n in range(10, 14)}) == 1
    assert labels[0] != labels[13]


def test_sparse_cosine_exact_scores(spark):
    from iowa_liquor_sales_spark.operators.text import sparse_cosine_pairs

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),   # tf: apple 2, banana 1 -> norm2 5
            (1, "apple banana banana"),  # tf: apple 1, banana 2 -> norm2 5
            (2, "cherry date elderberry fig"),
        ],
        ["doc_id", "text"],
    )
    rows = sparse_cosine_pairs(
        docs, min_cos2_ppm=0, max_df_frac=1.0
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): (r["dot"], r["cos2_ppm"]) for r in rows}
    # dot(0,1) = 2*1 + 1*2 = 4; cos² = 16/25 -> 640000 ppm exactly.
    assert got == {(0, 1): (4, 640_000)}


def test_compression_ratio_pins_zlib_bytes(spark):
    # q_compression_ratio's partial oracle covers doc_id/raw_len exactly
    # and the zlib outputs only as an in-bounds invariant; this pin
    # carries the exact byte counts — zlib level-6 output for a fixed
    # input is a stable, versioned format, so they are asserted here.
    import zlib

    from iowa_liquor_sales_spark.operators.curation import compression_ratio

    texts = [
        (0, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),       # highly compressible
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),                                        # raw_len 0 guard
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for doc_id, text in texts:
        raw = text.encode("utf-8")
        assert got[doc_id]["raw_len"] == len(raw)
        assert got[doc_id]["comp_len"] == len(zlib.compress(raw, 6))
        assert got[doc_id]["ratio_ppm"] == len(zlib.compress(raw, 6)) * 1_000_000 // max(len(raw), 1)
    # The compressible doc compresses far better than the prose doc.
    assert got[0]["ratio_ppm"] < got[1]["ratio_ppm"]


def test_geohash_matches_reference_encoding(spark):
    # Independent ground truth: the canonical geohash example
    # (57.64911, 10.40744) -> "u4pruy" at precision 6, plus a southern-
    # hemisphere point; verifies quantization, interleave order (lon
    # first) and base32 alphabet in one shot.
    from iowa_liquor_sales_spark.operators.layout import (
        geohash_bits_sql,
        geohash_chars_sql,
    )

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-33.86, 151.21)], ["lat", "lon"]
    )
    out = (
        df.withColumn("z", __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
            geohash_bits_sql("lat", "lon", 6)))
        .withColumn("gh", __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
            geohash_chars_sql("z", 6)))
        .collect()
    )
    got = {(r["lat"], r["lon"]): r["gh"] for r in out}
    assert got[(57.64911, 10.40744)] == "u4pruy"
    assert got[(-33.86, 151.21)] == "r3gx2g"


def test_theil_sen_ignores_outlier(spark):
    from iowa_liquor_sales_spark.operators.aggregates import theil_sen_slope

    # y = 2x + noise-free, except one wild outlier month: OLS would be
    # dragged, the pairwise-slope median stays exactly 2.
    rows = [("g", x, 2 * x) for x in range(10)] + [("g", 10, 1000)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    out = theil_sen_slope(df, "k", "x", "y").collect()[0]
    assert out["n_points"] == 11
    assert out["n_pairs"] == 55
    assert out["slope_median"] == 2.0


def test_zonemap_skip_report_verdicts(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.layout import zonemap_skip_report

    # Bucket 0 entirely below the range (skip), bucket 1 inside (full),
    # bucket 2 straddling (partial).
    rows = [(0, 1), (0, 4), (1, 11), (1, 14), (2, 14), (2, 30)]
    df = spark.createDataFrame(rows, ["b", "v"])
    out = {
        r["bucket"]: r["verdict"]
        for r in zonemap_skip_report(df, F.col("b"), "v", 10, 20).collect()
    }
    assert out == {0: "skip", 1: "full", 2: "partial"}


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from iowa_liquor_sales_spark.operators.sampling import bootstrap_mean_ci

    rows = [(i, 1000 + (i % 7) * 10) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "cents"])
    a = bootstrap_mean_ci(df, "id", "cents", n_boot=40).collect()[0]
    b = bootstrap_mean_ci(df, "id", "cents", n_boot=40).collect()[0]
    assert a == b  # hash-drawn weights: no rand() anywhere
    assert a["n_boot"] == 40
    # CI in millicents brackets the true mean (10300 mc)
    assert a["ci_lo_mc"] <= 10300 <= a["ci_hi_mc"]
    # and is a nondegenerate interval
    assert a["ci_lo_mc"] < a["ci_hi_mc"]


def test_apply_in_arrow_matches_jvm_twin(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.functions.udfs import grouped_stats_arrow
    from iowa_liquor_sales_spark.schemas import read_table

    c = read_table(spark, "/root/testdata/sf0.001", "customer")
    got = {
        r["c_nationkey"]: (r["n_rows"], r["sum_cents"], r["max_cents"])
        for r in grouped_stats_arrow(
            c.groupBy("c_nationkey"), "c_acctbal", "c_nationkey"
        ).collect()
    }
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    want = {
        r["c_nationkey"]: (r["n"], r["s"], r["m"])
        for r in c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.max(cents).alias("m"),
        )
        .collect()
    }
    assert got == want


def test_exact_group_quantiles_matches_closed_form(spark):
    import math

    from iowa_liquor_sales_spark.operators.aggregates import (
        exact_group_quantiles,
    )

    # group "a": values 10..19 (n=10). percentile_cont(0.5) = 14.5 ->
    # x2 = 29; percentile_cont(0.9) over k=9: idx = 8.1 -> 10*(0.9*lo+...)
    rows = [("a", 10 + i, i) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "v", "tb"])
    out = {
        r["g"]: r
        for r in exact_group_quantiles(
            df, "g", "v", fracs=[(1, 2), (9, 10)], tiebreak=["tb"]
        ).collect()
    }
    a = out["a"]
    assert a["q1_2_x2"] == 29  # 14.5 * 2
    # idx = 9*(10-1)/10 = 8.1 -> lo=v[9]=18, hi=v[10]=19, r=1:
    # (10-1)*18 + 1*19 = 181 == 18.1 * 10
    assert a["q9_10_x10"] == 181


def test_geo_radius_band_prefilter_is_complete(spark):
    # The +-1 latitude-band neighborhood must lose no pair within the
    # radius: compare the banded join against the brute-force filter.
    import __spark_entry__ as em

    # sf0.01: the sparser sf0.001 customer/supplier grids have no pair
    # within 300 km, which would make the completeness check vacuous.
    sf = "/root/testdata/sf0.01"
    banded = {
        (r["c_custkey"], r["s_suppkey"])
        for r in em.q_geo_radius_join(spark, sf).collect()
    }
    from iowa_liquor_sales_spark.schemas import read_table
    from pyspark.sql import functions as F

    c = read_table(spark, sf, "customer")
    s = read_table(spark, sf, "supplier")
    clat = ((F.col("c_custkey") % 120) - 60 + F.lit(0.25)).cast("double")
    clon = (((F.col("c_custkey") * 7) % 360) - 180 + F.lit(0.25)).cast("double")
    slat = ((F.col("s_suppkey") % 100) - 50 + F.lit(0.5)).cast("double")
    slon = (((F.col("s_suppkey") * 11) % 360) - 180 + F.lit(0.5)).cast("double")
    j = c.select("c_custkey", clat.alias("clat"), clon.alias("clon")).crossJoin(
        s.select("s_suppkey", slat.alias("slat"), slon.alias("slon"))
    )
    dphi = F.radians(F.col("clat") - F.col("slat"))
    dlmb = F.radians(F.col("clon") - F.col("slon"))
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(F.col("slat")))
        * F.cos(F.radians(F.col("clat")))
        * F.sin(dlmb / 2)
        * F.sin(dlmb / 2)
    )
    dist_m = F.floor(
        F.lit(2.0) * F.lit(6371000.0) * F.asin(F.sqrt(a)) + 0.5
    ).cast("long")
    brute = {
        (r["c_custkey"], r["s_suppkey"])
        for r in j.withColumn("d", dist_m)
        .filter(F.col("d") < 300000)
        .collect()
    }
    assert banded == brute and len(brute) > 0


def test_conversion_funnel_strict_ordering(spark):
    import datetime

    import __spark_entry__ as em
    from pyspark.sql import functions as F

    # Validate the window-funnel against a hand-built truth: user 1
    # completes view->click->purchase in order; user 2 clicks BEFORE the
    # view (must not count); user 3 views only.
    t0 = datetime.datetime(2020, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        (1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(2)),
        (2, "click", ts(0)), (2, "view", ts(1)), (2, "purchase", ts(2)),
        (3, "view", ts(0)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    wu = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    )
    staged = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    per_user = {
        r["user_id"]: r
        for r in staged.groupBy("user_id")
        .agg(F.max("t2").alias("t2"), F.max("t3").alias("t3"))
        .collect()
    }
    assert per_user[1]["t2"] is not None and per_user[1]["t3"] is not None
    assert per_user[2]["t2"] is None  # click preceded the first view
    assert per_user[2]["t3"] is None  # purchase needs a qualifying click
    assert per_user[3]["t2"] is None


def test_hits_hub_authority_separation(spark):
    from iowa_liquor_sales_spark.operators.graph import hits_e6

    # Hand-built bipartite truth: hubs {1, 4} point at authorities
    # {2, 3}. Node 1 links both authorities, node 4 only the popular
    # one, so hub(1) > hub(4); node 2 has two in-links vs node 3's one,
    # so auth(2) > auth(3). Pure hubs have zero authority and vice versa.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2)], ["src", "dst"]
    )
    out = {r["node"]: r for r in hits_e6(edges, iters=2).collect()}
    assert out[2]["auth_e6"] > out[3]["auth_e6"] > 0
    assert out[1]["hub_e6"] > out[4]["hub_e6"] > 0
    assert out[2]["hub_e6"] == 0 and out[1]["auth_e6"] == 0
    # max-renormalization pins the round winners at exactly 1e6
    assert out[1]["hub_e6"] == 10**6 and out[2]["auth_e6"] == 10**6


def test_vocab_growth_monotone_and_exact(spark):
    from iowa_liquor_sales_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [
            (1, "a b"), (2, "a c"), (3, "d d"), (4, "a b"),
            (5, "e f"), (6, "a"), (7, "g"), (8, "a b c"),
            (9, "h"), (10, "a"),
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        vocab_growth(docs, n_points=5).collect(), key=lambda r: r["k"]
    )
    assert [r["threshold_id"] for r in rows] == [2, 4, 6, 8, 10]
    assert [r["n_docs"] for r in rows] == [2, 4, 6, 8, 10]
    # vocab after docs 1-2: {a,b,c}; 1-4: +d; 1-6: +e,f; 1-8: +g; 1-10: +h
    assert [r["vocab_size"] for r in rows] == [3, 4, 6, 7, 8]
    assert [r["n_tokens"] for r in rows] == [4, 8, 11, 15, 17]


def test_cdc_chunks_cover_document_and_align_on_shared_suffix(spark):
    from iowa_liquor_sales_spark.operators.dedup import cdc_chunks

    # varied words -> many distinct 16-grams, so ~len/64 chunk
    # boundaries exist (a short repeated phrase can legitimately yield
    # zero boundaries and a single whole-doc chunk)
    base = " ".join(f"word{i}x{i * 7 % 113}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, base), (2, "PREFIX-INSERTED-EDIT " + base)],
        ["doc_id", "text"],
    )
    ch = cdc_chunks(docs).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # chunks tile each document exactly
    for doc_id, text in [(1, base), (2, "PREFIX-INSERTED-EDIT " + base)]:
        assert sum(r["chunk_len"] for r in by_doc[doc_id]) == len(text)
    # content-defined boundaries: the edit perturbs only the first
    # chunk(s); the shared tail re-synchronizes to identical chunk hashes
    h1 = {r["chunk_hash"] for r in by_doc[1]}
    h2 = {r["chunk_hash"] for r in by_doc[2]}
    shared = h1 & h2
    assert len(shared) >= max(1, len(h1) - 2)


def test_supplier_hindex_definition(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # supplier 1: quantities [5,4,4,1] -> h=3 (three lines >= 3);
    # supplier 2: [2,2] -> h=2; supplier 3: [1] -> h=1.
    li = spark.createDataFrame(
        [(1, 5), (1, 4), (1, 4), (1, 1), (2, 2), (2, 2), (3, 1)],
        ["l_suppkey", "qty"],
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.col("qty").desc())
    out = {
        r["l_suppkey"]: r["h"]
        for r in li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.col("qty"))
        .groupBy("l_suppkey")
        .agg(F.max("rnk").alias("h"))
        .collect()
    }
    assert out == {1: 3, 2: 2, 3: 1}


def test_fuzzy_pairs_band_covers_max_len_diff(spark):
    from iowa_liquor_sales_spark.operators.joins import fuzzy_pairs

    df = spark.createDataFrame(
        [("cat",), ("cat",), ("cart",), ("dog",), ("ab",), ("abxyz",)],
        ["name"],
    )
    out = {
        (r["name_a"], r["name_b"]): r for r in fuzzy_pairs(df, "name").collect()
    }
    assert out[("cat", "cart")]["dist"] == 1
    assert out[("cat", "cart")]["n_rows_a"] == 2  # weight = row count
    # len diff == max_dist == 3: the band's outermost edge must survive
    assert out[("ab", "abxyz")]["dist"] == 3
    # three substitutions away is still within max_dist=3
    assert out[("cat", "dog")]["dist"] == 3
    # beyond the threshold: no pair
    assert ("cat", "abxyz") not in out and ("abxyz", "cat") not in out


def test_fuzzy_pairs_segment_blocking_matches_brute_force(spark):
    """PassJoin pigeonhole completeness: the segment-blocked result must
    equal the prefilter-free all-pairs answer on an adversarial set
    (edits at segment boundaries, pure indels, strings shorter than the
    d+1 segment count, the empty string)."""
    import itertools

    from iowa_liquor_sales_spark.operators.joins import fuzzy_pairs

    rows = [
        ("alpha",), ("alphb",), ("aalpha",), ("alph",), ("x",), ("xy",),
        ("",), ("chocolate lace",), ("chocolate lacee",),
        ("chacolate lace",), ("abcdefghijkl",), ("abcefghijkl",),
        ("zbcdefghijkz",),
    ]
    df = spark.createDataFrame(rows, ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs(df, "name", max_dist=3).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = set()
    for x, y in itertools.combinations(sorted({r[0] for r in rows}), 2):
        a, b = (x, y) if (len(x), x) < (len(y), y) else (y, x)
        d = lev(a, b)
        if d <= 3:
            want.add((a, b, d))
    assert got == want


def test_resolve_entities_transitive_and_survivorship(spark):
    from iowa_liquor_sales_spark.operators.joins import resolve_entities

    # abcd ~ abce ~ abcf chain (each pair dist 1): one cluster even
    # though abcd~abcf only via transitivity at d=1; "abce" has the most
    # rows so it survives; "zzzz" is a singleton mapping to itself.
    rows = (
        [("abcd",)] * 2 + [("abce",)] * 5 + [("abcf",)] * 3 + [("zzzz",)]
    )
    df = spark.createDataFrame(rows, ["name"])
    got = {
        r["name"]: (r["canonical"], r["n_rows"])
        for r in resolve_entities(df, "name", max_dist=1).collect()
    }
    assert got == {
        "abcd": ("abce", 2),
        "abce": ("abce", 5),
        "abcf": ("abce", 3),
        "zzzz": ("zzzz", 1),
    }


def test_auc_exact_known_values(spark):
    from iowa_liquor_sales_spark.operators.quality import auc_exact

    # Perfect separation -> 1.0; all-tied -> 0.5; one discordant pair
    # among 2x2 -> 0.75.
    perfect = spark.createDataFrame(
        [(1, False), (2, False), (3, True), (4, True)], ["s", "y"]
    )
    assert auc_exact(perfect, "s", "y").head()["auc_ppm"] == 1_000_000
    tied = spark.createDataFrame([(7, True), (7, False)], ["s", "y"])
    assert auc_exact(tied, "s", "y").head()["auc_ppm"] == 500_000
    mixed = spark.createDataFrame(
        [(1, False), (2, True), (3, False), (4, True)], ["s", "y"]
    )
    assert auc_exact(mixed, "s", "y").head()["auc_ppm"] == 750_000
    empty_class = spark.createDataFrame([(1, True)], ["s", "y"])
    assert auc_exact(empty_class, "s", "y").head()["auc_ppm"] is None


def test_speech_segments_islands(spark):
    from iowa_liquor_sales_spark.multimodal.binary_ops import speech_segments

    frames = spark.createDataFrame(
        [
            (1, 0, 50), (1, 1, 10), (1, 2, 60), (1, 3, 70), (1, 4, 10),
            (2, 0, 90),
        ],
        ["doc_id", "frame_id", "rms_e3"],
    )
    got = sorted(
        (r["doc_id"], r["seg_id"], r["start_frame"], r["end_frame"],
         r["n_frames"], r["max_rms_e3"])
        for r in speech_segments(frames, threshold_e3=50).collect()
    )
    assert got == [
        (1, 1, 0, 0, 1, 50),
        (1, 2, 2, 3, 2, 70),
        (2, 1, 0, 0, 1, 90),
    ]


def test_textrank_single_word_docs_make_no_edges(spark):
    from iowa_liquor_sales_spark.operators.text import textrank_keywords

    # sequence(1, 0) steps DOWNWARD in Spark — a single-word doc must
    # not fabricate pairs. Two-word docs make a 2-cycle; ranks equal.
    df = spark.createDataFrame(
        [("solo",), ("alpha beta",)], ["text"]
    )
    rows = textrank_keywords(df, iters=1, k=10).collect()
    assert {r["word"] for r in rows} == {"alpha", "beta"}
    assert len({r["rank_e12"] for r in rows}) == 1


def test_coreness_hindex_converges_to_core_numbers(spark):
    from iowa_liquor_sales_spark.operators.graph import coreness_hindex

    # K4 on {0,1,2,3} (coreness 3 each) with a pendant chain 3-10-11:
    # node 10 sits on a path -> coreness 1, node 11 likewise. Three
    # rounds are enough here (values only decrease toward the core
    # number).
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    edges = spark.createDataFrame(
        k4 + [(3, 10), (10, 11)], ["src", "dst"]
    )
    got = {
        r["node"]: r["coreness"]
        for r in coreness_hindex(edges, rounds=3).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1}


def test_cuped_known_theta_and_degenerate_covariate(spark):
    from iowa_liquor_sales_spark.operators.quality import cuped_adjusted_means

    # post = 2*pre exactly -> theta = 2; adjusted value for every unit
    # is 2*mean(pre), so both arms' adjusted means coincide there even
    # though their raw post means differ.
    rows = [(0, 10, 20), (0, 20, 40), (1, 30, 60), (1, 40, 80)]
    df = spark.createDataFrame(rows, ["arm", "pre", "post"])
    got = {r["arm"]: r for r in cuped_adjusted_means(df).collect()}
    assert got[0]["mean_post_e6"] == 30_000_000
    assert got[1]["mean_post_e6"] == 70_000_000
    assert got[0]["mean_adj_e6"] == got[1]["mean_adj_e6"] == 50_000_000

    # constant pre -> Var(pre)=0 -> theta=0 -> adjusted == raw
    const = spark.createDataFrame(
        [(0, 5, 10), (1, 5, 30)], ["arm", "pre", "post"]
    )
    for r in cuped_adjusted_means(const).collect():
        assert r["mean_adj_e6"] == r["mean_post_e6"]


def _hex_concentrated_dictionary():
    """A deterministic hex-like dictionary concentrated at ONE length —
    the documented pathological case for segment blocking (candidates
    per name grow with names-per-length). 80 base names of length 16
    plus a distance<=2 variant for half of them."""
    import random

    rng = random.Random(7)
    alphabet = "0123456789abcdef"
    base = {
        "".join(rng.choice(alphabet) for _ in range(16)) for _ in range(80)
    }
    rows = [(n,) for n in sorted(base)]
    for k, name in enumerate(sorted(base)):
        if k % 2 == 0:
            i = rng.randrange(16)
            repl = rng.choice(alphabet.replace(name[i], ""))
            rows.append((name[:i] + repl + name[i + 1:],))
    return rows


def test_fuzzy_pairs_lsh_source_matches_passjoin_on_concentrated_dict(spark):
    """Round-6 verdict item 4: the LSH escalation path must reproduce
    the complete PassJoin matched-pair set on a concentrated hex
    dictionary (char-trigram Jaccard of a dist<=2 pair of 16-char
    names is >=~0.4, where 32 one-row bands still have ~1-6e-8
    recall; the hot-bucket cap never fires at this dictionary
    size)."""
    from iowa_liquor_sales_spark.operators.joins import fuzzy_pairs

    df = spark.createDataFrame(_hex_concentrated_dictionary(), ["name"])
    want = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs(df, "name", max_dist=2).collect()
    }
    assert want  # the planted variants must actually match
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs(
            df, "name", max_dist=2, pair_source="lsh"
        ).collect()
    }
    assert got == want


def test_fuzzy_pairs_auto_switches_by_measurement(spark):
    """pair_source='auto' escalates to LSH when the measured candidate
    count exceeds the per-name budget, records the decision in the
    observations dict, and still returns the same matched-pair set;
    with a generous budget it stays on the complete PassJoin source."""
    from iowa_liquor_sales_spark.operators.joins import fuzzy_pairs

    df = spark.createDataFrame(_hex_concentrated_dictionary(), ["name"])
    want = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs(df, "name", max_dist=2).collect()
    }

    obs = {}
    forced = fuzzy_pairs(
        df, "name", max_dist=2, pair_source="auto",
        auto_max_cand_per_name=0, observations=obs,
    )
    got = {(r["name_a"], r["name_b"], r["dist"]) for r in forced.collect()}
    assert obs["pair_source"] == "lsh"
    assert got == want

    obs = {}
    kept = fuzzy_pairs(
        df, "name", max_dist=2, pair_source="auto",
        auto_max_cand_per_name=10_000_000, observations=obs,
    )
    got = {(r["name_a"], r["name_b"], r["dist"]) for r in kept.collect()}
    assert obs["pair_source"] == "passjoin"
    assert got == want


def test_resolve_entities_inherits_pair_source(spark):
    from iowa_liquor_sales_spark.operators.joins import resolve_entities

    df = spark.createDataFrame(_hex_concentrated_dictionary(), ["name"])
    want = {
        (r["name"], r["canonical"])
        for r in resolve_entities(df, "name", max_dist=2).collect()
    }
    got = {
        (r["name"], r["canonical"])
        for r in resolve_entities(
            df, "name", max_dist=2, pair_source="lsh"
        ).collect()
    }
    assert got == want


def test_global_cumsum_matches_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.ranking import global_cumsum

    df = spark.range(0, 997).select(
        (F.col("id") * 7919 % 997).alias("k"),
        ((F.col("id") % 13) - 6).alias("v"),  # negatives included
    )
    out = global_cumsum(df, ["k"], "v", out_col="cum", num_partitions=8)
    expected = df.withColumn(
        "cum",
        F.sum("v").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert out.count() == 997
    diff = out.join(expected, ["k", "v"]).filter(
        out["cum"] != expected["cum"]
    )
    assert diff.count() == 0


def test_global_cumsum_empty_input(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.ranking import global_cumsum

    df = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).filter(F.col("k") < 0)
    assert global_cumsum(df, ["k"], "v").count() == 0


def test_select_token_budget_modal_level_matches_naive(spark):
    """Hostile shape for the boundary stage: EVERY document on one
    quality level, so the boundary level IS the corpus — the de-skewed
    prefix sum must still reproduce the naive global-order scan."""
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.curation import (
        select_token_budget,
    )

    n = 500
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit(7).alias("q"),
        ((F.col("id") * 37 % 91) + 1).alias("tokens"),
    )
    budget = 3000
    out = {
        r["doc_id"]
        for r in select_token_budget(
            df, budget, "q", "tokens", id_col="doc_id"
        ).collect()
    }
    rows = sorted(df.collect(), key=lambda r: (-r["q"], r["doc_id"]))
    acc, keep = 0, set()
    for r in rows:
        acc += r["tokens"]
        if acc > budget:
            break
        keep.add(r["doc_id"])
    assert out == keep and 0 < len(keep) < n


def test_fuzzy_pairs_sampled_recall_measurement(spark):
    """recall_sample_mod: the escalated LSH arm must MEASURE its recall
    — a complete PassJoin rerun over a deterministic name sample gives
    the expected pair count, and the LSH candidates are scored against
    it. mod=1 samples every name, so expected == the full PassJoin
    matched-pair count and found == the LSH arm's true-pair overlap."""
    from iowa_liquor_sales_spark.operators.joins import fuzzy_pairs

    df = spark.createDataFrame(_hex_concentrated_dictionary(), ["name"])
    full = fuzzy_pairs(df, "name", max_dist=2).count()
    assert full > 0

    obs = {}
    out = fuzzy_pairs(
        df, "name", max_dist=2, pair_source="lsh",
        observations=obs, recall_sample_mod=1,
    )
    got = out.count()
    rs = obs["recall_sample"]
    assert rs["expected"] == full
    assert 0 <= rs["found"] <= rs["expected"]
    # on this dictionary the LSH arm is pytest-proven complete, so the
    # measured recall must agree with the matched-set equivalence
    assert rs["found"] == got == full

    # sampled (mod=4): expected is a subset of the full truth, found
    # bounded by it
    obs = {}
    fuzzy_pairs(
        df, "name", max_dist=2, pair_source="lsh",
        observations=obs, recall_sample_mod=4,
    ).count()
    rs4 = obs["recall_sample"]
    assert rs4["expected"] <= full
    assert 0 <= rs4["found"] <= rs4["expected"]

    # the passjoin path ignores the knob (provably complete source)
    obs = {}
    fuzzy_pairs(
        df, "name", max_dist=2, observations=obs, recall_sample_mod=4
    ).count()
    assert "recall_sample" not in obs


def test_spearman_corr_known_values(spark):
    """Monotone transform -> rho = 1 exactly; reversing one column ->
    rho = -1; ties use average ranks (checked against scipy-computed
    reference on a fixed small sample: [1,2,2,3] vs [10,20,20,40] ->
    rho = 1)."""
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.aggregates import spearman_corr

    df = spark.range(1, 201).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * F.col("id")).cast("double").alias("y"),
    )
    # the final sqrt/div run in double, so rho = 1 floors to within an
    # ulp of the ppb grid (identically in the oracle engine)
    assert abs(spearman_corr(df, "x", "y").first()["spearman_ppb"] - 10**9) <= 2
    rev = df.withColumn("y", -F.col("y"))
    assert (
        abs(spearman_corr(rev, "x", "y").first()["spearman_ppb"] + 10**9)
        <= 2
    )

    tied = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)], ["x", "y"]
    )
    assert tied.count() == 4
    assert (
        abs(spearman_corr(tied, "x", "y").first()["spearman_ppb"] - 10**9)
        <= 2
    )


# ---------------------------------------------------------------- round-8
# rank/drift statistics + interleave (quality.mann_whitney_u /
# ks_two_sample / chi2_independence, aggregates.gini_concentration,
# curation.interleave_by_source)


def _mw_python(a, b):
    """Reference Mann-Whitney: doubled U of group a with tie-averaged
    ranks, plus the tie-corrected z (no continuity correction)."""
    import math

    vals = sorted(set(a) | set(b))
    combined = sorted(a + b)
    # tie-averaged rank per value, doubled to stay integral
    r2 = {}
    i = 0
    for v in vals:
        c = combined.count(v)
        r2[v] = 2 * i + c + 1
        i += c
    ra2 = sum(r2[v] for v in a)
    na, nb = len(a), len(b)
    u2 = ra2 - na * (na + 1)
    n = na + nb
    ties = sum(combined.count(v) ** 3 - combined.count(v) for v in vals)
    var = na * nb * ((n + 1) * n * (n - 1) - ties) / (12 * n * (n - 1))
    z = (u2 - na * nb) / 2.0 / math.sqrt(var)
    return u2, z


def test_mann_whitney_matches_reference(spark):
    from iowa_liquor_sales_spark.operators.quality import mann_whitney_u

    a = [3, 5, 5, 8, 12, 12, 12, 20]
    b = [1, 2, 5, 7, 12, 13]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    got = mann_whitney_u(df, "v", "g", "a", "b").head()
    u2, z = _mw_python(a, b)
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert got["u2_a"] == u2
    assert got["z_ppm"] == int(z * 1e6 // 1)  # floor

    # complement identity: U_a + U_b = n_a*n_b (doubled: 2*na*nb)
    got_b = mann_whitney_u(df, "v", "g", "b", "a").head()
    assert got["u2_a"] + got_b["u2_a"] == 2 * len(a) * len(b)


def test_ks_two_sample_bounds_and_value(spark):
    from iowa_liquor_sales_spark.operators.quality import ks_two_sample

    # identical samples -> D = 0
    rows = [(v, g) for v in (1, 2, 3, 4) for g in ("a", "b")]
    same = ks_two_sample(
        spark.createDataFrame(rows, ["v", "g"]), "v", "g", "a", "b"
    ).head()
    assert same["ks_ppm"] == 0

    # disjoint supports -> D = 1 at the boundary value
    rows = [(v, "a") for v in (1, 2, 3)] + [(v, "b") for v in (10, 11)]
    dis = ks_two_sample(
        spark.createDataFrame(rows, ["v", "g"]), "v", "g", "a", "b"
    ).head()
    assert dis["ks_ppm"] == 1_000_000
    assert dis["ks_at"] == 3

    # hand case: a={1,2,2,5}, b={2,3}; ECDFs cross mid-range
    rows = [(1, "a"), (2, "a"), (2, "a"), (5, "a"), (2, "b"), (3, "b")]
    got = ks_two_sample(
        spark.createDataFrame(rows, ["v", "g"]), "v", "g", "a", "b"
    ).head()
    # at v=3: F_a = 3/4, F_b = 2/2 -> |3*2 - 2*4| = 2 -> 2/8 = .25
    # at v=1: |1*2 - 0| = 2 -> also .25; smallest argmax is v=1
    assert got["ks_ppm"] == 250_000
    assert got["ks_at"] == 1


def test_chi2_independence_exact_cases(spark):
    from iowa_liquor_sales_spark.operators.quality import chi2_independence

    # perfectly independent 2x2 (all marginals balanced) -> chi2 = 0
    rows = [(r, c) for r in ("x", "y") for c in ("p", "q") for _ in range(5)]
    ind = chi2_independence(
        spark.createDataFrame(rows, ["r", "c"]), "r", "c"
    ).head()
    assert ind["chi2_ppm"] == 0
    assert ind["cramers_v_ppb"] == 0

    # classic 2x2: [[10, 20], [20, 10]] -> chi2 = 60^2*... = 6.666...
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 20 + [("y", "q")] * 10
    )
    got = chi2_independence(
        spark.createDataFrame(rows, ["r", "c"]), "r", "c"
    ).head()
    # chi2 = n*(sum O^2/(rt*ct) - 1) with n=60: exact value 20/3
    assert abs(got["chi2_ppm"] - 6_666_666) <= 4  # 1e-12-grid truncation
    # V = sqrt(chi2/n) for 2x2 = sqrt(1/9) = 1/3
    assert abs(got["cramers_v_ppb"] - 333_333_333) <= 1000


def test_gini_concentration_known_values(spark):
    from iowa_liquor_sales_spark.operators.aggregates import (
        gini_concentration,
    )

    # all equal -> 0
    eq = gini_concentration(
        spark.createDataFrame([(7,)] * 6, ["v"]), "v"
    ).head()
    assert eq["gini_ppm"] == 0

    # one holder of everything: G = (n-1)/n = 0.75 for n=4
    one = gini_concentration(
        spark.createDataFrame([(0,), (0,), (0,), (100,)], ["v"]), "v"
    ).head()
    assert one["gini_ppm"] == 750_000

    # python reference on a mixed multiset
    vals = [1, 1, 2, 3, 5, 8, 8, 13]
    xs = sorted(vals)
    n, t = len(xs), sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    expect = (2 * s - (n + 1) * t) * 1_000_000 // (n * t)
    got = gini_concentration(
        spark.createDataFrame([(v,) for v in vals], ["v"]), "v"
    ).head()
    assert got["gini_ppm"] == expect
    assert (got["n"], got["total"]) == (n, t)


def test_dup_rate_curve_hand_corpus(spark):
    from iowa_liquor_sales_spark.operators.text import dup_rate_curve

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    rows = {
        r["n"]: r for r in dup_rate_curve(df, ns=(1, 2, 4)).collect()
    }
    # n=1: 7 tokens, 3 distinct
    assert (rows[1]["n_grams"], rows[1]["n_distinct"]) == (7, 3)
    assert rows[1]["dup_ppm"] == 4 * 1_000_000 // 7
    # n=2: grams "a b","b a","a b" + "a b","b c" -> 5 total, 3 distinct
    assert (rows[2]["n_grams"], rows[2]["n_distinct"]) == (5, 3)
    # n=4: only doc1 has one 4-gram
    assert (rows[4]["n_grams"], rows[4]["n_distinct"]) == (1, 1)
    assert rows[4]["dup_ppm"] == 0


def test_interleave_matches_window_form(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.curation import (
        interleave_by_source,
    )

    df = spark.range(97).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias(
            "source"
        ),
    )
    got = interleave_by_source(df).toPandas().set_index("id")

    # oracle: per-source window row_number over the same hash order
    h = (F.col("doc_id") * 2654435761) % (1 << 31)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    exp = (
        df.withColumn("h", h)
        .withColumn("pos", F.row_number().over(w))
        .toPandas()
        .set_index("doc_id")
    )
    assert len(got) == 97
    for doc_id, row in got.iterrows():
        assert row["pos"] == exp.loc[doc_id, "pos"]

    # order_key is unique and the first len(sources) keys in sorted
    # order hit every source once (true round-robin locally)
    keys = sorted(zip(got["order_key"], got["source"]))
    assert len({k for k, _ in keys}) == len(keys)
    assert {s for _, s in keys[:3]} == {"s0", "s1", "s2"}


def test_kruskal_wallis_matches_reference(spark):
    from iowa_liquor_sales_spark.operators.quality import kruskal_wallis

    groups = {"a": [1, 3, 5, 7, 7], "b": [2, 4, 6, 7], "c": [8, 9, 9, 10]}
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    got = kruskal_wallis(
        spark.createDataFrame(rows, ["v", "g"]), "v", "g"
    ).head()

    # pure-python reference with tie-averaged ranks
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    rank = {}
    i = 0
    for v in sorted(set(allv)):
        c = allv.count(v)
        rank[v] = i + (c + 1) / 2
        i += c
    h = 12 / (n * (n + 1)) * sum(
        sum(rank[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    ties = sum(
        allv.count(v) ** 3 - allv.count(v) for v in set(allv)
    )
    h_adj = h / (1 - ties / (n**3 - n))
    assert (got["k"], got["n"]) == (3, n)
    # the engine's 1e6 truncating-div grid costs < 2 ppm here
    assert abs(got["h_ppm"] - int(h_adj * 1e6)) <= 2


def test_anova_and_levene_match_reference(spark):
    from iowa_liquor_sales_spark.operators.quality import anova_f, levene_bf

    groups = {"a": [10, 12, 14, 11], "b": [20, 22, 19], "c": [15, 15, 16, 30]}
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, ["v", "g"])

    def f_stat(gs):
        n = sum(len(v) for v in gs.values())
        k = len(gs)
        tot = sum(sum(v) for v in gs.values())
        ssb = sum(sum(v) ** 2 / len(v) for v in gs.values()) - tot**2 / n
        ssw = sum(x**2 for v in gs.values() for x in v) - sum(
            sum(v) ** 2 / len(v) for v in gs.values()
        )
        return (ssb / (k - 1)) / (ssw / (n - k))

    got = anova_f(df, "v", "g").head()
    assert abs(got["f_ppm"] - int(f_stat(groups) * 1e6)) <= 3

    # Brown-Forsythe: ANOVA on |2x - 2*median_g| (doubling is
    # F-invariant and keeps half-integer medians exact)
    import statistics

    zgroups = {
        g: [abs(2 * x - int(2 * statistics.median(vs))) for x in vs]
        for g, vs in groups.items()
    }
    got_bf = levene_bf(df, "v", "g").head()
    assert abs(got_bf["f_ppm"] - int(f_stat(zgroups) * 1e6)) <= 3


def test_silhouette_separated_and_reference(spark):
    from iowa_liquor_sales_spark.operators.similarity import (
        silhouette_labels,
    )

    # two tight, far-apart clusters -> mean silhouette near 1
    rows = [
        (1, [0.0, 0.0], "a"), (2, [0.1, 0.0], "a"), (3, [0.0, 0.1], "a"),
        (4, [9.0, 9.0], "b"), (5, [9.1, 9.0], "b"), (6, [9.0, 9.1], "b"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {r["label"]: r for r in silhouette_labels(df).collect()}
    assert got["a"]["n_points"] == 3 and got["b"]["n_points"] == 3
    assert got["a"]["mean_sil_ppm"] > 990_000
    assert got["b"]["mean_sil_ppm"] > 990_000

    # python reference (simplified silhouette on the e6 grid)
    def ref(rows):
        from collections import defaultdict

        pts = {r[0]: ([round(x * 1e6) for x in r[1]], r[2]) for r in rows}
        cent = defaultdict(lambda: [0, 0, 0])
        for v, lab in pts.values():
            cent[lab][0] += v[0]
            cent[lab][1] += v[1]
            cent[lab][2] += 1
        sums = defaultdict(list)
        for v, lab in pts.values():
            d = {}
            for cl, (sx, sy, n) in cent.items():
                d[cl] = ((n * v[0] - sx) ** 2 + (n * v[1] - sy) ** 2) / n**2
            a = d[lab]
            b = min(x for cl, x in d.items() if cl != lab)
            sums[lab].append(
                int((b - a) * 1e6 / max(a, b) // 1) if max(a, b) > 0 else 0
            )
        # truncate-toward-zero mean, matching Spark div / DuckDB //
        return {
            lab: int(sum(s) / len(s)) for lab, s in sums.items()
        }

    expect = ref(rows)
    for lab in ("a", "b"):
        assert abs(got[lab]["mean_sil_ppm"] - expect[lab]) <= 1


def test_readability_flesch_hand_values(spark):
    from iowa_liquor_sales_spark.operators.text import readability_flesch

    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!"), (2, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r for r in readability_flesch(df).collect()
    }
    # W=5, S=2 ('.'+'!'), Y=5 (one vowel group per word)
    r = got[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    # (206835*2*5 - 1015*25 - 84600*5*2) div 10 = 1196975 div 10
    assert r["flesch_milli"] == 119697
    # empty text: floors W=S=1, Y=0
    r = got[2]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (1, 1, 0)
    assert r["flesch_milli"] == 206835 - 1015


def test_rake_keywords_hand_corpus(spark):
    from iowa_liquor_sales_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "the deep learning model and the deep model")],
        ["doc_id", "text"],
    )
    got = {r["phrase"]: r for r in rake_keywords(df).collect()}
    # phrases: "deep learning model", "deep model"
    # deep: freq 2, degree 5 -> 2500; learning: 1/3 -> 3000;
    # model: freq 2, degree 5 -> 2500
    assert got["deep learning model"]["score_milli"] == 2500 + 3000 + 2500
    assert got["deep model"]["score_milli"] == 5000
    assert got["deep learning model"]["n_occurrences"] == 1
    assert set(got) == {"deep learning model", "deep model"}


def test_jsd_drift_single_group_is_zero(spark):
    from iowa_liquor_sales_spark.operators.text import jsd_source_drift

    df = spark.createDataFrame(
        [(1, "alpha beta beta", "s1"), (2, "alpha gamma", "s1")],
        ["doc_id", "text", "source"],
    )
    got = jsd_source_drift(df).head()
    # one group == the global distribution -> p == q -> JSD exactly 0
    assert got["jsd_e9"] == 0
    assert got["n_terms"] == 3

    # disjoint vocabularies -> strictly positive divergence both sides
    df2 = spark.createDataFrame(
        [(1, "aa aa bb", "s1"), (2, "cc dd dd dd", "s2")],
        ["doc_id", "text", "source"],
    )
    rows = {r["source"]: r for r in jsd_source_drift(df2).collect()}
    assert rows["s1"]["jsd_e9"] > 0 and rows["s2"]["jsd_e9"] > 0
    # python mirror of the exact grid arithmetic
    import math

    counts = {"s1": {"aa": 2, "bb": 1}, "s2": {"cc": 1, "dd": 3}}
    vocab = {"aa", "bb", "cc", "dd"}
    tot_all = 7
    for src, r in rows.items():
        tot_g = sum(counts[src].values())
        jsd = 0
        for term in vocab:
            p = (counts[src].get(term, 0) + 1) / (tot_g + 4)
            q = (
                sum(c.get(term, 0) for c in counts.values()) + 1
            ) / (tot_all + 4)
            m = (p + q) / 2
            jsd += round(0.5e9 * (p * math.log(p / m) + q * math.log(q / m)))
        assert r["jsd_e9"] == jsd


def test_friedman_reference_value(spark):
    from iowa_liquor_sales_spark.operators.quality import friedman_test

    # no-tie hand case: Q = 12/(nk(k+1))*SUM(R_j^2) - 3n(k+1) = 4.5
    data = [
        ("b1", "A", 1), ("b1", "B", 2), ("b1", "C", 3),
        ("b2", "A", 1), ("b2", "B", 3), ("b2", "C", 2),
        ("b3", "A", 1), ("b3", "B", 2), ("b3", "C", 3),
        ("b4", "A", 2), ("b4", "B", 1), ("b4", "C", 3),
    ]
    df = spark.createDataFrame(data, ["blk", "trt", "v"])
    got = friedman_test(df, "blk", "trt", "v").head()
    assert (got["n_blocks"], got["k_treatments"]) == (4, 3)
    assert got["q_ppm"] == 4_500_000

    # incomplete blocks are excluded; all-tied blocks -> den 0 -> 0
    df2 = spark.createDataFrame(
        data + [("b5", "A", 9)], ["blk", "trt", "v"]
    )
    got2 = friedman_test(df2, "blk", "trt", "v").head()
    assert got2["n_blocks"] == 4 and got2["q_ppm"] == 4_500_000

    tied = spark.createDataFrame(
        [("b1", t, 5) for t in "ABC"] + [("b2", t, 7) for t in "ABC"],
        ["blk", "trt", "v"],
    )
    assert friedman_test(tied, "blk", "trt", "v").head()["q_ppm"] == 0


def test_ndcg_hand_values(spark):
    import math

    from iowa_liquor_sales_spark.operators.similarity import ndcg_at_k

    rows = [
        (0, [0.0, 0.0], "x"),
        (1, [1.0, 0.0], "x"),
        (2, [2.0, 0.0], "y"),
        (3, [3.0, 0.0], "x"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = ndcg_at_k(df, n_queries=1, k=2).head()
    g1 = math.floor(1e6 / math.log2(2) + 0.5)
    g2 = math.floor(1e6 / math.log2(3) + 0.5)
    # top-2 by distance: id1 (rel 1), id2 (rel 0) -> DCG = g1
    assert got["n_relevant"] == 2
    assert got["dcg_e6"] == g1
    assert got["idcg_e6"] == g1 + g2
    assert got["ndcg_ppm"] == g1 * 1_000_000 // (g1 + g2)

    # all-irrelevant anchor: n_relevant 0 -> idcg 0 -> ndcg 0, no crash
    rows0 = [
        (0, [0.0, 0.0], "z"),
        (1, [1.0, 0.0], "x"),
        (2, [2.0, 0.0], "y"),
    ]
    got0 = ndcg_at_k(
        spark.createDataFrame(rows0, ["vec_id", "embedding", "label"]),
        n_queries=1,
        k=2,
    ).head()
    assert (got0["n_relevant"], got0["idcg_e6"], got0["ndcg_ppm"]) == (
        0,
        0,
        0,
    )


def test_grid_dbscan_roles_and_clusters(spark):
    from iowa_liquor_sales_spark.operators.clustering import grid_dbscan

    pts = [
        (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),  # dense unit square
        (5, 3, 0),                                    # border straggler
        (6, 10, 10),                                  # noise
    ]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {r["id"]: r for r in grid_dbscan(df, eps=2, min_pts=4).collect()}
    for pid in (1, 2, 3, 4):
        assert got[pid]["role"] == "core"
        assert got[pid]["cluster"] == 1
    assert got[5]["role"] == "border" and got[5]["cluster"] == 1
    assert got[6]["role"] == "noise" and got[6]["cluster"] == -1


def test_grid_dbscan_self_diagnoses_dense_cells(spark):
    # The contract-edge diagnostic (round-8 verdict item 5): a density
    # that grows with n bends the wall O(n * occupancy) — the operator
    # must SAY so. The growing-density shape = many points in one eps
    # cell -> grid_too_coarse fires with a remedy; a spread-out corpus
    # stays quiet. The attached Observation reports the actual candidate
    # count (16 co-cell points x 16 through the 3x3 neighborhood = 256
    # ordered pairs incl. self; no neighbors in adjacent cells).
    from iowa_liquor_sales_spark.operators.clustering import grid_dbscan

    dense = spark.createDataFrame(
        [(i, i % 4, i // 4) for i in range(16)], ["id", "x", "y"]
    )
    obs: dict = {}
    out = grid_dbscan(
        dense, eps=10, min_pts=3, observations=obs, dense_cell_warn=10
    )
    cd = obs["cell_density"]
    assert cd["n_points"] == 16 and cd["n_cells"] == 1
    assert cd["max_cell"] == 16 and cd["p99_cell"] == 16
    assert cd["same_cell_candidates"] == 256
    assert cd["grid_too_coarse"] is True
    assert "quantize" in cd["remedy"] and "2304" in cd["remedy"]
    out.count()  # run the job so the Observation materializes
    assert obs["candidates"].get["n"] == 256

    sparse = spark.createDataFrame(
        [(i, 100 * i, 0) for i in range(16)], ["id", "x", "y"]
    )
    obs2: dict = {}
    grid_dbscan(sparse, eps=3, min_pts=2, observations=obs2, dense_cell_warn=10)
    assert obs2["cell_density"]["grid_too_coarse"] is False
    assert obs2["cell_density"]["remedy"] is None
    # The diagnostic must not perturb the clustering itself.
    base = {
        r["id"]: (r["role"], r["cluster"])
        for r in grid_dbscan(dense, eps=10, min_pts=3).collect()
    }
    diag = {
        r["id"]: (r["role"], r["cluster"]) for r in out.collect()
    }
    assert base == diag


def test_t_closeness_hand_distribution(spark):
    from iowa_liquor_sales_spark.operators.quality import t_closeness_audit

    # class A mirrors the global distribution exactly -> EMD 0 is
    # impossible unless A IS the whole data; use two classes with known
    # CDFs over bins {0,1}: A = [0,0,1,1], B = [1,1]; global = 2x0, 4x1.
    rows = (
        [("A", 0)] * 2 + [("A", 1)] * 2 + [("B", 1)] * 2
    )
    df = spark.createDataFrame(rows, ["qi", "s"])
    got = {r["qi"]: r for r in t_closeness_audit(df, ["qi"], "s").collect()}
    # m=2 bins; F_glob = (2/6, 1). A: F=(1/2, 1) -> EMD = |1/2-1/3| = 1/6
    # exact: |cum_c*N - cum_g*n| summed = |2*6-2*4| + |4*6-6*4| = 4
    # ppm = 4*1e6 div (4*6*(2-1)) = 166666
    assert got["A"]["emd_ppm"] == 166_666
    # B: |0*6-2*2| + |2*6-6*2| = 4 -> 4*1e6 div (2*6*1) = 333333
    assert got["B"]["emd_ppm"] == 333_333
    assert got["A"]["n_class"] == 4 and got["B"]["n_class"] == 2


def test_harmonic_centrality_path_graph(spark):
    from iowa_liquor_sales_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], ["src", "dst"]
    )
    got = harmonic_centrality(edges, sources=[0], rounds=3).head()
    # d = 1, 2, 3 within 3 rounds -> 1e6 + 500000 + 333333
    assert got["n_reached"] == 3
    assert got["harmonic_e6"] == 1_000_000 + 500_000 + 333_333


def test_assortativity_star_is_minus_one(spark):
    from iowa_liquor_sales_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    got = degree_assortativity(star).head()
    # a star is perfectly disassortative; all terms are exact squares so
    # the double pipeline hits -1.0 on the nose
    assert got["n_directed_edges"] == 6
    assert got["assortativity_ppb"] == -1_000_000_000


def test_modularity_two_triangles(spark):
    from iowa_liquor_sales_spark.operators.graph import modularity_q

    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    edges = spark.createDataFrame(tri, ["src", "dst"])
    labels = spark.createDataFrame(
        [(n, 0 if n < 3 else 1) for n in range(6)], ["node", "community"]
    )
    got = modularity_q(edges, labels).head()
    # all edges internal, two equal communities -> Q = 1/2 exactly
    assert (got["m_edges"], got["n_communities"]) == (6, 2)
    assert got["q_ppm"] == 500_000


def test_cohens_kappa_textbook_case(spark):
    from iowa_liquor_sales_spark.operators.quality import cohens_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    got = cohens_kappa(
        spark.createDataFrame(rows, ["ra", "rb"]), "ra", "rb"
    ).head()
    # po = .7, pe = .5 -> kappa = .4
    assert got["n"] == 50
    assert got["po_ppm"] == 700_000
    assert got["pe_ppm"] == 500_000
    assert got["kappa_ppm"] == 400_000


def test_mcc_matches_python_mirror(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import mcc_binary

    tp, fp, tn, fn = 7, 2, 5, 3
    rows = (
        [(True, True)] * tp + [(False, True)] * fp
        + [(False, False)] * tn + [(True, False)] * fn
    )
    got = mcc_binary(
        spark.createDataFrame(rows, ["y", "p"]), "y", "p"
    ).head()
    assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (tp, fp, tn, fn)
    exp = math.floor(
        (tp * tn - fp * fn)
        / math.sqrt(tp + fp) / math.sqrt(tp + fn)
        / math.sqrt(tn + fp) / math.sqrt(tn + fn)
        * 1e9
    )
    assert got["mcc_ppb"] == exp

    # degenerate marginal -> defined as 0
    allpos = spark.createDataFrame(
        [(True, True), (False, True)], ["y", "p"]
    )
    assert mcc_binary(allpos, "y", "p").head()["mcc_ppb"] == 0


def test_theil_u_determined_and_mirror(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import theil_u

    # y fully determines x -> H(x|y) = 0 -> U = 1
    det = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], ["x", "y"]
    )
    got = theil_u(det, "x", "y").head()
    assert got["hxy_e9"] == 0 and got["u_ppm"] == 1_000_000

    # python mirror on an asymmetric table
    rows = [("a", 1)] * 3 + [("b", 1)] * 1 + [("a", 2)] * 1 + [("b", 2)] * 3
    got = theil_u(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).head()
    n = 8
    hx = sum(
        round(1e9 * (c / n) * math.log(n / c)) for c in (4, 4)
    )
    hxy = sum(
        round(1e9 * (c / n) * math.log(ny / c))
        for c, ny in ((3, 4), (1, 4), (1, 4), (3, 4))
    )
    assert got["hx_e9"] == hx and got["hxy_e9"] == hxy
    assert got["u_ppm"] == (hx - hxy) * 1_000_000 // hx


def test_max_drawdown_hand_series(spark):
    from iowa_liquor_sales_spark.operators.temporal import max_drawdown

    rows = [("a", i, i, v) for i, v in enumerate([5, -3, 2, -6, 10])]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "v"])
    got = max_drawdown(df, "k", "ts", "v", tie_col="eid").head()
    # cum = 5,2,4,-2,8; peaks = 5,5,5,5,8; dd = 0,3,1,7,0
    assert got["n_points"] == 5
    assert got["max_drawdown"] == 7


def test_decayed_topk_halving(spark):
    import datetime

    from iowa_liquor_sales_spark.operators.temporal import decayed_topk

    t0 = datetime.datetime(2024, 1, 8)
    rows = [
        ("A", t0, 1.00),
        ("B", t0 - datetime.timedelta(days=7), 1.00),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "value"])
    got = decayed_topk(df, "u", "ts", "value", half_life_days=7, k=5)
    out = {r["key"]: r["score_e6"] for r in got.collect()}
    # age 0 -> 100 cents * 1e4 = 1e6; one half-life -> exactly half
    assert out["A"] == 1_000_000
    assert out["B"] == 500_000


def test_cronbach_alpha_perfect_and_mirror(spark):
    from iowa_liquor_sales_spark.operators.quality import cronbach_alpha

    # two identical items -> alpha exactly 1
    df = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["i1", "i2"])
    assert cronbach_alpha(df, ["i1", "i2"]).head()["alpha_ppm"] == 1_000_000

    # integer mirror on a hand table (k=2): alpha =
    # k/(k-1) * (V - sum v_i)/V with v = n*sum(x^2) - (sum x)^2
    rows = [(1, 2), (2, 1), (3, 4), (4, 3)]
    got = cronbach_alpha(
        spark.createDataFrame(rows, ["i1", "i2"]), ["i1", "i2"]
    ).head()
    n = 4
    xs1 = [r[0] for r in rows]
    xs2 = [r[1] for r in rows]
    ts = [a + b for a, b in rows]
    v1 = n * sum(x * x for x in xs1) - sum(xs1) ** 2
    v2 = n * sum(x * x for x in xs2) - sum(xs2) ** 2
    V = n * sum(t * t for t in ts) - sum(ts) ** 2
    exp = 2 * (V - (v1 + v2)) * 1_000_000 // (1 * V)
    assert got["alpha_ppm"] == exp


def test_dedup_cascade_funnel(spark):
    from iowa_liquor_sales_spark.operators.curation import (
        dedup_cascade_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d"),        # exact dup of 1
            (3, "A b, c d"),       # normalized dup of 1
            (4, "a b c d e"),      # near-dup of 1 (jaccard 2/3)
            (5, "x y z w"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["stage"]: r
        for r in dedup_cascade_report(docs, max_df=10).collect()
    }
    assert (got["exact"]["n_in"], got["exact"]["n_out"]) == (5, 4)
    assert (got["normalized"]["n_in"], got["normalized"]["n_out"]) == (4, 3)
    assert (got["neardup"]["n_in"], got["neardup"]["n_out"]) == (3, 2)
    assert got["neardup"]["removed"] == 1


def test_sax_words_hand_series(spark):
    from iowa_liquor_sales_spark.operators.temporal import sax_words

    vals = [0, 0, 10, 10, 20, 20, 30, 30]
    rows = [("a", i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "c"])
    got = sax_words(
        df, "k", "ts", "c", w=8, alphabet=4, tie_col="eid"
    ).head()
    # n == w -> one point per segment; equal-width bins over [0, 30]
    assert got["n_points"] == 8
    assert got["sax_word"] == "aabbccdd"

    # short series: 4 points spread over 8 segments -> 4-letter word
    short = spark.createDataFrame(
        [("b", i, i, v) for i, v in enumerate([5, 5, 5, 5])],
        ["k", "ts", "eid", "c"],
    )
    got = sax_words(
        short, "k", "ts", "c", w=8, alphabet=4, tie_col="eid"
    ).head()
    # flat series -> all lowest symbol
    assert got["sax_word"] == "aaaa"


def test_lift_table_hand_values(spark):
    from iowa_liquor_sales_spark.operators.quality import lift_table

    # scores 10..1; the top five are the positives
    rows = [(i, 10 - i, i < 5) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "score", "y"])
    got = {
        r["bin"]: r
        for r in lift_table(df, "score", "y", "id", n_bins=10).collect()
    }
    assert len(got) == 10 and all(got[b]["n"] == 1 for b in range(10))
    # top decile: 1 of 5 positives captured, lift = (1*10)/(1*5) = 2x
    assert got[0]["gain_ppm"] == 200_000
    assert got[0]["lift_ppm"] == 2_000_000
    # after five deciles every positive is captured
    assert got[4]["gain_ppm"] == 1_000_000
    assert got[9]["cum_pos"] == 5 and got[9]["lift_ppm"] == 1_000_000


def test_ece_perfect_and_skewed(spark):
    from iowa_liquor_sales_spark.operators.quality import (
        expected_calibration_error,
    )

    # scores pinned to the bin edges with matching positive rates:
    # score smax for positives, 0 for negatives -> |pr - ms| = 0 in
    # both occupied bins -> ECE 0
    rows = [(10, True)] * 4 + [(0, False)] * 6
    got = expected_calibration_error(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y", n_bins=10
    ).head()
    assert got["n_bins_used"] == 2 and got["n"] == 10
    # bin 9: pr 1e6, ms = 10*1e6/(1*10... ) mean score ppm = smax/smax
    assert got["ece_ppm"] == 0

    # anti-calibrated: high scores all negative, low all positive
    rows = [(10, False)] * 5 + [(0, True)] * 5
    got = expected_calibration_error(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y", n_bins=10
    ).head()
    assert got["ece_ppm"] == 1_000_000


def test_oov_rate_hand_split(spark):
    from iowa_liquor_sales_spark.operators.text import oov_rate
    from iowa_liquor_sales_spark.operators.sampling import hash_split

    rows = [(i, "alpha beta gamma" if i % 2 else "alpha delta")
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in oov_rate(df).collect()}
    # mirror the split to find the eval docs, then check each eval
    # doc's OOV count against the train vocabulary computed in python
    split = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df, "doc_id", {"train": 0.8, "eval": 0.2}, salt="oov"
        ).collect()
    }
    train_vocab = set()
    for i, text in rows:
        if split[i] == "train":
            train_vocab |= set(text.split())
    assert set(got) == {i for i in split if split[i] == "eval"}
    for i, text in rows:
        if split[i] != "eval":
            continue
        toks = text.split()
        oov = sum(1 for t in toks if t not in train_vocab)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_oov"] == oov
        assert got[i]["oov_ppm"] == oov * 1_000_000 // len(toks)


def test_moments_report_hand_values(spark):
    import math

    from iowa_liquor_sales_spark.operators.aggregates import moments_report

    df = spark.createDataFrame([(v,) for v in (1, 2, 3, 4, 5)], ["x"])
    got = moments_report(df, "x").head()
    # mean 3, population var 2, symmetric -> skew 0
    assert got["n"] == 5
    assert got["mean_milli"] == 3000
    assert got["var_milli"] == 2000
    assert got["skew_e6"] == 0
    # double mirror of the fixed-shape kurtosis finish: C/A/A - 3
    A, C = 50.0, 4250.0
    assert got["kurt_e6"] == math.floor((C / A / A - 3.0) * 1e6)

    # constant column -> A = 0 -> both shape stats defined as 0
    flat = spark.createDataFrame([(7,)] * 4, ["x"])
    g = moments_report(flat, "x").head()
    assert (g["var_milli"], g["skew_e6"], g["kurt_e6"]) == (0, 0, 0)


def test_mantel_haenszel_single_and_pooled(spark):
    from iowa_liquor_sales_spark.operators.quality import mantel_haenszel_or

    def rows(s, a, b, c, d):
        return (
            [(s, True, True)] * a + [(s, True, False)] * b
            + [(s, False, True)] * c + [(s, False, False)] * d
        )

    # single stratum: OR = (10*8)/(5*4) = 4; mirror the e6 rounding
    df = spark.createDataFrame(rows("s1", 10, 5, 4, 8), ["s", "e", "o"])
    got = mantel_haenszel_or(df, "s", "e", "o").head()
    tn = round(1e6 * 80 / 27)
    td = round(1e6 * 20 / 27)
    assert got["n_strata"] == 1
    assert (got["num_e6"], got["den_e6"]) == (tn, td)
    assert got["or_mh_ppm"] == tn * 1_000_000 // td

    # two strata with identical tables pool to the same OR
    df2 = spark.createDataFrame(
        rows("s1", 10, 5, 4, 8) + rows("s2", 10, 5, 4, 8),
        ["s", "e", "o"],
    )
    got2 = mantel_haenszel_or(df2, "s", "e", "o").head()
    assert got2["n_strata"] == 2
    assert got2["or_mh_ppm"] == got["or_mh_ppm"]


def test_ljung_box_white_vs_trending(spark):
    from iowa_liquor_sales_spark.operators.temporal import ljung_box

    # strongly trending series -> rho_k ~ 1 -> large Q; alternating
    # high-low series -> rho_1 ~ -1 -> also large Q; a hash-scrambled
    # series -> small Q. Check ordering rather than magic constants.
    import random

    rng = random.Random(7)
    trend = [("t", i, float(i)) for i in range(60)]
    noise = [("n", i, float(rng.randint(0, 100))) for i in range(60)]
    df = spark.createDataFrame(trend + noise, ["k", "o", "value"])
    got = {r["k"]: r["q_ppm"] for r in ljung_box(df, "k", "o", "value").collect()}
    assert got["t"] > got["n"]
    # trending series: rho ~ 1 at all 3 lags -> Q near n(n+2)*3/n ~ 186
    assert got["t"] > 100_000_000  # Q > 100 in ppm terms


def test_lorenz_deciles_uniform_and_concentrated(spark):
    from iowa_liquor_sales_spark.operators.aggregates import lorenz_deciles

    # equal masses -> deciles each carry exactly 10%
    eq = spark.createDataFrame([(i, 5) for i in range(100)], ["id", "v"])
    got = {r["bin"]: r for r in lorenz_deciles(eq, "v", "id").collect()}
    assert got[0]["cum_share_ppm"] == 100_000
    assert got[9]["cum_share_ppm"] == 1_000_000

    # one giant holder: bottom 9 deciles carry 90 of 1090 mass
    conc = spark.createDataFrame(
        [(i, 1) for i in range(99)] + [(99, 991)], ["id", "v"]
    )
    got = {r["bin"]: r for r in lorenz_deciles(conc, "v", "id").collect()}
    assert got[8]["cum_share_ppm"] == 90 * 1_000_000 // 1090
    assert got[9]["cum_share_ppm"] == 1_000_000


def test_logrank_mirror_and_identical_groups(spark):
    from iowa_liquor_sales_spark.operators.quality import logrank_test

    # identical survival experience in both groups -> O = E -> z = 0
    # (numerator terms cancel exactly on the grid: equal group sizes
    # and equal event patterns give O1 = O/2 = O*N1/N)
    same = [(t, 1, g) for g in (0, 1) for t in (1, 2, 3, 4)]
    df = spark.createDataFrame(same, ["t", "e", "g"])
    got = logrank_test(df, "t", "e", "g").head()
    assert got["s_e6"] == 0 and got["z_ppm"] == 0

    # hand data, python mirror with the identical op order
    rows = [(1, 1, 1), (2, 1, 1), (3, 1, 1), (2, 1, 0), (3, 1, 0), (4, 1, 0)]
    got = logrank_test(
        spark.createDataFrame(rows, ["t", "e", "g"]), "t", "e", "g"
    ).head()
    import math

    def at_risk(g, t):
        return sum(1 for tt, _, gg in rows if gg == g and tt >= t)

    s_e6 = v_e6 = 0
    n_times = 0
    for t in sorted({t for t, _, _ in rows}):
        o1 = sum(1 for tt, e, gg in rows if tt == t and gg == 1 and e)
        o0 = sum(1 for tt, e, gg in rows if tt == t and gg == 0 and e)
        ot = o1 + o0
        n1 = float(at_risk(1, t))
        nt = float(at_risk(1, t) + at_risk(0, t))
        if ot <= 0 or nt <= 1:
            continue
        n_times += 1
        s_e6 += round(1e6 * (float(o1) - float(ot) * n1 / nt))
        v_e6 += round(
            1e6 * float(ot) * (n1 / nt) * (1.0 - n1 / nt)
            * (nt - float(ot)) / (nt - 1.0)
        )
    assert got["n_event_times"] == n_times
    assert got["s_e6"] == s_e6 and got["v_e6"] == v_e6
    assert got["z_ppm"] == math.floor(s_e6 * 1e3 / math.sqrt(v_e6))


def test_by_fdr_more_conservative_than_bh(spark):
    from iowa_liquor_sales_spark.operators.quality import bh_fdr, by_fdr

    # planted signal: 3 tiny p-values among 20; BY must reject a
    # SUBSET of BH's rejections (c(m) > 1 shrinks every threshold)
    ps = [1000, 2000, 3000] + [800_000 + i * 9000 for i in range(17)]
    hyp = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], ["id", "p_ppm"]
    )
    bh = {r["id"]: r["reject"] for r in bh_fdr(hyp, "id").collect()}
    by = {r["id"]: r["reject"] for r in by_fdr(hyp, "id").collect()}
    assert any(bh.values())
    assert all(bh[i] for i in by if by[i])  # BY ⊆ BH
    # exact threshold mirror: c(20) on the 1e9 grid
    c_e9 = sum(1_000_000_000 // j for j in range(1, 21))
    m = 20
    expect = set()
    ranked = sorted((p, i) for i, p in enumerate(ps))
    cutoff = 0
    for rnk, (p, i) in enumerate(ranked, start=1):
        if p * m * c_e9 <= rnk * 100_000 * 1_000_000_000:
            cutoff = rnk
    for rnk, (p, i) in enumerate(ranked, start=1):
        if rnk <= cutoff:
            expect.add(i)
    assert {i for i in by if by[i]} == expect


def test_lsh_band_plan_known_thresholds(spark):
    import math

    from iowa_liquor_sales_spark.operators.dedup import lsh_band_plan

    got = {
        r["bands"]: r
        for r in lsh_band_plan(spark, 128, 500_000).collect()
    }
    # all 8 divisor factorizations of 128 present
    assert set(got) == {1, 2, 4, 8, 16, 32, 64, 128}
    for b, r in got.items():
        exp = math.floor((1.0 / b) ** (1.0 / r["rows_per_band"]) * 1e6)
        assert r["threshold_ppm"] == exp
    # exactly one recommendation, at the argmin |threshold - 0.5e6|
    recs = [b for b, r in got.items() if r["recommended"]]
    best = min(
        got, key=lambda b: (abs(got[b]["threshold_ppm"] - 500_000), b)
    )
    assert recs == [best]


def test_quadratic_fit_recovers_exact_polynomial(spark):
    from iowa_liquor_sales_spark.operators.aggregates import quadratic_fit

    # exact quadratic: y = 7 + 3x + 2x² (integer grid, no noise)
    rows = [(x, 7 + 3 * x + 2 * x * x) for x in range(50)]
    got = quadratic_fit(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert got["n"] == 50
    assert abs(got["b0_ppm"] - 7_000_000) <= 1
    assert abs(got["b1_ppm"] - 3_000_000) <= 1
    assert abs(got["b2_ppm"] - 2_000_000) <= 1
    # pure line: curvature term vanishes
    lin = [(x, 10 * x + 1) for x in range(50)]
    g2 = quadratic_fit(
        spark.createDataFrame(lin, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert abs(g2["b2_ppm"]) <= 1 and abs(g2["b1_ppm"] - 10_000_000) <= 1


def test_hill_tail_index_recovers_pareto_alpha(spark):
    import math
    import random

    from iowa_liquor_sales_spark.operators.aggregates import hill_tail_index

    rng = random.Random(31)
    # Pareto(alpha=2): x = xm / u^(1/alpha), gridded to integers
    alpha = 2.0
    xs = [int(1000 / (rng.random() ** (1 / alpha))) for _ in range(20_000)]
    got = hill_tail_index(
        spark.createDataFrame([(x,) for x in xs], ["v"]), "v", k=500
    ).collect()[0]
    assert got["k"] == 500
    # Hill on 500 tail points: alpha_hat within ~15% of truth
    assert abs(got["alpha_ppm"] / 1e6 - alpha) < 0.35
    # exact contract: matches the direct top-k computation on the grid
    top = sorted(xs, reverse=True)[:500]
    xk = top[-1]
    slr = sum(math.floor((math.log(x) - math.log(xk)) * 1e6) for x in top)
    assert got["alpha_ppm"] == (500 * 1_000_000 * 1_000_000) // slr


def test_knee_point_finds_the_elbow(spark):
    from iowa_liquor_sales_spark.operators.aggregates import knee_point

    # classic saturating curve: steep then flat; knee at the bend
    pts = [(1, 10), (2, 55), (3, 80), (4, 90), (5, 94), (6, 96),
           (7, 97), (8, 98)]
    got = knee_point(
        spark.createDataFrame(pts, ["x", "y"]), "x", "y"
    ).collect()[0]
    # exhaustive check of the normalized difference
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    dx, dy = max(xs) - min(xs), max(ys) - min(ys)
    scores = [((y - min(ys)) * dx - (x - min(xs)) * dy, -x, x, y)
              for x, y in pts]
    best = max(scores)
    assert (got["knee_x"], got["knee_y"]) == (best[2], best[3])
    assert got["knee_x"] == 3  # the visible elbow


def test_global_cumsum_multi_column_matches_single(spark):
    # Round-10 internals change: global_cumsum accepts parallel
    # value/out column lists and must produce the SAME longs as two
    # independent single-column invocations over the same order key.
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.ranking import global_cumsum

    df = spark.range(0, 503).select(
        (F.col("id") * 5227 % 503).alias("v"),
        (F.col("id") % 7 + 1).alias("a"),
        (F.col("id") % 11 + 1).alias("b"),
    )
    both = global_cumsum(
        df, ["v"], ["a", "b"], out_col=["ca", "cb"], num_partitions=8
    ).select("v", "ca", "cb")
    sa = global_cumsum(df, ["v"], "a", out_col="ca", num_partitions=8)
    sb = global_cumsum(df, ["v"], "b", out_col="cb", num_partitions=8)
    ref = sa.select("v", "ca").join(sb.select("v", "cb"), "v")
    assert both.count() == 503
    diff = both.join(ref, "v").filter(
        (both["ca"] != ref["ca"]) | (both["cb"] != ref["cb"])
    )
    assert diff.count() == 0
    # mismatched list lengths are rejected, not silently zipped
    import pytest as _pytest

    with _pytest.raises(ValueError):
        global_cumsum(df, ["v"], ["a", "b"], out_col="only_one")


def test_logrank_single_group_degenerate_contract(spark):
    # Round-10 internals change: the at-risk machinery moved from a
    # dense two-group grid join to a pivot + descending cumulative
    # window. A degenerate single-group input must still yield ZERO
    # per-time rows (the old inner join's contract): n_event_times = 0
    # and null pooled sums.
    from iowa_liquor_sales_spark.operators.quality import logrank_test

    one_group = spark.createDataFrame(
        [(3, True, True), (5, False, True), (3, True, True)],
        "t long, e boolean, g boolean",
    )
    row = logrank_test(one_group, "t", "e", "g").first()
    assert row["n_event_times"] == 0
    assert row["o1_total"] is None
    assert row["s_e6"] is None

    # sanity: with both groups present the pivot path produces rows
    both = spark.createDataFrame(
        [(3, True, True), (3, True, False), (5, False, True),
         (5, True, False), (4, True, True)],
        "t long, e boolean, g boolean",
    )
    r2 = logrank_test(both, "t", "e", "g").first()
    assert r2["n_event_times"] >= 1
    assert r2["o1_total"] is not None


def test_spearman_pair_weighted_contracts(spark):
    # Round-10 internals change: spearman_corr aggregates to the
    # O(distinct (x,y) pairs) relation and weights every moment by the
    # pair count. Duplicated rows must therefore contribute exactly as
    # in the row-level form, and an EMPTY input keeps n = 0 (not NULL).
    from iowa_liquor_sales_spark.operators.aggregates import spearman_corr

    base = spark.createDataFrame(
        [(1, 10), (2, 30), (2, 30), (3, 20), (4, 40), (4, 40), (4, 40)],
        "x long, y long",
    )
    got = spearman_corr(base, "x", "y").first()
    assert got["n"] == 7
    # the (3,20) inversion plus ties keep rho strictly inside (0, 1e9)
    assert 0 < got["spearman_ppb"] < 10**9
    # duplicate-collapsing sanity: tripling every row rescales n but
    # leaves the rank correlation IDENTICAL (pair weights carry it)
    tripled = base.unionAll(base).unionAll(base)
    got3 = spearman_corr(tripled, "x", "y").first()
    assert got3["n"] == 21
    empty = spark.createDataFrame([], "x long, y long")
    erow = spearman_corr(empty, "x", "y").first()
    assert erow["n"] == 0
    assert erow["spearman_ppb"] is None
