

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


def test_kendall_tau_b_matches_bruteforce(spark):
    from iowa_liquor_sales_spark.operators.aggregates import kendall_tau_b

    import math
    import random

    rng = random.Random(7)
    rows = [(rng.randint(0, 5), rng.randint(0, 3)) for _ in range(120)]
    got = kendall_tau_b(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    c = d = tx = ty = 0
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = rows[i], rows[j]
            if x1 == x2:
                tx += 1
                if y1 == y2:
                    ty += 1
                continue
            if y1 == y2:
                ty += 1
                continue
            if (x1 < x2) == (y1 < y2):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    # brute tx counts pairs tied on x (incl. both-tied); the operator's
    # marginal form is the same quantity
    tau = (c - d) / math.sqrt(n0 - tx) / math.sqrt(n0 - ty)
    assert got["n"] == n
    assert got["concordant"] == c and got["discordant"] == d
    assert got["tau_b_ppb"] == math.floor(tau * 1e9)


def test_wasserstein_1d_exact_small_case(spark):
    from iowa_liquor_sales_spark.operators.quality import wasserstein_1d

    # a: {0, 4}, b: {2}: |Fa-Fb| is 1/2 on [0,2), 1/2 on [2,4) -> W1 = 2
    rows = [(0, "a"), (4, "a"), (2, "b")]
    got = wasserstein_1d(
        spark.createDataFrame(rows, ["v", "g"]), "v", "g", "a", "b"
    ).collect()[0]
    assert (got["n_a"], got["n_b"]) == (2, 1)
    assert got["w1_ppm"] == 2_000_000
    # shifting one distribution by delta adds exactly delta
    rows2 = [(v + (10 if g == "b" else 0), g) for v, g in rows]
    got2 = wasserstein_1d(
        spark.createDataFrame(rows2, ["v", "g"]), "v", "g", "a", "b"
    ).collect()[0]
    assert got2["w1_ppm"] == 10_000_000


def test_effect_sizes_match_numpy(spark):
    import math
    import random

    from iowa_liquor_sales_spark.operators.quality import effect_sizes

    rng = random.Random(3)
    a = [rng.randint(100, 200) for _ in range(60)]
    b = [rng.randint(120, 260) for _ in range(40)]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    got = effect_sizes(
        spark.createDataFrame(rows, ["v", "g"]), "v", "g", "a", "b"
    ).collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(x * x for x in a) - sum(a) ** 2 / na) / (na - 1)
    vb = (sum(x * x for x in b) - sum(b) ** 2 / nb) / (nb - 1)
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    dd = (ma - mb) / sp
    gg = dd * (1 - 3 / (4 * (na + nb) - 9))
    assert abs(got["cohens_d_ppm"] / 1e6 - dd) < 2e-6
    assert abs(got["hedges_g_ppm"] / 1e6 - gg) < 2e-6
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    assert abs(got["cliffs_delta_ppm"] / 1e6 - (gt - lt) / (na * nb)) < 2e-6


def test_cochran_armitage_detects_trend_direction(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import cochran_armitage

    # rate rises with dose 1->3: strong positive trend
    rows = (
        [(1, True)] * 5 + [(1, False)] * 45
        + [(2, True)] * 20 + [(2, False)] * 30
        + [(3, True)] * 40 + [(3, False)] * 10
    )
    got = cochran_armitage(
        spark.createDataFrame(rows, ["dose", "y"]), "dose", "y"
    ).collect()[0]
    assert got["n"] == 150 and got["n_pos"] == 65
    # hand-computed: N=150 R=65, wr = 5+40+120=165, wn=50+100+150=300,
    # wwn=50+200+450=700
    num = 150 * 165 - 65 * 300
    rad = 65 * 85 * (150 * 700 - 300 * 300) / 149
    z = num / math.sqrt(rad)
    assert got["z_ppm"] == math.floor(z * 1e6)
    assert got["z_ppm"] > 5_000_000  # overwhelmingly significant
    # flat rates: |z| small
    flat = [(d, i % 2 == 0) for d in (1, 2, 3) for i in range(50)]
    z0 = cochran_armitage(
        spark.createDataFrame(flat, ["dose", "y"]), "dose", "y"
    ).collect()[0]["z_ppm"]
    assert abs(z0) < 1_000_000


def test_mcnemar_pure_integer_statistic(spark):
    from iowa_liquor_sales_spark.operators.quality import mcnemar_test

    # truth all True; A right on 30+10, B right on 30+5:
    # b10 (A only) = 10, b01 (B only) = 5
    rows = (
        [(True, True, True)] * 30
        + [(True, True, False)] * 10
        + [(True, False, True)] * 5
        + [(True, False, False)] * 3
    )
    got = mcnemar_test(
        spark.createDataFrame(rows, ["y", "pa", "pb"]), "y", "pa", "pb"
    ).collect()[0]
    assert (got["a_only_correct"], got["b_only_correct"]) == (10, 5)
    assert got["chi2_ppm"] == (5 * 5 * 1_000_000) // 15
    # identical predictors: zero discordance, zero statistic
    same = mcnemar_test(
        spark.createDataFrame(rows, ["y", "pa", "pb"]), "y", "pa", "pa"
    ).collect()[0]
    assert same["chi2_ppm"] == 0


def test_randomization_test_separates_null_from_shift(spark):
    from iowa_liquor_sales_spark.operators.quality import randomization_test

    # identical distributions: p should be comfortably non-tiny
    null_rows = [(i, 100 + (i % 7), "a" if i % 2 == 0 else "b")
                 for i in range(200)]
    p_null = randomization_test(
        spark.createDataFrame(null_rows, ["id", "v", "g"]),
        "v", "g", "a", "b", id_col="id", n_reps=50,
    ).collect()[0]
    assert p_null["p_ppm"] > 100_000  # > 0.1
    # massive shift: no replicate should reach it -> p = 1/51
    shift_rows = [(i, (1000 if i % 2 == 0 else 100) + i % 5,
                   "a" if i % 2 == 0 else "b") for i in range(200)]
    p_shift = randomization_test(
        spark.createDataFrame(shift_rows, ["id", "v", "g"]),
        "v", "g", "a", "b", id_col="id", n_reps=50,
    ).collect()[0]
    assert p_shift["n_exceed"] == 0
    assert p_shift["p_ppm"] == 1_000_000 // 51


def test_dp_noisy_mean_deterministic_and_clipped(spark):
    from iowa_liquor_sales_spark.operators.quality import dp_noisy_mean

    rows = [("g1", v) for v in range(0, 100)] + [("g2", 10_000)] * 50
    df = spark.createDataFrame(rows, ["grp", "v"])
    out1 = {r["grp"]: r for r in dp_noisy_mean(
        df, ["grp"], "v", clip_lo=0, clip_hi=200, epsilon=1.0
    ).collect()}
    out2 = {r["grp"]: r for r in dp_noisy_mean(
        df, ["grp"], "v", clip_lo=0, clip_hi=200, epsilon=1.0
    ).collect()}
    for g in out1:
        assert out1[g]["noisy_mean_ppm"] == out2[g]["noisy_mean_ppm"]
    # g2's raw mean is 10000 but the clip pins it near 200: the release
    # must reflect the clipped sensitivity bound, not the raw outliers
    assert out1["g2"]["noisy_mean_ppm"] < 250 * 1_000_000
    # g1 mean ~49.5; Laplace(400/n) noise keeps the release in range
    assert 0 < out1["g1"]["noisy_mean_ppm"] < 100 * 1_000_000


def test_holm_step_down_stops_at_first_failure(spark):
    """Holm signature: rank 2 fails its alpha/(m-1) threshold, so rank 3
    is NOT rejected even though it would pass its own alpha/(m-2) bar —
    the step-down mirror of BH's interior rescue."""
    from iowa_liquor_sales_spark.operators.quality import holm_bonferroni

    # m=4, alpha=100000: thresholds 25000, 33333, 50000, 100000
    rows = [("a", 10_000), ("b", 40_000), ("c", 45_000), ("d", 900_000)]
    df = spark.createDataFrame(rows, ["test_id", "p_ppm"])
    got = {
        r["id"]: (r["rnk"], r["reject"])
        for r in holm_bonferroni(
            df, "test_id", alpha_ppm=100_000
        ).collect()
    }
    # rank1 10000*4=40000<=100000 ok; rank2 40000*3=120000>100000 FAIL
    # -> stop at rank 2; rank3 45000*2=90000 would pass but is retained
    assert got == {
        "a": (1, True),
        "b": (2, False),
        "c": (3, False),
        "d": (4, False),
    }
    # all tiny: everything rejected (stop is NULL)
    tiny = spark.createDataFrame(
        [("x", 1_000), ("y", 2_000)], ["test_id", "p_ppm"]
    )
    out = holm_bonferroni(tiny, "test_id", alpha_ppm=100_000).collect()
    assert all(r["reject"] for r in out)


def test_isotonic_calibration_matches_sequential_pav(spark):
    from iowa_liquor_sales_spark.operators.quality import (
        isotonic_calibration,
    )

    import math
    import random

    rng = random.Random(13)
    # noisy but upward-trending rate over 12 score levels
    rows = []
    for lvl in range(12):
        p = min(0.95, 0.1 + 0.08 * lvl + rng.uniform(-0.15, 0.15))
        for _ in range(40):
            rows.append((lvl, 1 if rng.random() < p else 0))
    got = {
        r["score"]: r["fit_ppm"]
        for r in isotonic_calibration(
            spark.createDataFrame(rows, ["score", "y"]), "score", "y"
        ).collect()
    }
    # classic sequential pool-adjacent-violators reference
    levels = sorted({lvl for lvl, _ in rows})
    blocks = []
    for lvl in levels:
        c = sum(1 for l, _ in rows if l == lvl)
        s = sum(y for l, y in rows if l == lvl)
        blocks.append([s, c, [lvl]])
        while len(blocks) >= 2 and (
            blocks[-2][0] * blocks[-1][1]
            >= blocks[-1][0] * blocks[-2][1]
        ):
            s2, c2, l2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += c2
            blocks[-1][2].extend(l2)
    want = {}
    for s, c, ls in blocks:
        for lvl in ls:
            want[lvl] = math.floor(s / c * 1e6)
    assert got == want
    # monotone non-decreasing by construction
    fits = [got[lvl] for lvl in levels]
    assert fits == sorted(fits)


def test_auc_delong_ci_matches_reference(spark):
    """DeLong placement-variance reference computed directly from the
    per-observation placements on a small quantized sample."""
    from iowa_liquor_sales_spark.operators.quality import auc_delong_ci

    import math
    import random

    rng = random.Random(17)
    rows = [(rng.randint(0, 20) + (4 if rng.random() < 0.5 else 0),
             rng.random() < 0.5) for _ in range(300)]
    # make the score informative: positives shifted up
    rows = [(s + (6 if y else 0), y) for s, y in rows]
    got = auc_delong_ci(
        spark.createDataFrame(rows, ["score", "y"]), "score", "y"
    ).collect()[0]
    pos = sorted(s for s, y in rows if y)
    neg = sorted(s for s, y in rows if not y)
    npos, nneg = len(pos), len(neg)

    def frac_below(xs, v):  # (below + 0.5*tied)
        lo = sum(1 for x in xs if x < v)
        tie = sum(1 for x in xs if x == v)
        return lo + 0.5 * tie

    v10 = [frac_below(neg, p) / nneg for p in pos]
    v01 = [(npos - frac_below(pos, nv) - 0) / npos for nv in neg]
    # v01 = fraction of positives ABOVE + half ties
    v01 = [
        (sum(1 for p in pos if p > nv) + 0.5 * sum(1 for p in pos if p == nv))
        / npos
        for nv in neg
    ]
    auc = sum(v10) / npos
    s10 = sum((v - auc) ** 2 for v in v10) / (npos - 1)
    s01 = sum((v - auc) ** 2 for v in v01) / (nneg - 1)
    se = math.sqrt(s10 / npos + s01 / nneg)
    assert got["n_pos"] == npos and got["n_neg"] == nneg
    assert abs(got["auc_ppm"] - math.floor(auc * 1e6)) <= 1
    assert abs(got["se_ppm"] - math.floor(se * 1e6)) <= 1
    assert got["lo_ppm"] <= got["auc_ppm"] <= got["hi_ppm"]


def test_diff_in_diff_nets_out_trend_and_group_effect(spark):
    import math
    import random

    from iowa_liquor_sales_spark.operators.quality import diff_in_diff

    rng = random.Random(29)
    rows = []
    # control: base 100, +20 time trend; treated: base 150 (+group
    # effect), +20 trend, +30 TRUE treatment effect in post
    for i in range(400):
        arm = i % 2
        post = (i // 2) % 2
        base = 100 + 50 * arm + 20 * post + 30 * arm * post
        rows.append((arm, post, base + rng.uniform(-5, 5)))
    got = diff_in_diff(
        spark.createDataFrame(rows, ["arm", "post", "v"]),
        "arm", "post", "v", value_scale=100,
    ).collect()[0]
    # estimate recovers ~30 (scaled by 100 -> 3000 cents, ppm of cents)
    assert abs(got["did_ppm"] / 1e6 - 3000) < 150
    assert got["z_ppm"] > 5_000_000  # decisive
    # no treatment effect: estimate near zero, z small
    null_rows = [
        (i % 2, (i // 2) % 2,
         100 + 50 * (i % 2) + 20 * ((i // 2) % 2) + rng.uniform(-5, 5))
        for i in range(400)
    ]
    g0 = diff_in_diff(
        spark.createDataFrame(null_rows, ["arm", "post", "v"]),
        "arm", "post", "v", value_scale=100,
    ).collect()[0]
    assert abs(g0["did_ppm"] / 1e6) < 150
    assert abs(g0["z_ppm"]) < 3_000_000
    del math


def test_sprt_monitor_crosses_correct_boundary(spark):
    from iowa_liquor_sales_spark.operators.quality import sprt_monitor

    import datetime

    # H0 p=0.2 vs H1 p=0.4; feed a stream at 40%: must reject H0
    rows = []
    for d in range(10):
        for i in range(50):
            rows.append(
                (datetime.datetime(2024, 3, 1 + d, 12), i % 5 < 2)
            )
    out = sprt_monitor(
        spark.createDataFrame(rows, ["ts", "y"]),
        "ts", "y", p0_ppm=200_000, p1_ppm=400_000,
    ).orderBy("day").collect()
    assert out[-1]["decision"] == "reject_h0"
    # the LLR walk is monotone here; once crossed it stays crossed
    crossed = [r["decision"] == "reject_h0" for r in out]
    assert crossed == sorted(crossed)
    # a 20% stream accepts H0
    rows0 = [
        (datetime.datetime(2024, 3, 1 + d, 12), i % 5 == 0)
        for d in range(10) for i in range(50)
    ]
    out0 = sprt_monitor(
        spark.createDataFrame(rows0, ["ts", "y"]),
        "ts", "y", p0_ppm=200_000, p1_ppm=400_000,
    ).orderBy("day").collect()
    assert out0[-1]["decision"] == "accept_h0"


def test_best_f1_threshold_matches_exhaustive_sweep(spark):
    from iowa_liquor_sales_spark.operators.quality import best_f1_threshold

    import random

    rng = random.Random(43)
    rows = [(s + (5 if y else 0), y)
            for s, y in ((rng.randint(0, 15), rng.random() < 0.4)
                         for _ in range(400))]
    got = best_f1_threshold(
        spark.createDataFrame(rows, ["score", "y"]), "score", "y"
    ).collect()[0]
    # exhaustive python sweep over distinct thresholds
    best = None
    for t in sorted({s for s, _ in rows}, reverse=True):
        tp = sum(1 for s, y in rows if s >= t and y)
        fp = sum(1 for s, y in rows if s >= t and not y)
        fn = sum(1 for s, y in rows if s < t and y)
        f1 = 2 * tp / (2 * tp + fp + fn)
        if best is None or f1 > best[0] or (f1 == best[0] and t > best[1]):
            best = (f1, t, tp, fp, fn)
    assert got["threshold"] == best[1]
    assert (got["tp"], got["fp"], got["fn"]) == best[2:]
    assert got["f1_ppm"] == (2 * best[2] * 1_000_000) // (
        2 * best[2] + best[3] + best[4]
    )


def test_conformal_interval_hits_target_coverage(spark):
    from iowa_liquor_sales_spark.operators.quality import conformal_interval

    import random

    rng = random.Random(53)
    # group means 100/200/300 with bounded noise: conformal coverage
    # must be >= target up to finite-sample wobble
    rows = [
        (i, f"g{i % 3}", 100.0 * (i % 3 + 1) + rng.uniform(-20, 20))
        for i in range(3000)
    ]
    got = conformal_interval(
        spark.createDataFrame(rows, ["id", "g", "v"]),
        "id", "g", "v", alpha_ppm=100_000,
    ).collect()[0]
    assert got["n_fit"] + got["n_cal"] + got["n_test"] == 3000
    # split-conformal guarantee: coverage >= 1 - alpha (up to ~2%
    # finite-sample noise on the test half)
    assert got["coverage_ppm"] >= got["target_ppm"] - 20_000
    # the interval is not vacuous: qhat smaller than the full range
    assert 0 < got["qhat"] < 4000  # cents grid, noise span is +-2000


def test_ucb_ranking_prefers_undertried_arms(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import ucb_ranking

    # arm a: mean 10, pulled 1000x; arm b: mean 9.5, pulled 4x —
    # UCB must rank the barely-tried b first
    rows = [("a", 10.0)] * 1000 + [("b", 9.5)] * 4
    out = {r["arm"]: r for r in ucb_ranking(
        spark.createDataFrame(rows, ["arm", "r"]), "arm", "r"
    ).collect()}
    assert out["b"]["rank"] == 1 and out["a"]["rank"] == 2
    # exact replication for arm b
    nn = 1004
    bonus = math.floor(math.sqrt(2 * math.log(nn) / 4) * 100)
    assert out["b"]["ucb_e2"] == 950 + bonus


def test_mde_power_matches_closed_form(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import mde_power

    import random

    rng = random.Random(59)
    rows = [("a", 100 + rng.uniform(-10, 10)) for _ in range(400)] + [
        ("b", 102 + rng.uniform(-10, 10)) for _ in range(500)
    ]
    got = mde_power(
        spark.createDataFrame(rows, ["arm", "v"]), "arm", "v"
    ).collect()[0]
    va = [math.floor(v * 100) for g, v in rows if g == "a"]
    vb = [math.floor(v * 100) for g, v in rows if g == "b"]

    def var(xs):
        n = len(xs)
        return (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)

    zz = (1_959_964 + 841_621) / 1e6
    mde = zz * math.sqrt(var(va) / len(va) + var(vb) / len(vb))
    assert got["mde_e2"] == math.floor(mde)
    # the observed 2-unit (200 e2) gap should exceed the MDE at n=400+
    assert got["mde_e2"] < 200
    mean_pool = (sum(va) + sum(vb)) / 900
    n_need = math.ceil(
        2 * zz * zz * ((var(va) + var(vb)) / 2)
        / (mean_pool * 0.01) ** 2
    )
    assert got["n_per_arm_1pct"] == n_need


def test_two_proportion_z_matches_closed_form(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import two_proportion_z

    rows = [("a", i < 120) for i in range(400)] + [
        ("b", i < 75) for i in range(300)
    ]
    got = two_proportion_z(
        spark.createDataFrame(rows, ["arm", "y"]), "arm", "y"
    ).collect()[0]
    assert (got["n_a"], got["k_a"], got["n_b"], got["k_b"]) == (
        400, 120, 300, 75,
    )
    pa, pb, pp = 120 / 400, 75 / 300, 195 / 700
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 400 + 1 / 300))
    assert got["z_ppm"] == math.floor(z * 1e6)
    assert got["diff_ppm"] == math.floor((pa - pb) * 1e6)


def test_best_gini_split_matches_exhaustive(spark):
    from iowa_liquor_sales_spark.operators.quality import best_gini_split

    import random

    rng = random.Random(61)
    # label mostly turns on above score 10: the stump should find ~10
    rows = [(s, rng.random() < (0.85 if s >= 10 else 0.15))
            for s in (rng.randint(0, 20) for _ in range(600))]
    got = best_gini_split(
        spark.createDataFrame(rows, ["score", "y"]), "score", "y"
    ).collect()[0]
    best = None
    for t in sorted({s for s, _ in rows}, reverse=True):
        lp = sum(1 for s, y in rows if s >= t and y)
        ln = sum(1 for s, y in rows if s >= t and not y)
        rp = sum(1 for s, y in rows if s < t and y)
        rn = sum(1 for s, y in rows if s < t and not y)
        gw = 2.0 * ((lp * ln / (lp + ln) if lp + ln else 0.0)
                    + (rp * rn / (rp + rn) if rp + rn else 0.0))
        if best is None or gw < best[0] or (gw == best[0] and t > best[1]):
            best = (gw, t, lp, ln, rp, rn)
    assert got["threshold"] == best[1]
    assert (got["left_pos"], got["left_neg"]) == (best[2], best[3])
    assert 8 <= got["threshold"] <= 12  # the planted boundary


def test_relative_risk_matches_closed_form(spark):
    import math

    from iowa_liquor_sales_spark.operators.quality import relative_risk

    # exposed: 30/100 events; unexposed: 10/100 -> RR = 3, OR = 3.857
    rows = ([(True, True)] * 30 + [(True, False)] * 70
            + [(False, True)] * 10 + [(False, False)] * 90)
    got = relative_risk(
        spark.createDataFrame(rows, ["e", "y"]), "e", "y"
    ).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (30, 70, 10, 90)
    assert got["rr_ppm"] == 3_000_000
    assert got["or_ppm"] == (30 * 90 * 1_000_000) // (70 * 10)
    zz = 1.959964
    lnrr = math.log(30 * 100 / (10 * 100))
    se = math.sqrt(1 / 30 - 1 / 100 + 1 / 10 - 1 / 100)
    assert got["rr_lo_ppm"] == math.floor(math.exp(lnrr - zz * se) * 1e6)
    assert got["rr_hi_ppm"] == math.floor(math.exp(lnrr + zz * se) * 1e6)
    # a zero cell voids the Wald CI but not the counts
    z0 = relative_risk(
        spark.createDataFrame(
            [(True, True)] * 5 + [(False, False)] * 5, ["e", "y"]
        ),
        "e", "y",
    ).collect()[0]
    assert z0["rr_lo_ppm"] is None and z0["or_hi_ppm"] is None
