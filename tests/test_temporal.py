"""As-of join and bucketed range join: directions, tolerance, outer
semantics, overlapping intervals, and scale-shaped plan properties."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.operators.temporal import asof_join, range_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01 10:00:05"), 100),
            ("A", _ts("2026-01-01 10:00:00"), 99),  # tie with a quote
            ("B", _ts("2026-01-01 10:00:01"), 50),
            ("C", _ts("2026-01-01 10:00:01"), 7),  # no quotes at all
        ],
        ["sym", "t_ts", "qty"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01 10:00:00"), 1.0),
            ("A", _ts("2026-01-01 10:00:03"), 2.0),
            ("A", _ts("2026-01-01 10:00:07"), 3.0),
            ("B", _ts("2026-01-01 10:00:02"), 9.0),  # only AFTER B's trade
        ],
        ["sym", "q_ts", "px"],
    )
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, ["sym"], "t_ts", "q_ts").collect()
    got = {(r["sym"], r["qty"]): r["r_px"] for r in out}
    assert got == {
        ("A", 100): 2.0,  # 10:00:03 is latest <= 10:00:05
        ("A", 99): 1.0,  # equal-time quote matches (inclusive)
        ("B", 50): None,  # only future quotes exist
        ("C", 7): None,  # no quotes for key at all
    }
    assert len(out) == 4  # left-outer: every trade survives exactly once


def test_asof_forward_and_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    fwd = asof_join(trades, quotes, ["sym"], "t_ts", "q_ts", direction="forward")
    got = {(r["sym"], r["qty"]): r["r_px"] for r in fwd.collect()}
    assert got == {
        ("A", 100): 3.0,  # earliest >= 10:00:05
        ("A", 99): 1.0,  # equal time, inclusive
        ("B", 50): 9.0,
        ("C", 7): None,
    }
    tight = asof_join(
        trades, quotes, ["sym"], "t_ts", "q_ts", tolerance_us=1_000_000
    )
    got = {(r["sym"], r["qty"]): r["r_px"] for r in tight.collect()}
    # A@10:00:05's nearest earlier quote (10:00:03) is 2s away -> voided.
    assert got == {("A", 100): None, ("A", 99): 1.0, ("B", 50): None, ("C", 7): None}


def test_asof_plan_single_shuffle(spark):
    trades, quotes = _trades_quotes(spark)
    plan = asof_join(trades, quotes, ["sym"], "t_ts", "q_ts")._jdf.queryExecution().executedPlan().toString()
    # The whole join is one exchange (on the key) + sort + window: no
    # joins, no cartesian products in the physical plan.
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_overlap_and_bounds(spark):
    points = spark.createDataFrame(
        [(i,) for i in [0, 5, 10, 15, 20, 99]], ["x"]
    )
    intervals = spark.createDataFrame(
        [(0, 10), (5, 16), (10, 11), (90, 95)],
        ["lo", "hi"],
    )
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=4)
    got = sorted((r["x"], r["lo"]) for r in out.collect())
    # Half-open [lo, hi): 10 not in (0,10); overlapping intervals both hit;
    # 99 outside everything; each (point, interval) pair appears once even
    # though intervals span multiple buckets.
    assert got == [(0, 0), (5, 0), (5, 5), (10, 5), (10, 10), (15, 5)]


def test_range_join_keyed(spark):
    points = spark.createDataFrame([("u1", 5), ("u2", 5)], ["k", "x"])
    intervals = spark.createDataFrame([("u1", 0, 10)], ["k", "lo", "hi"])
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=8, on=["k"])
    assert [(r["k"], r["x"]) for r in out.collect()] == [("u1", 5)]


def test_resample_ffill_gaps_and_last_per_bucket(spark):
    from iowa_liquor_sales_spark.operators.temporal import resample_ffill
    from pyspark.sql import functions as F

    # bucket = 10us grid; user A has events in buckets 1 and 4 (gap 2-3),
    # bucket 1 has two events (later one must win).
    rows = [
        ("A", 1, 15, 1.0),
        ("A", 2, 18, 2.0),   # same bucket 1, later ts -> wins
        ("A", 3, 45, 9.0),   # bucket 4
        ("B", 4, 30, 7.0),   # single bucket 3
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "us", "value"]).select(
        "user_id", "event_id", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    out = resample_ffill(df, "ts", "user_id", "value", bucket_us=10)
    got = {(r["user_id"], r["bucket"]): r["value_ffill"] for r in out.collect()}
    assert got == {
        ("A", 1): 2.0,  # last-in-bucket
        ("A", 2): 2.0,  # forward-filled
        ("A", 3): 2.0,  # forward-filled
        ("A", 4): 9.0,
        ("B", 3): 7.0,
    }


def test_autocorrelation_linear_series(spark):
    from iowa_liquor_sales_spark.operators.temporal import autocorrelation

    # A strictly linear series is perfectly autocorrelated at every lag.
    rows = [("a", i, float(3 * i + 7)) for i in range(20)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {
        r["k"]: r
        for r in autocorrelation(
            df, key_col="k", order_col="t", value_col="v"
        ).collect()
    }
    assert out["a"]["n_obs"] == 20
    # floor(corr * 1e9): a bit-perfect 1.0 is not guaranteed by the
    # closed-form moment finish, but it must sit within a few ulp-floors.
    for lag in (1, 2, 3):
        assert 999_999_990 <= out["a"][f"acf_{lag}_ppb"] <= 1_000_000_000


def test_resample_interpolate_fills_gap_linearly(spark):
    from datetime import datetime

    from iowa_liquor_sales_spark.operators.temporal import (
        resample_interpolate,
    )

    # Observations at hours 0 and 3 (values 10 -> 40): hours 1 and 2
    # interpolate to 20 and 30; observed buckets pass through untouched.
    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 7, 10.0),
        (2, datetime(2024, 1, 1, 3, 15), 7, 40.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = sorted(
        (r["bucket"], r["value_interp"], r["is_observed"])
        for r in resample_interpolate(df).collect()
    )
    b0 = out[0][0]
    assert [(b - b0, v, o) for b, v, o in out] == [
        (0, 10.0, 1),
        (1, 20.0, 0),
        (2, 30.0, 0),
        (3, 40.0, 1),
    ]


def test_resample_interpolate_last_obs_per_bucket_wins(spark):
    from datetime import datetime

    from iowa_liquor_sales_spark.operators.temporal import (
        resample_interpolate,
    )

    # Two observations in bucket 0: the later one (ts, then event_id
    # tiebreak) is the bucket's value, matching resample_ffill.
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 7, 99.0),
        (2, datetime(2024, 1, 1, 0, 50), 7, 10.0),
        (3, datetime(2024, 1, 1, 1, 0), 7, 20.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = sorted(
        (r["bucket"], r["value_interp"]) for r in
        resample_interpolate(df).collect()
    )
    assert [v for _, v in out] == [10.0, 20.0]


def test_lttb_keeps_spikes_and_endpoints(spark):
    from datetime import datetime, timedelta

    from iowa_liquor_sales_spark.operators.temporal import lttb_downsample

    # Flat series with one huge spike: the downsample must keep the
    # first point, the last point, and the spike (largest triangle in
    # its bucket); one point per interior bucket.
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0 + timedelta(minutes=i), i, 100 if i != 57 else 99999)
        for i in range(128)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "v"])
    out = lttb_downsample(df, "k", ["ts", "eid"], "v", n_buckets=16)
    kept = {(r["pos"], r["v"]) for r in out.collect()}
    poss = sorted(p for p, _ in kept)
    assert poss[0] == 1 and poss[-1] == 128
    assert (58, 99999) in kept  # pos is 1-based; i=57 -> pos 58
    # one point per interior bucket + the two endpoints
    assert len(kept) == 16


def test_sequence_motif_counts_nonoverlapping(spark):
    from datetime import datetime, timedelta

    from iowa_liquor_sales_spark.operators.temporal import (
        sequence_motif_counts,
    )

    t0 = datetime(2024, 1, 1)
    # user 1: v c p v c p  -> 2 motifs; user 2: v x c p -> 0 (exact
    # adjacency required); user 3: p c v -> 0 (order matters).
    seqs = {1: "vcpvcp", 2: "vxcp", 3: "pcv"}
    rows = [
        (u, t0 + timedelta(minutes=i), u * 100 + i, ch)
        for u, s in seqs.items()
        for i, ch in enumerate(s)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "et"])
    out = {
        r["user_id"]: (r["seq_len"], r["n_motifs"])
        for r in sequence_motif_counts(
            df, "user_id", "ts", "event_id", "et", "vcp"
        ).collect()
    }
    assert out == {1: (6, 2), 2: (4, 0), 3: (3, 0)}


def test_asof_nearest_picks_smaller_gap(spark):
    from datetime import datetime

    from iowa_liquor_sales_spark.operators.temporal import asof_join

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(30), "b"), (2, t(5), "c")],
        ["k", "lts", "lbl"],
    )
    right = spark.createDataFrame(
        [(1, t(8), 100), (1, t(29), 200), (1, t(31), 300), (2, t(50), 400)],
        ["k", "rts", "rv"],
    )
    out = {
        r["lbl"]: r["r_rv"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", direction="nearest"
        ).collect()
    }
    # a(10): backward 8 (gap 2) vs forward 29 (gap 19) -> 100
    # b(30): backward 29 (gap 1) vs forward 31 (gap 1) -> tie -> backward 200
    # c(5): no backward; forward 50 -> 400
    assert out == {"a": 100, "b": 200, "c": 400}


def test_burst_segments_viterbi_optimum(spark):
    import datetime

    from iowa_liquor_sales_spark.operators.temporal import burst_segments

    d0 = datetime.date(2020, 1, 1)

    def series(key, xs):
        return [
            (key, d0 + datetime.timedelta(days=i), x)
            for i, x in enumerate(xs)
        ]

    rows = (
        # 3-day hot run: entering the burst (cost 2) beats paying 1/day
        # in base (cost 3) -> burst_days=3, path_cost=2
        series("run", [0, 0, 1, 1, 1, 0, 0])
        # lone hot day: enter cost 2 > base penalty 1 -> stays base
        + series("blip", [0, 1, 0])
        # all cold: nothing to do
        + series("quiet", [0, 0, 0, 0])
    )
    df = spark.createDataFrame(rows, ["k", "day", "hot"])
    out = {r["k"]: r for r in burst_segments(df, "k", "day", "hot").collect()}
    assert out["run"]["burst_days"] == 3 and out["run"]["path_cost"] == 2
    assert out["run"]["n_days"] == 7 and out["run"]["n_hot"] == 3
    assert out["blip"]["burst_days"] == 0 and out["blip"]["path_cost"] == 1
    assert out["quiet"]["burst_days"] == 0 and out["quiet"]["path_cost"] == 0


def test_durbin_watson_white_noise_vs_trend(spark):
    from iowa_liquor_sales_spark.operators.temporal import durbin_watson

    # alternating residuals -> DW near 4; monotone ramp -> DW near 0
    alt = [("a", i, 10.0 + (1.0 if i % 2 == 0 else -1.0))
           for i in range(100)]
    ramp = [("r", i, float(i)) for i in range(100)]
    out = {
        r["k"]: r["dw_ppm"]
        for r in durbin_watson(
            spark.createDataFrame(alt + ramp, ["k", "o", "v"]),
            "k", "o", "v",
        ).collect()
    }
    assert out["a"] > 3_500_000          # alternation -> ~4
    assert out["r"] < 100_000            # strong positive trend -> ~0
    # exact check on a tiny series: v = 1,2,4 -> mean 7/3,
    # residuals e = -4/3, -1/3, 5/3; sum(de^2) = 1+4 = 5,
    # sum(e^2) = (16+1+25)/9 = 42/9 -> DW = 45/42
    tiny = [("t", 1, 1.0), ("t", 2, 2.0), ("t", 3, 4.0)]
    got = durbin_watson(
        spark.createDataFrame(tiny, ["k", "o", "v"]), "k", "o", "v"
    ).collect()[0]
    assert got["dw_ppm"] == (45 * 1_000_000) // 42


def test_hurst_rs_separates_persistence_regimes(spark):
    from iowa_liquor_sales_spark.operators.temporal import hurst_rs

    import random

    rng = random.Random(11)
    # trending series (strong persistence): H near 1
    trend, x = [], 0.0
    for i in range(512):
        x += 1.0 + 0.01 * rng.random()
        trend.append(("t", i, x))
    # alternating series (strong anti-persistence): H near 0
    alt = [("a", i, 100.0 + (5.0 if i % 2 == 0 else -5.0) + 0.01 * rng.random())
           for i in range(512)]
    out = {
        r["k"]: r["hurst_ppm"]
        for r in hurst_rs(
            spark.createDataFrame(trend + alt, ["k", "o", "v"]),
            "k", "o", "v",
        ).collect()
    }
    assert out["t"] > 800_000      # persistent ~1
    assert out["a"] < 300_000      # mean-reverting ~0
    # i.i.d.-ish noise sits between the regimes
    noise = [("n", i, rng.random() * 100) for i in range(512)]
    h = hurst_rs(
        spark.createDataFrame(noise, ["k", "o", "v"]), "k", "o", "v"
    ).collect()[0]["hurst_ppm"]
    assert 300_000 < h < 800_000


def test_hurst_distributed_index_is_bit_identical(spark):
    # The few-long-series de-skew arm (distributed_index=True) swaps the
    # per-key row_number for the range-partitioned global_row_number +
    # first-row offset join; indexes — and therefore every downstream
    # chunk statistic — must be BIT-identical to the default plan, under
    # a hostile input partitioning.
    import random

    from iowa_liquor_sales_spark.operators.temporal import hurst_rs

    rng = random.Random(7)
    rows = [
        (k, i, rng.random() * 50 + (i * 0.3 if k == "t" else 0))
        for k in ("t", "a", "z")
        for i in range(200)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k", "o", "v"]).repartition(13)
    base = sorted(
        tuple(r) for r in hurst_rs(df, "k", "o", "v").collect()
    )
    dist = sorted(
        tuple(r)
        for r in hurst_rs(df, "k", "o", "v", distributed_index=True).collect()
    )
    assert base == dist


def test_rolling_grid_quantile_matches_bruteforce(spark):
    from iowa_liquor_sales_spark.operators.temporal import (
        rolling_grid_quantile,
    )

    import datetime
    import math
    import random

    rng = random.Random(23)
    rows = []
    for d in range(20):
        for _ in range(rng.randint(3, 30)):
            rows.append(
                (
                    datetime.datetime(2024, 1, 1 + d, rng.randint(0, 23)),
                    float(rng.randint(0, 500)),
                )
            )
    got = {
        str(r["day"]): (r["n_window"], r["p_lo"])
        for r in rolling_grid_quantile(
            spark.createDataFrame(rows, ["ts", "v"]),
            "ts",
            "v",
            q_ppm=950_000,
            trailing_days=7,
            bucket_width=10,
            value_scale=1,
        ).collect()
    }
    for d in range(20):
        day = datetime.date(2024, 1, 1 + d)
        lo = day - datetime.timedelta(days=6)
        window = sorted(
            math.floor(v) // 10
            for ts, v in rows
            if lo <= ts.date() <= day
        )
        n = len(window)
        # first bucket whose cumulative count reaches 95% of the window
        need = n * 950_000
        cum, pick = 0, None
        for b in window:
            cum += 1
            if cum * 1_000_000 >= need:
                pick = b
                break
        assert got[str(day)] == (n, pick * 10), day


def test_forecast_backtest_seasonal_beats_naive_on_weekly_pattern(spark):
    from iowa_liquor_sales_spark.operators.temporal import forecast_backtest

    import datetime

    # strong weekly cycle: seasonal-naive is near-perfect, naive-1 bad
    rows = []
    for d in range(35):
        rows.append(
            (
                "a",
                datetime.datetime(2024, 1, 1) + datetime.timedelta(d),
                float(100 + 50 * (d % 7)),
            )
        )
    got = forecast_backtest(
        spark.createDataFrame(rows, ["k", "ts", "v"]), "k", "ts", "v",
        season=7,
    ).collect()[0]
    # exact weekly repeat: seasonal error 0 -> MASE 0
    assert got["mae_seasonal_e2"] == 0 and got["mase_ppm"] == 0
    assert got["n_scored"] == 28  # first 7 days unscored
    # anti-seasonal series: seasonal-naive worse than naive-1
    rows2 = [
        ("b", datetime.datetime(2024, 1, 1) + datetime.timedelta(d),
         float(d * 10))
        for d in range(35)
    ]
    g2 = forecast_backtest(
        spark.createDataFrame(rows2, ["k", "ts", "v"]), "k", "ts", "v",
        season=7,
    ).collect()[0]
    # linear ramp: seasonal error = 7x naive error exactly
    assert g2["mase_ppm"] == 7_000_000


def test_rolling_anomaly_flags_the_spike_not_the_trend(spark):
    from iowa_liquor_sales_spark.operators.temporal import rolling_anomaly

    import datetime

    rows = []
    for d in range(30):
        v = 100.0 + (d % 3)       # small jitter
        if d == 20:
            v = 500.0             # the spike
        rows.append((datetime.datetime(2024, 1, 1 + (d % 30) if d < 30 else 1, 6)
                     + datetime.timedelta(0), v))
    rows = [(datetime.datetime(2024, 1, 1, 6) + datetime.timedelta(d), v)
            for d, (_, v) in enumerate(rows)]
    out = {str(r["day"]): r for r in rolling_anomaly(
        spark.createDataFrame(rows, ["ts", "v"]), "ts", "v",
        trailing_days=7, k_ppm=3_000_000,
    ).collect()}
    assert len(out) == 30
    flagged = [d for d, r in out.items() if r["is_anomaly"]]
    assert "2024-01-21" in flagged  # the spike day
    # jitter days are not flagged
    assert len(flagged) <= 3


def test_hurst_distributed_index_releases_cache(spark):
    # global_row_number pins its range shuffle via persist (a
    # CacheManager entry that nothing garbage-collects); the
    # distributed_index arm must release it before returning
    # (localCheckpoint + unpersist) or every call in a long-lived
    # session leaks one cached relation into executor storage.
    import random

    from iowa_liquor_sales_spark.operators.temporal import hurst_rs

    spark.catalog.clearCache()
    rng = random.Random(11)
    rows = [("s", i, rng.random() * 10) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = hurst_rs(df, "k", "o", "v", distributed_index=True).collect()
    assert len(out) == 1
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
