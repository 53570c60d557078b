"""Stateful streaming sessionization must agree with the batch
sessionizer on every session the stream has closed."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from iowa_liquor_sales_spark.schemas import read_table
from iowa_liquor_sales_spark.streaming.events import read_events_stream
from iowa_liquor_sales_spark.streaming.sessions import sessionize_stream

SF = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    staged = str(tmp_path / "staged")
    # Stage in event-time order so micro-batches advance the watermark the
    # way a live feed would (per-user order is what sessionization needs).
    src = read_table(spark, SF, "events").orderBy("ts")
    src.coalesce(1).write.mode("overwrite").parquet(staged)

    stream = read_events_stream(spark, staged)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["su"], r["n_events"])
        for r in spark.table("closed_sessions")
        .select(
            "user_id",
            F.unix_micros("session_start").alias("su"),
            "n_events",
        )
        .collect()
    }

    batch = entry_mod.q_sessionize(spark, SF)
    want_all = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in batch.collect()
    }
    # Closed streaming sessions are exactly batch sessions (the stream may
    # still hold tail sessions open past the final watermark).
    assert got, "stream closed no sessions"
    assert got <= want_all
    # Sanity: a meaningful share of sessions closed.
    assert len(got) >= len(want_all) // 2


def test_open_tail_sessions_are_the_difference(spark, tmp_path):
    staged = str(tmp_path / "staged2")
    src = read_table(spark, SF, "events").orderBy("ts")
    src.coalesce(1).write.mode("overwrite").parquet(staged)
    stream = read_events_stream(spark, staged)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("closed2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    closed = spark.table("closed2")
    batch = entry_mod.q_sessionize(spark, SF)
    missing = batch.join(
        closed.select(
            "user_id", F.unix_micros("session_start").alias("session_start_us")
        ),
        ["user_id", "session_start_us"],
        "left_anti",
    )
    # Every unclosed session must extend into the final-watermark tail —
    # i.e. its end is within gap+watermark of the stream's max event time.
    max_ts = read_table(spark, SF, "events").agg(F.max("ts")).head()[0]
    horizon_us = int(max_ts.timestamp() * 1_000_000) - (1800 + 600) * 1_000_000
    stragglers = missing.withColumn(
        "end_us", F.col("session_start_us") + F.col("duration_us")
    ).filter(F.col("end_us") < horizon_us)
    assert stragglers.count() == 0, stragglers.collect()[:5]
