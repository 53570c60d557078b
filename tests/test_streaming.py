"""Structured Streaming surface: the streaming windowed aggregate must
equal its batch twin on the same bounded input (that equivalence is what
makes the operator oracle-checkable), and availableNow ingest must drain
exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.schemas import read_table
from iowa_liquor_sales_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    run_windowed_to_memory,
    windowed_counts,
    windowed_counts_batch,
)

SF = "/root/testdata/sf0.001"
SF_EVENTS = SF


def _stage_events(spark, tmp_path) -> str:
    """Stage events as micro-batch files (ns timestamps normalized by
    read_table) so the file stream source can pick them up."""
    src = read_table(spark, SF, "events")
    staged = str(tmp_path / "staged")
    src.repartition(4).write.mode("overwrite").parquet(staged)
    return staged


def test_stream_equals_batch(spark, tmp_path):
    staged = _stage_events(spark, tmp_path)
    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = windowed_counts(stream)
    run_windowed_to_memory(agg, "stream_agg", str(tmp_path / "ckpt"))
    got = {
        tuple(r)
        for r in spark.table("stream_agg")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect()
    }
    want = {
        tuple(r)
        for r in windowed_counts_batch(spark.read.parquet(staged)).collect()
    }
    assert got == want and len(got) > 0


def test_available_now_ingest_exactly_once(spark, tmp_path):
    staged = _stage_events(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ingest_ckpt")
    n_src = spark.read.parquet(staged).count()
    stream = read_events_stream(spark, staged)
    run_available_now(stream, ckpt, out)
    assert spark.read.parquet(out).count() == n_src
    # Re-running against the same checkpoint ingests nothing new
    # (restartable, exactly-once — the reference's resumable chunk naming).
    run_available_now(read_events_stream(spark, staged), ckpt, out)
    assert spark.read.parquet(out).count() == n_src


def test_foreach_batch_sink_idempotent_restart(spark, tmp_path):
    from iowa_liquor_sales_spark.streaming.events import run_foreach_batch

    staged = _stage_events(spark, tmp_path / "fb_staged")
    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")

    def sink(df, batch_id: int) -> None:
        # Stand-in for write_jdbc: same per-batch contract, file sink.
        df.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    run_foreach_batch(stream, ckpt, sink)
    n_src = spark.read.parquet(staged).count()
    got = spark.read.parquet(out)
    assert got.count() == n_src
    assert got.select("_batch_id").distinct().count() >= 2  # micro-batched
    # Restart on same checkpoint: nothing re-delivered.
    run_foreach_batch(read_events_stream(spark, staged), ckpt, sink)
    assert spark.read.parquet(out).count() == n_src


def test_stream_static_join(spark, tmp_path):
    """Stream-static join: enrich the event stream with a static dim —
    results equal the batch join on the same data."""
    from iowa_liquor_sales_spark.streaming.events import read_events_stream

    staged = _stage_events(spark, tmp_path / "ssj_staged")
    users = (
        read_table(spark, SF_EVENTS, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = read_events_stream(spark, staged)
    joined = stream.join(users, "user_id").groupBy("c_mktsegment").count()
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("ssj").collect()}
    want = {
        tuple(r)
        for r in spark.read.parquet(staged)
        .join(users, "user_id")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    }
    assert got == want and got


def test_stream_dedup_exactly_once(spark, tmp_path):
    """Duplicate every event in the staged input; the streamed dedup must
    emit each event_id exactly once (== batch dropDuplicates)."""
    from iowa_liquor_sales_spark.streaming.events import dedup_stream

    src = read_table(spark, SF_EVENTS, "events")
    staged = str(tmp_path / "dup_staged")
    src.union(src).repartition(4).write.mode("overwrite").parquet(staged)

    stream = read_events_stream(spark, staged)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")
    assert out.count() == src.count()
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream join drains to the same rows as the
    batch-twin plan on identical data."""
    from iowa_liquor_sales_spark.streaming.events import (
        attribute_purchases,
        read_events_stream,
        run_available_now,
    )

    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    # Several files so the availableNow drain sees multiple micro-batches.
    ev.repartition(4).write.parquet(src)

    batch = attribute_purchases(
        ev.filter("event_type = 'click'"), ev.filter("event_type = 'purchase'")
    )

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    # The staged files are in random event-time order, so a short watermark
    # would legitimately DROP late rows (that's the semantics, not a bug);
    # a watermark wider than the dataset's time span keeps stream == batch.
    out = attribute_purchases(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'purchase'"),
        watermark="3650 days",
    )
    out_dir = str(tmp_path / "out")
    run_available_now(out, str(tmp_path / "ckpt"), out_dir)
    got = spark.read.parquet(out_dir)

    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_sliding_counts_batch_overlap(spark):
    import datetime as dt

    from iowa_liquor_sales_spark.streaming.events import sliding_counts

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    events = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=1), 10),
            (2, t0 + dt.timedelta(minutes=6), 10),
            (3, t0 + dt.timedelta(minutes=6), 11),
        ],
        ["event_id", "ts", "user_id"],
    )
    out = sliding_counts(events, "10 minutes", "5 minutes").collect()
    by_start = {r["window_start"]: r for r in out}
    # Each event appears in exactly two windows.
    assert sum(r["n_events"] for r in out) == 6
    w0 = by_start[t0]
    assert w0["n_events"] == 3 and w0["n_users"] == 2
    assert w0["window_end"] == t0 + dt.timedelta(minutes=10)
    w5 = by_start[t0 + dt.timedelta(minutes=5)]
    assert w5["n_events"] == 2 and w5["n_users"] == 2


def test_streaming_cdc_upsert_sink(spark, tmp_path):
    """Streaming changelog -> foreachBatch apply_cdc into a parquet
    'table': the lakehouse streaming-MERGE pattern. Each micro-batch
    applies its changes transactionally (staging dir swap by overwrite);
    the final table equals applying all changes in one batch."""
    import pandas as pd

    from iowa_liquor_sales_spark.operators.upsert import apply_cdc

    # snapshot table keys 0..9, v = -1
    table = str(tmp_path / "cdc_table")
    spark.createDataFrame([(k, -1) for k in range(10)], ["k", "v"]).coalesce(
        1
    ).write.mode("overwrite").parquet(table)

    # changelog: three parquet files (micro-batches), seq strictly grows
    chdir = tmp_path / "cdc_changes"
    chdir.mkdir()
    batches = [
        [(0, 100, "U", 1), (1, 0, "D", 2), (10, 10, "I", 3)],
        [(0, 200, "U", 4), (10, 0, "D", 5), (2, 22, "U", 6)],
        [(1, 111, "I", 7), (3, 33, "U", 8)],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(rows, columns=["k", "v", "op", "seq"]).to_parquet(
            chdir / f"batch_{i}.parquet"
        )

    stream = (
        spark.readStream.schema("k long, v long, op string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chdir))
    )

    def sink(df, batch_id: int) -> None:
        snap = spark.read.parquet(table)
        new = apply_cdc(snap, df, ["k"], "seq")
        # materialize BEFORE overwrite: lazy write would read the dir
        # it is replacing
        rows = new.collect()
        spark.createDataFrame(rows, new.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(table)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    expected = {k: -1 for k in range(10)}
    expected[0] = 200
    expected[1] = 111
    expected[2] = 22
    expected[3] = 33
    assert got == expected


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: state for a key is dropped once the
    watermark passes it (bounded state — the 100 TB contract), while
    duplicates arriving inside the watermark window still collapse. With
    an availableNow drain over one staged batch every duplicate falls
    inside the window, so the output equals batch dropDuplicates on
    event_id; the watermark bounds the state store instead of letting it
    grow with the stream."""
    src = read_table(spark, SF_EVENTS, "events")
    staged = str(tmp_path / "wdd_staged")
    src.union(src).repartition(4).write.mode("overwrite").parquet(staged)

    stream = read_events_stream(spark, staged)
    q = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName("wdd_out")
        .option("checkpointLocation", str(tmp_path / "wdd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("wdd_out")
    assert out.count() == src.count()
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0


def test_stream_static_broadcast_join(spark, tmp_path):
    # Stream-static join: every micro-batch of the event stream joins the
    # static customer dim (re-read per batch, broadcast by size) — the
    # standard streaming-enrichment pattern; results must equal the batch
    # join on the same bounded input.
    staged = _stage_events(spark, tmp_path)
    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    dim = (
        read_table(spark, SF, "customer")
        .select(
            (F.col("c_custkey") % 50).alias("user_id"),
            "c_mktsegment",
        )
        .dropDuplicates(["user_id"])
    )
    enriched = (
        stream.withColumn("user_id", F.col("user_id") % 50)
        .join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    (
        enriched.writeStream.format("memory")
        .queryName("stream_static_join")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {(r["c_mktsegment"], r["n"]) for r in spark.table("stream_static_join").collect()}
    want = {
        (r["c_mktsegment"], r["n"])
        for r in read_table(spark, SF, "events")
        .withColumn("user_id", F.col("user_id") % 50)
        .join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_stream_stream_interval_join(spark, tmp_path):
    # Stream-stream inner join with watermarks + an event-time interval
    # bound (the Structured Streaming two-feed enrichment: clicks join
    # views within 1h). Bounded input drained with availableNow must
    # equal the identical batch join.
    staged = _stage_events(spark, tmp_path)
    from iowa_liquor_sales_spark.streaming.events import read_events_stream

    def legs(df):
        views = df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        return views, clicks

    sv, sc = legs(read_events_stream(spark, staged, max_files_per_trigger=2))
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = sv.withWatermark("v_ts", "2 hours").join(
        sc.withWatermark("c_ts", "2 hours"), cond, "inner"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["v_id"], r["c_id"])
        for r in spark.table("ss_join_out").select("v_id", "c_id").collect()
    }
    bv, bc = legs(spark.read.parquet(staged))
    want = {
        (r["v_id"], r["c_id"])
        for r in bv.join(bc, cond, "inner").select("v_id", "c_id").collect()
    }
    assert got == want and len(got) > 0
