#!/usr/bin/env python
"""Streaming composition demo: the engine's event pipeline end-to-end.

    staged event files --file stream--> exactly-once dedup
        --> watermarked hourly windows --> memory sink (drained)
        + stateful gap sessionization --> closed sessions

Each piece is the streaming twin of an oracle-checked batch operator, so
the printed row counts are cross-checkable against the batch queries.

Usage: python examples/stream_events.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iowa_liquor_sales_spark import get_spark  # noqa: E402
from iowa_liquor_sales_spark.schemas import read_table  # noqa: E402
from iowa_liquor_sales_spark.streaming.events import (  # noqa: E402
    dedup_stream,
    read_events_stream,
    run_windowed_to_memory,
    windowed_counts,
)
from iowa_liquor_sales_spark.streaming.sessions import sessionize_stream  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    work = tempfile.mkdtemp(prefix="stream_demo_")
    spark = get_spark(
        app_name="events-stream-demo",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Stage (with duplicates — simulating at-least-once upstream delivery).
    src = read_table(spark, sf_dir, "events")
    src.union(src).orderBy("ts").coalesce(2).write.mode("overwrite").parquet(
        f"{work}/staged"
    )

    # 1. exactly-once dedup → windowed aggregate, drained via availableNow.
    #    Watermark set once (at the dedup); downstream passes None.
    stream = dedup_stream(read_events_stream(spark, f"{work}/staged"))
    run_windowed_to_memory(
        windowed_counts(stream, watermark=None), "demo_windows", f"{work}/ckpt_win"
    )

    # 2. stateful sessionization over the deduped events. Chaining
    #    dedup-within-watermark + applyInPandasWithState in ONE query is
    #    not a supported stateful combination, so the pipeline stages
    #    through a parquet dir — the normal bronze→silver stream topology
    #    (each stage restartable on its own checkpoint).
    from iowa_liquor_sales_spark.streaming.events import run_available_now

    run_available_now(
        dedup_stream(read_events_stream(spark, f"{work}/staged")),
        f"{work}/ckpt_dedup",
        f"{work}/deduped",
    )
    q = (
        sessionize_stream(
            read_events_stream(spark, f"{work}/deduped"),
            gap_seconds=1800,
        )
        .writeStream.format("memory")
        .queryName("demo_sessions")
        .option("checkpointLocation", f"{work}/ckpt_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    stats = {
        "staged_rows": src.count() * 2,
        "unique_events": src.count(),
        "window_rows": spark.table("demo_windows").count(),
        "closed_sessions": spark.table("demo_sessions").count(),
    }
    print(stats)
    return stats


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
