#!/usr/bin/env python
"""Quiet-box adjudication of q_entity_resolution (round-8 verdict item
4): its in-bench wall moved 2.74 -> 3.98 s across r7 -> r8 while the
PassJoin candidate generation was refactored into the two-sided helper.
Protocol = the established quiet-box rerun: BENCH session conf AND
BENCH warehouse layout at sf0.1, 4 sequential runs (first = cold
JIT/codegen), noop-forced. Prints the four walls; the SCALE.md section
is written by hand from the output."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = bench._make_spark(cpus)
    wh, _ = bench._ingest_warehouse(spark, sf_dir, int(cpus), timed=False)
    q = entry_mod.queries()["q_entity_resolution"]
    walls = []
    for i in range(4):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q(spark, wh).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 2))
        print(f"run {i + 1}: {walls[-1]} s", flush=True)
    print("walls:", walls)


if __name__ == "__main__":
    main()
