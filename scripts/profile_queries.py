#!/usr/bin/env python
"""Round-10 optimization profiler: time named queries in isolation with
the bench's exact protocol (same warehouse layout, same warm-up, noop
sink, best-of-N with clearCache) and optionally dump their
``explain("formatted")`` plans to plans/r10/<name>_<tag>.txt.

    python scripts/profile_queries.py [--reps N] [--plans TAG] q_a q_b ...

Runs ONE JVM for the whole list (so relative numbers are comparable to a
bench cohort's interior, not to its cold start). Prints one JSON line at
the end: {"timings": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import _force, _ingest_warehouse, _make_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    reps, plan_tag = 2, None
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif argv[i] == "--plans":
            plan_tag = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _make_spark(cpus)
    queries = entry_mod.queries()
    _force(entry_mod.entry(spark))
    wh, _ = _ingest_warehouse(spark, sf_dir, int(cpus), timed=False)
    for wname in (
        "q_scan_parquet",
        "q_groupby_agg",
        "q_star_join",
        "q_token_count",
        "q_events_window",
    ):
        _force(queries[wname](spark, wh))

    timings: dict[str, float] = {}
    for name in names:
        if plan_tag:
            os.makedirs("plans/r10", exist_ok=True)
            df = queries[name](spark, wh)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r10/{name}_{plan_tag}.txt", "w") as fh:
                fh.write(plan)
        best = float("inf")
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(queries[name](spark, wh))
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"PROFILE {name}: {timings[name]} s", flush=True)

    print(json.dumps({"timings": timings, "sf_dir": sf_dir, "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
