#!/usr/bin/env python
"""Sweep a named subset of queries against their DuckDB oracles.

    python scripts/sweep_some.py q_stats_agg q_corr_stats [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_utils import compare, duckdb_con  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            if i + 1 >= len(argv):
                sys.exit("--sf requires a value")
            sf_dir = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for name in args:
        if name not in queries:
            print(f"FAIL {name}: not declared")
            fails.append(name)
            continue
        ok, msg = compare(queries[name](spark, sf_dir), con, oracles[name])
        print(f"{'ok  ' if ok else 'FAIL'} {name}{'' if ok else ': ' + msg}")
        if not ok:
            fails.append(name)
    print(f"{len(args) - len(fails)} ok, {len(fails)} failed at {sf_dir}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
