#!/usr/bin/env python
"""Driver-style correctness sweep: every declared query vs its DuckDB
oracle on a PLAIN default SparkSession (ANSI on, 200 shuffle partitions —
the external driver's environment, NOT the tuned engine factory).

    python scripts/oracle_sweep.py [sf_dir]     # default /root/testdata/sf0.01

Prints one line per failing query and a final summary; exit 1 on any
mismatch. This is the same gate as tests/test_oracle_parity.py but
runnable standalone at any scale factor.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_utils import compare, duckdb_con  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for name in sorted(queries):
        if name in getattr(entry_mod, "NON_SQL_QUERIES", ()):
            n = queries[name](spark, sf_dir).count()
            if n <= 0:
                fails.append(name)
                print(f"FAIL {name}: rows-only check returned {n} rows")
            else:
                print(f"NOTE {name}: no SQL oracle (rows-only), rows={n}")
            continue
        ok, msg = compare(queries[name](spark, sf_dir), con, oracles[name])
        if not ok:
            fails.append(name)
            print(f"FAIL {name}: {msg}")
    n_rows = entry_mod.entry(spark).count()
    print(
        f"checked {len(queries)} queries at {sf_dir}: "
        f"{len(queries) - len(fails)} ok, {len(fails)} failed; "
        f"entry() rows={n_rows}"
    )
    return 1 if fails or n_rows == 0 else 0


if __name__ == "__main__":
    sys.exit(main())
