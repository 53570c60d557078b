#!/usr/bin/env python
"""List every declared query whose output schema contains a double/float
column — each one is a bitwise-hash risk at the driver gate (ulp wobble
across engine builds). Goal state: this prints nothing."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    hits = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            bad = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("double", "float")
            ]
        except Exception as e:  # pragma: no cover
            print(f"{name}: ERROR {e}")
            hits += 1
            continue
        if bad:
            print(f"{name}: {', '.join(bad)}")
            hits += 1
    print(f"-- {hits} queries with double/float outputs of {len(qs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
