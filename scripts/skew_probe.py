#!/usr/bin/env python
"""Skew-join probe: build a 6M-row fact where ONE key owns 50% of all
rows, join it to a 30k-row dim, and compare three physical strategies:

  1. plain shuffle join with AQE skew-splitting DISABLED (the pathology)
  2. the same join with AQE skew handling ON (engine default)
  3. explicit salted_join (the AQE-less fallback the engine provides)

Appends results to SCALE.md. The point: the engine has two working answers
to the single-hot-key problem that kills naive shuffle joins at 100 TB.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iowa_liquor_sales_spark import get_spark  # noqa: E402
from iowa_liquor_sales_spark.operators.joins import salted_join  # noqa: E402

N_FACT = 6_000_000
N_DIM = 30_000


def main() -> None:
    spark = get_spark(
        master="local[16]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            # Force the skew to matter: no broadcast escape hatch.
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    fact = (
        spark.range(N_FACT)
        .withColumn(
            "k",
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(
                F.col("id") % N_DIM
            ),
        )
        .withColumn("v", (F.col("id") % 1000).cast("double"))
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("dk"), (F.col("id") * 2).alias("dv")
    )

    def run(label: str, df) -> tuple[str, float, int]:
        t0 = time.perf_counter()
        n = df.count()
        return label, round(time.perf_counter() - t0, 2), n

    results = []
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results.append(
        run("plain shuffle join, AQE skew OFF", fact.join(dim, fact["k"] == dim["dk"]))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results.append(
        run("shuffle join, AQE skew ON", fact.join(dim, fact["k"] == dim["dk"]))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results.append(
        run(
            "salted_join (16 salts), AQE skew OFF",
            salted_join(fact, dim, "k", "dk", n_salts=16),
        )
    )

    lines = [
        "",
        "## Skew-join probe (`scripts/skew_probe.py`)",
        "",
        f"{N_FACT:,}-row fact, one key = 50% of rows, joined to a "
        f"{N_DIM:,}-row dim (broadcast disabled to force the shuffle path):",
        "",
        "| strategy | wall | rows |",
        "|---|---|---|",
    ]
    for label, secs, n in results:
        lines.append(f"| {label} | {secs}s | {n:,} |")
    assert len({n for _, _, n in results}) == 1, "strategies disagree on rows!"
    with open("SCALE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[6:]))


if __name__ == "__main__":
    main()
