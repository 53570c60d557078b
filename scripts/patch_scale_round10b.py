#!/usr/bin/env python
"""Measure ONLY the round-10b probe section (bench_round10b: the three
round-10 operators under word-salted corpus growth) and splice it into
SCALE.md — same protocol as the earlier patch_scale_round* scripts."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "scale_probe",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_probe.py"),
)
sp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sp)

from iowa_liquor_sales_spark import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs_paths = {}
    for factor in (1, 4, 16):
        if factor == 1:
            docs_paths[factor] = f"{sp.BASE}/documents.parquet"
        else:
            path = f"{sp.WORK}/docs_x{factor}"
            sp.replicate_docs(spark, factor, path)
            docs_paths[factor] = path
    timings = sp.bench_round10b(spark, docs_paths)
    lines = sp.render_round10b(timings)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE.md",
    )
    marker = lines[1]
    text = open(path).read()
    if marker in text:  # re-run: replace the section
        head = text[: text.index(marker) - 1].rstrip("\n")
        text = head + "\n"
    open(path, "w").write(text.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
