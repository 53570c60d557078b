#!/usr/bin/env python
"""Measure ONLY the round-8b new-operator probe section and splice it
into SCALE.md (same protocol as patch_scale_round8.py; rebuilds the
replicated documents/embeddings relations if absent)."""

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

    section = "\n".join(
        sp.render_round8c(sp.bench_round8c(spark))
    ).strip()
    with open("SCALE.md") as f:
        doc = f.read()
    marker = "## Round-8 graph-metric probe"
    if marker in doc:
        start = doc.index(marker)
        nxt = doc.find("\n## ", start)
        doc = doc[:start] + section + "\n\n" + doc[nxt + 1:]
    else:
        anchor = "## Quiet-box rerun"
        start = doc.index(anchor)
        doc = doc[:start] + section + "\n\n" + doc[start:]
    with open("SCALE.md", "w") as f:
        f.write(doc)
    print(section)


if __name__ == "__main__":
    main()
