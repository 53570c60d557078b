"""Distributed global ranking — the scalable replacement for
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY, which Spark
executes in a SINGLE partition (the classic 100 TB scale-killer: one task
sorts the world).

The trick is the DataFrame version of RDD ``zipWithIndex``:

1. ``repartitionByRange`` on the order key — one shuffle, ordered
   partition boundaries from a driver-side sample (equal keys land in the
   same partition);
2. ``sortWithinPartitions`` — narrow, no shuffle;
3. ``monotonically_increasing_id`` — per-partition sequential ids assigned
   in the sorted row order: ``id = pid * 2^33 + local_index``, so both the
   partition id and the LOCAL rank fall out with two bit-ops;
4. per-partition row counts (an O(#partitions) aggregate) turn into
   cumulative offsets on the driver, rejoined as a broadcast map.

Total cost: one range shuffle + a narrow sort + an O(#partitions) collect
— versus the single-task global sort of the window form. Results equal
the window form whenever the order key is unique (document ties away:
with duplicate keys any engine's row_number is tie-arbitrary anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PART_BITS = 33  # monotonically_increasing_id: id = pid << 33 | row_idx


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global ``row_number`` ordered by ``order_cols``
    (which should be a unique key for deterministic output) without ever
    collapsing to one partition."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    with_mid = ranged.withColumn("_mid", F.monotonically_increasing_id())
    pid = F.shiftrightunsigned("_mid", _PART_BITS)
    local = with_mid.withColumn("_pid", pid.cast("long")).withColumn(
        "_lrn", (F.col("_mid") % F.lit(1 << _PART_BITS)) + 1
    )
    # Pin ONE execution of the range shuffle: the offsets job below and the
    # caller's output job would otherwise each re-run repartitionByRange,
    # whose sampled boundaries are not guaranteed identical across jobs —
    # offsets from one partitioning applied to another would corrupt ranks.
    local = local.persist(StorageLevel.MEMORY_AND_DISK)
    # O(#partitions) rows to the driver — bounded by cluster size, not data.
    counts = {
        r["_pid"]: r["_cnt"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("_pid"),
    )
    return local.withColumn(
        out_col, (F.col("_lrn") + offset_expr).cast("long")
    ).drop("_mid", "_pid", "_lrn")
