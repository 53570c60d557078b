"""Deterministic distributed k-means over embedding columns.

Trains the coarse quantizer that :mod:`.similarity`'s IVF path needs —
Lloyd's algorithm re-expressed so every step is *exact integer
arithmetic*, making the result independent of partitioning, task order,
and engine (the DuckDB oracle unrolls the same iterations in SQL):

- vectors quantize to an int64 1e-6 grid (float sums are
  partition-order dependent; integer sums are exact);
- seeds are the ``k`` vectors with the smallest md5 content hash —
  deterministic without any RNG state;
- assignment = argmin of exact squared L2 on the grid (diffs ≤ ~4e6 per
  dim squared and summed over ≤ a few hundred dims stays well inside
  int64), ties broken by centroid id via struct-min;
- update = per-dim integer sum div count with TRUNCATION toward zero —
  the semantics Spark's ``div`` and DuckDB's integral ``//`` share
  (DuckDB's ``//`` floors only for FLOAT operands; Python's ``//``
  floors, so the driver-side update sign-handles negative sums
  explicitly), keeping centroids on the grid. Clusters that lose all
  members are dropped, not respawned.

Scale shape per iteration: one broadcast of k×d centroid literals, one
narrow distance/argmin pass (no shuffle — the cross join is against a
broadcast local relation), one hash aggregate shuffled on (cid, pos)
whose width is k×d regardless of row count, and a k×d-row collect.
That is the same dataflow as MLlib's KMeans, minus the float
nondeterminism. Driver state is O(k·d) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def quantize_e6(vec) -> F.Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long")
    )


def _dist2(q, c) -> F.Column:
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_e6(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    salt: str = "km",
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` exact Lloyd iterations; returns (assignments, centroids).

    Assignments are (id_col, cid); centroids the final int-grid vectors
    indexed by cid. The assignment DataFrame is the one *after the last
    centroid update would be applied* — i.e. argmin against the returned
    centroids — so callers can hand both to an IVF probe directly.
    """
    spark: SparkSession = df.sparkSession
    q = df.select(F.col(id_col).alias("vid"), quantize_e6(vec_col).alias("q"))
    h = hash60(F.concat(F.lit(salt), F.col("vid").cast("string")))
    seeds = q.withColumn("h", h).orderBy("h", "vid").limit(k).collect()
    cents = {i: list(r["q"]) for i, r in enumerate(seeds)}

    def assign(cents_map):
        cdf = spark.createDataFrame(
            [(cid, c) for cid, c in sorted(cents_map.items())],
            "cid int, c array<bigint>",
        )
        a = q.crossJoin(F.broadcast(cdf)).withColumn("d", _dist2(F.col("q"), F.col("c")))
        best = a.groupBy("vid").agg(
            F.min(F.struct("d", "cid", "q")).alias("m")
        )
        return best.select("vid", F.col("m.cid").alias("cid"), F.col("m.q").alias("q"))

    for _ in range(iters):
        assigned = assign(cents)
        sums = (
            assigned.select("cid", F.posexplode("q").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_cents: dict[int, list[int]] = {}
        for r in sums:
            vec = new_cents.setdefault(r["cid"], [0] * len(next(iter(cents.values()))))
            # truncation toward zero, NOT Python floor: embeddings go
            # negative, and the DuckDB oracle's integral `//` truncates
            # (-7 // 2 = -3) while Python's floors (-4) — a latent hash
            # break on any dataset where a (cid, pos) sum is negative.
            s, n = r["s"], r["n"]
            vec[r["pos"]] = -((-s) // n) if s < 0 else s // n
        cents = new_cents  # empty clusters drop out

    final = assign(cents).select(F.col("vid").alias(id_col), "cid")
    return final, [cents[c] for c in sorted(cents)]
