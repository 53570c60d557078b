"""Similarity search over embedding columns (``array<float>``).

Two strategies, per the standard scale ladder:

- :func:`brute_force_topk` — exact cosine top-k. The score is a Catalyst
  higher-order-function dot product (JVM codegen, no Python); top-k is a
  ``row_number`` window or global sort-limit. Exact, O(n·d) per query —
  the right baseline and the verifier for approximate methods.
- :func:`rh_bucketize` / :func:`ann_lsh_topk` — random-hyperplane LSH:
  documents are bucketed by the sign pattern of dot products with
  deterministic ±1 hyperplanes; a query only scores its own bucket.
  At 100 TB the bucketed table is written partitioned by bucket so a query
  touches one partition (partition pruning), turning ANN into a
  broadcast-join + local top-k with no full scan.

Hyperplanes are derived from md5 (see :mod:`..functions.hashing`) so the
DuckDB oracle can reproduce them bit-for-bit as SQL literals.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iowa_liquor_sales_spark.functions.vectors import cosine_similarity, dot


def rh_component(j: int, k: int) -> float:
    """Deterministic ±1 hyperplane component: low bit of the first hex digit
    of md5('rh_{j}_{k}') — reproducible in any engine with md5."""
    h = hashlib.md5(f"rh_{j}_{k}".encode()).hexdigest()
    return 1.0 if (int(h[0], 16) & 1) == 1 else -1.0


def rh_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [[rh_component(j, k) for k in range(dim)] for j in range(n_planes)]


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Plan shape: scan → projected cosine (codegen) → TakeOrderedAndProject
    (per-partition top-k, then merge of k·partitions rows on the driver) —
    no full shuffle/sort even at billions of rows.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cos_sim")
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "cos_sim")
    )


def rh_bucketize(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket = integer of sign bits of dot
    products with the deterministic hyperplanes. Narrow projection — at
    scale, persist partitioned/bucketed by this column."""
    planes = rh_hyperplanes(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(c) for c in plane])
        bucket = bucket + F.when(
            dot(F.col(vec_col), p) > 0, F.lit(2**j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return embeddings.withColumn("bucket", bucket)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    Recall < 1 by design; the bucket-join is a broadcast of the single query
    row, so the plan is scan → filter(bucket = q.bucket) → local top-k.
    """
    b = rh_bucketize(embeddings, n_planes=n_planes, dim=dim, vec_col=vec_col)
    q = (
        b.filter(F.col(id_col) == query_id)
        .select(
            F.col("bucket").alias("q_bucket"), F.col(vec_col).alias("q_vec")
        )
    )
    cand = b.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket")).filter(
        F.col(id_col) != query_id
    )
    scored = cand.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "cos_sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    min_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (ids only — the score is
    FP-order sensitive at the last bit, ids are stable).

    This is the exact all-pairs form; at corpus scale compose with
    :func:`rh_bucketize` and join on bucket first so only same-bucket pairs
    are scored.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity(F.col("vec_a"), F.col("vec_b")) >= min_cosine)
        .select("id_a", "id_b")
    )
