"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping.

At 100 TB, min/max column statistics on parquet row groups only prune
scans if the data is clustered on the filtered columns. Sorting clusters
one column perfectly and the others not at all; interleaving the bits of
k columns (a Z-order / Morton curve) gives every interleaved column
locality, so range predicates on ANY of them skip most row groups.
The production recipe is ``df.repartitionByRange(N, zv).sortWithinPartitions
(zv)`` then write — both steps pure Spark; the curve value itself is the
only thing the engine must supply.

The reference has no layout control beyond chunk file naming
(src/extract.py:51); this is the Spark-native replacement for "files
ordered by extraction date" when queries filter on more than date.

``zorder_value`` builds the curve as a pure Catalyst bit-expression
(whole-stage codegen, no UDF); ``zorder_sql`` renders the identical
integer expression for the DuckDB oracle, so layout decisions are
bit-reproducible cross-engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: result bit ``2b`` is ``y``'s bit ``b``, bit ``2b+1`` is
    ``x``'s bit ``b``. Pure int64 expression — exact in any engine."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    cx = cx.cast("long")
    cy = cy.cast("long")
    terms = []
    for b in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(cx, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(cy, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`zorder_value` (bit-identical)."""
    terms = []
    for b in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {b}) & 1) << {2 * b})")
    return " | ".join(terms)


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_bits_sql(lat: str, lon: str, precision: int = 6) -> str:
    """Engine-neutral SQL (Spark ``F.expr`` AND DuckDB — both accept the
    ``>>``/``&``/``<<`` operators) for the geohash bit string: quantize
    lat/lon by binary subdivision, then interleave starting with
    longitude (the geohash standard). Like :func:`zorder_sql`, a single
    renderer guarantees the two engines compute bit-identical values.
    """
    bits = 5 * precision
    nb_lon = (bits + 1) // 2
    nb_lat = bits // 2
    lon_q = (
        f"LEAST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * {1 << nb_lon}) "
        f"AS BIGINT), {(1 << nb_lon) - 1})"
    )
    lat_q = (
        f"LEAST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * {1 << nb_lat}) "
        f"AS BIGINT), {(1 << nb_lat) - 1})"
    )
    terms = []
    for i in range(bits):
        outpos = bits - 1 - i
        if i % 2 == 0:
            src, srcbit = lon_q, nb_lon - 1 - (i // 2)
        else:
            src, srcbit = lat_q, nb_lat - 1 - (i // 2)
        terms.append(f"((({src} >> {srcbit}) & 1) << {outpos})")
    return " | ".join(terms)


def geohash_chars_sql(z: str, precision: int = 6) -> str:
    """Base32 rendering of a geohash bit string column (engine-neutral)."""
    parts = [
        f"substr('{GEOHASH_BASE32}', "
        f"CAST((({z}) >> {5 * (precision - 1 - i)}) & 31 AS INT) + 1, 1)"
        for i in range(precision)
    ]
    return "concat(" + ", ".join(parts) + ")"


def zonemap_skip_report(
    df: DataFrame,
    bucket: Column,
    stat_col: str,
    lo,
    hi,
) -> DataFrame:
    """Zone-map (row-group min/max stats) skipping diagnostic: group rows
    into storage buckets, compute each bucket's [min, max] envelope of
    ``stat_col``, and classify what a ``BETWEEN lo AND hi`` scan could
    do with that bucket — ``skip`` (disjoint envelope: never read),
    ``full`` (envelope inside the predicate: read without evaluating
    the filter), or ``partial``. The sum of skipped rows over total is
    exactly the I/O a zone-map-aware reader (parquet row-group stats,
    Delta/Iceberg file stats, the engine's Z-ORDER layout) saves —
    the observability half of the q_zorder/q_compaction layout story.

    One map-side-combinable aggregate; O(buckets) output.
    """
    per = df.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(stat_col).alias("stat_min"),
        F.max(stat_col).alias("stat_max"),
    )
    verdict = (
        F.when(
            (F.col("stat_max") < F.lit(lo))
            | (F.col("stat_min") > F.lit(hi)),
            F.lit("skip"),
        )
        .when(
            (F.col("stat_min") >= F.lit(lo))
            & (F.col("stat_max") <= F.lit(hi)),
            F.lit("full"),
        )
        .otherwise(F.lit("partial"))
    )
    return per.select("bucket", "n_rows", "stat_min", "stat_max",
                      verdict.alias("verdict"))
