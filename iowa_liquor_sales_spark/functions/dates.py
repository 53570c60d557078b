"""Date-dimension scalar functions (reference D1-D6).

The reference derives its date dimension in Postgres
(``IowaLiquor-RDS.session.sql:104-126``): day-trunc, year/quarter/month,
and **Postgres DOW (0=Sunday..6=Saturday)** plus an is-weekend flag.
Spark's ``dayofweek`` is 1=Sunday..7=Saturday — ``pg_dow`` encodes the
off-by-one exactly once (SURVEY §7.3 risk list).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pg_dow(col: Column | str) -> Column:
    """Postgres-convention day of week: 0=Sunday .. 6=Saturday."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.dayofweek(c) - F.lit(1)).cast("int")


def is_weekend(col: Column | str) -> Column:
    """Reference: EXTRACT(DOW ...) IN (0, 6) — session.sql:121-126."""
    return pg_dow(col).isin(0, 6)


def date_parts(col: Column | str) -> list[Column]:
    """The six dim_date attributes (session.sql:104-126), Spark-typed.

    All parts are plain Catalyst date expressions — at scale this is a
    narrow projection, and the distinct over it is a tiny aggregate
    (cardinality = #days, a few thousand rows regardless of fact size).
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.to_date(c)
    return [
        d.alias("date"),
        F.year(d).cast("int").alias("year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.month(d).cast("int").alias("month"),
        pg_dow(d).alias("day_of_week"),
        is_weekend(d).alias("is_weekend"),
    ]
