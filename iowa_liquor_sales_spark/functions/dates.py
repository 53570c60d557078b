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


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 of a **wall-clock**
    (TIMESTAMP_NTZ) value, independent of the session timezone.

    ``unix_micros`` on an NTZ input first casts it to an instant *in the
    session timezone*, so the same stored value exports different numbers
    under different driver timezones — the cross-engine oracle (DuckDB's
    naive TIMESTAMP + ``epoch_us``) then only matches when the session
    happens to be UTC. ``timestampdiff`` against an NTZ epoch literal
    stays entirely in wall-clock space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), c
    )


# SQL-string rendering of :func:`epoch_us` for use inside F.expr.
EPOCH_US_SQL = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
)
