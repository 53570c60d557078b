"""Silver-stage coercions (reference src/transform.py:11-23 re-expressed).

The reference cleans each 50k-row pandas chunk with:
  - ``pd.to_datetime(df["date"], errors="coerce")``      (line 12)
  - ``pd.to_numeric(df[c], errors="coerce").fillna(0)``  (lines 15-21)

Here those become Catalyst expressions applied to one DataFrame; Spark
parallelizes what the reference runs serially. ``try_*`` variants are used so
behavior is errors->NULL under both ANSI and non-ANSI sessions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def coerce_timestamp(col: Column | str, fmt: str | None = None) -> Column:
    """Parse a string column to timestamp; malformed values become NULL
    (reference C1, src/transform.py:12)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)


def coerce_numeric(col: Column | str, dtype: str = "double") -> Column:
    """Cast with errors->NULL (reference C2, src/transform.py:15-21)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def fill_zero(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Null->0 fill after coercion (reference C3, src/transform.py:21)."""
    return df.na.fill(0, subset=list(cols))


def to_silver(
    df: DataFrame,
    ts_cols: Sequence[str] = ("date",),
    int_cols: Sequence[str] = (),
    num_cols: Sequence[str] = (),
    fill: bool = True,
) -> DataFrame:
    """Full silver transform: one narrow stage, no shuffle — Catalyst fuses
    every cast into a single whole-stage-codegen projection over the scan, so
    at 100 TB this runs at parquet-scan speed with zero data movement."""
    exprs: list[Column] = []
    for f in df.schema.fields:
        if f.name in ts_cols:
            exprs.append(coerce_timestamp(f.name).alias(f.name))
        elif f.name in int_cols:
            exprs.append(coerce_numeric(f.name, "int").alias(f.name))
        elif f.name in num_cols:
            exprs.append(coerce_numeric(f.name, "double").alias(f.name))
        else:
            exprs.append(F.col(f.name))
    out = df.select(*exprs)
    if fill:
        out = fill_zero(out, list(int_cols) + list(num_cols))
    return out
