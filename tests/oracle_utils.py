"""Local mirror of the driver's DuckDB-oracle comparison: row count, column
names, and an order-insensitive value comparison (sorted columns, sorted
rows, NaN-safe)."""

from __future__ import annotations

import math
import struct
from datetime import date, datetime
from decimal import Decimal

import duckdb

from iowa_liquor_sales_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        # Integral decimals beyond float64's exact-int range (2^53) must
        # compare exactly — float() would silently drop low bits (the
        # round-1 q_simhash driver failure mode).
        if v == v.to_integral_value() and abs(v) > 2**53:
            return ("i", int(v))
        return ("f", struct.pack("<d", float(v)))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # BITWISE: the driver hashes raw values, so the local gate must
        # be at least as strict — a 1-ulp engine divergence that
        # round(v, 9) would forgive is exactly what the driver catches
        # (r3 verdict item 2). Signed zero is NOT folded: -0.0 vs +0.0
        # counts as a mismatch, same as a bitwise hash would.
        return ("f", struct.pack("<d", v))
    if isinstance(v, int):
        # Small ints keep the float encoding (lenient across int/float/
        # Decimal column types); big ints compare exactly.
        if abs(v) > 2**53:
            return ("i", v)
        return ("f", struct.pack("<d", float(v)))
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    rel = con.sql(sql)
    duck_cols_raw = rel.columns
    duck_rows = rel.fetchall()
    duck_cols = sorted(duck_cols_raw)
    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    s_sorted = sorted(
        tuple(_norm(r[c]) for c in spark_cols) for r in spark_rows
    )
    d_idx = [duck_cols_raw.index(c) for c in duck_cols]
    d_sorted = sorted(
        tuple(_norm(r[i]) for i in d_idx) for r in duck_rows
    )
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            return False, f"first value mismatch at sorted row {i}: spark={a} duck={b}"
    return True, "ok"
