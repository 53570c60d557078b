"""Session-timezone independence: every epoch-us export goes through
functions.dates.epoch_us (wall-clock NTZ arithmetic), so oracle parity
must hold under any driver timezone — the external driver's zone is not
ours to choose. Regression for the unix_micros-on-NTZ trap (instant
reinterpretation in the session zone shifted exports by the UTC offset).
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, duckdb_con

import __spark_entry__ as entry_mod

TZ_QUERIES = [
    "q_sliding_window",
    "q_session_native",
    "q_events_window",
    "q_asof_join",
    "q_sessionize",
    "q_resample_ffill",
    "q_window_distinct",
]


@pytest.mark.parametrize("tz", ["Asia/Kathmandu", "America/New_York"])
def test_time_queries_under_non_utc_session(spark, sf_dir, tz):
    con = duckdb_con(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        for name in TZ_QUERIES:
            ok, msg = compare(queries[name](spark, sf_dir), con, oracles[name])
            assert ok, f"{name} under {tz}: {msg}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
