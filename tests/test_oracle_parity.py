"""Mirror of the driver's t2 gate: every declared query vs its DuckDB
oracle at sf0.001 (the driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import compare, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle():
    # NON_SQL_QUERIES is the explicit, justified rows-only allowlist
    # (driver contract: omit the oracle for non-SQL-expressible ops).
    missing = set(QUERIES) - set(ORACLES) - entry_mod.NON_SQL_QUERIES
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"
    dangling = set(ORACLES) - set(QUERIES)
    assert not dangling, f"oracles without queries: {sorted(dangling)}"
    # The allowlist may not silently shadow queries that DO have oracles.
    assert not (entry_mod.NON_SQL_QUERIES & set(ORACLES))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in entry_mod.NON_SQL_QUERIES:
        # Rows-only check, mirroring the driver's weaker gate for
        # non-SQL-expressible ops.
        assert df.count() > 0 and df.columns
        return
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
