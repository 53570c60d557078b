"""Audit every oracle_sql() entry for DuckDB HUGEINT (int128) output columns.

HUGEINT results take a different client-conversion path than BIGINT (e.g.
float64 via pandas/arrow), which loses low bits for values > 2^53 and broke
the driver's hash_match for q_simhash in round 1.  Any flagged column should
get an explicit CAST(... AS BIGINT) in the oracle.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tests.oracle_utils import duckdb_con  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb_con(sf_dir)
    bad = 0
    for name, sql in entry.oracle_sql().items():
        try:
            rel = con.sql(sql)
            hits = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")
            ]
        except Exception as e:  # pragma: no cover - audit tool
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        if hits:
            bad += 1
            print(f"{name}: {hits}")
    print(f"checked {len(entry.oracle_sql())} oracles, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
