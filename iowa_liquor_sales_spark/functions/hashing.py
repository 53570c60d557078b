"""Engine-portable hashing primitives.

MinHash/SimHash/fingerprinting need integer hashes that are reproducible
across engines (the DuckDB oracle must compute the same bits). Spark's
``hash``/``xxhash64`` have no DuckDB twin, so the engine standardizes on
md5-derived hashes: ``hash60(s)`` = first 15 hex digits of md5 as a
non-negative 60-bit integer. In Spark that is
``conv(substr(md5(s),1,15),16,10)`` and in DuckDB
``('0x' || substr(md5(s),1,15))::BIGINT`` — identical values.

md5 here is a *partitioner/fingerprint*, not security. It is a built-in JVM
codegen expression on both sides, so the hot path stays vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def hash60(col: Column | str) -> Column:
    """Non-negative 60-bit integer hash of a string column (fits in int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60` (bit-identical)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# Universal-hash family over the Mersenne prime 2^31-1: sig_i(x) =
# (a_i * (hash60(x) mod P) + b_i) mod P. One md5 per input, k cheap affine
# transforms — the classic MinHash permutation family. Operands stay below
# 2^62, so the arithmetic is exact int64 in any engine (and ANSI-safe).
MERSENNE31 = 2_147_483_647


def affine_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) streams derived from md5 — reproducible as
    plain literals in the SQL oracle."""
    import hashlib

    a = [
        int(hashlib.md5(f"mh_a_{i}".encode()).hexdigest()[:8], 16)
        % (MERSENNE31 - 1)
        + 1
        for i in range(num_hashes)
    ]
    b = [
        int(hashlib.md5(f"mh_b_{i}".encode()).hexdigest()[:8], 16) % MERSENNE31
        for i in range(num_hashes)
    ]
    return a, b
