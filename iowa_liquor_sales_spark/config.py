"""Env-driven job configuration (reference O5, ``src/config.py:1-21``).

The reference loads API URL, Postgres credentials, CHUNK_ROWS and TMP_DIR
from dotenv. The engine's equivalents, with the same override-by-env
contract (no dotenv dependency — plain ``os.environ``): data directories,
parallelism, and sink settings. ``CHUNK_ROWS`` has no engine meaning
(partitioning replaced chunking); its closest analog is
``maxRecordsPerFile`` on writers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class EngineConfig:
    # Data roots (reference TMP_DIR / RAW_DIR / CLEAN_DIR)
    data_dir: str = field(default_factory=lambda: _env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    work_dir: str = field(default_factory=lambda: _env("IOWA_WORK_DIR", "/tmp/iowa_engine"))
    # Parallelism (reference CHUNK_ROWS → partition sizing)
    cpus: int = field(default_factory=lambda: int(_env("SPARK_GRAFT_CPUS", "32")))
    shuffle_partitions: int = field(
        default_factory=lambda: int(_env("IOWA_SHUFFLE_PARTITIONS", "0")) or None  # type: ignore[return-value]
    )
    max_records_per_file: int = field(
        default_factory=lambda: int(_env("IOWA_MAX_RECORDS_PER_FILE", "0")) or None  # type: ignore[return-value]
    )
    # Relational sink (reference PG_* / Postgres creds) — unset by default;
    # correctness tests never need a live database (SURVEY §7.2 step 5).
    jdbc_url: str | None = field(default_factory=lambda: os.environ.get("IOWA_JDBC_URL"))
    jdbc_table: str = field(default_factory=lambda: _env("IOWA_JDBC_TABLE", "iowa_liquor_sales"))

    def resolved_shuffle_partitions(self) -> int:
        return self.shuffle_partitions or self.cpus


def load_config() -> EngineConfig:
    return EngineConfig()
