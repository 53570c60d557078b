"""Sinks (reference S4, S6-S10 re-expressed).

- Parquet sinks replace the reference's per-chunk ``df.to_parquet`` files
  (``src/extract.py:51-52``, ``src/transform.py:35-37``); deterministic task
  output + ``mode("overwrite")`` gives the same restartability as its
  numbered chunk files.
- The relational sink replaces the in-memory-CSV + Postgres ``COPY FROM
  STDIN`` bulk load (``src/load.py:35-44``). Spark's JDBC writer does
  batched inserts per partition; ``reWriteBatchedInserts=true`` is the knob
  that gets Postgres within range of COPY. For full COPY parity there is a
  ``foreachPartition`` fast path, import-gated on psycopg2 so correctness
  tests never need a live database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` is the scale lever: partitioning the
    silver/gold tables by e.g. year(date) turns every date-windowed query
    into a partition-pruned scan."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    null_value: str = "\\N",
    header: bool = False,
    mode: str = "overwrite",
) -> None:
    """CSV sink in the reference's COPY wire format (S7, src/load.py:36-38:
    ``na_rep="\\N"``, no header)."""
    (
        df.write.mode(mode)
        .option("nullValue", null_value)
        .option("emptyValue", "")
        .option("header", header)
        .csv(path)
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Standard JDBC sink (S8). ``reWriteBatchedInserts`` collapses the
    batch into multi-row INSERTs server-side — the documented way to
    approach COPY throughput without a native path. ``num_partitions``
    bounds concurrent connections against the database."""
    props = {"reWriteBatchedInserts": "true", "batchsize": str(batch_size)}
    if properties:
        props.update(properties)
    out = df.coalesce(num_partitions) if num_partitions else df
    writer = out.write.mode(mode)
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.jdbc(url=url, table=table, properties=props)


def write_postgres_copy(
    df: DataFrame,
    dsn: str,
    table: str,
    columns: list[str] | None = None,
) -> None:
    """COPY-speed Postgres sink: each partition serializes itself to CSV in
    memory and streams it through ``COPY ... FROM STDIN`` — the reference's
    bulk-load trick (src/load.py:35-44), but one COPY per partition in
    parallel instead of a serial chunk loop.

    Requires psycopg2 on the executors; raises ImportError otherwise (the
    JDBC sink is the dependency-free path).
    """
    cols = columns or df.columns

    def _copy_partition(rows) -> None:
        import csv
        import io

        import psycopg2  # deferred: executors only, optional dependency

        buf = io.StringIO()
        writer = csv.writer(buf)
        n = 0
        for row in rows:
            writer.writerow(["\\N" if v is None else v for v in row])
            n += 1
        if n == 0:
            return
        buf.seek(0)
        conn = psycopg2.connect(dsn)
        try:
            with conn.cursor() as cur:
                cur.copy_expert(
                    f"COPY {table} ({', '.join(cols)}) FROM STDIN "
                    "WITH (FORMAT CSV, NULL '\\N')",
                    buf,
                )
            conn.commit()
        finally:
            conn.close()

    df.select(*cols).foreachPartition(_copy_partition)


def write_postgres_atomic(
    df: DataFrame,
    dsn: str,
    table: str,
    columns: list[str] | None = None,
    connect=None,
    copy_fn=None,
) -> None:
    """All-or-nothing relational load (reference ``src/load.py:52-64``
    parity: one commit after all chunks, so a mid-load failure leaves
    the target untouched).

    :func:`write_postgres_copy` commits per partition — fast, but a
    failed job leaves a partial table where the reference leaves
    nothing. This wrapper restores atomicity WITHOUT serializing the
    load: partitions COPY concurrently into a staging table (invisible
    to readers), then one driver-side transaction swaps staging into
    place via ``ALTER TABLE ... RENAME``. Postgres DDL is transactional,
    so readers see either the complete old table or the complete new
    one, never a partial load.

    ``connect``/``copy_fn`` are injectable for testing without a live
    database (default: ``psycopg2.connect`` / :func:`write_postgres_copy`).
    """
    if connect is None:
        import psycopg2  # deferred: optional dependency

        connect = psycopg2.connect
    copy_fn = copy_fn or write_postgres_copy
    staging, old = f"{table}__staging", f"{table}__old"

    def _exec(statements: list[str]) -> None:
        conn = connect(dsn)
        try:
            with conn.cursor() as cur:
                for stmt in statements:
                    cur.execute(stmt)
            conn.commit()
        finally:
            conn.close()

    _exec(
        [
            f"DROP TABLE IF EXISTS {staging}",
            f"CREATE TABLE {staging} (LIKE {table} INCLUDING ALL)",
        ]
    )
    # Any failure here (executor crash, constraint violation) aborts with
    # the target table untouched — only the staging table is dirty, and
    # the next run drops it.
    copy_fn(df, dsn, staging, columns)
    # The swap: one transaction, target is never absent or partial.
    _exec(
        [
            f"DROP TABLE IF EXISTS {old}",
            f"ALTER TABLE {table} RENAME TO {table.split('.')[-1]}__old",
            f"ALTER TABLE {staging} RENAME TO {table.split('.')[-1]}",
            f"DROP TABLE {old}",
        ]
    )


def write_parquet_dynamic_overwrite(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Incremental-refresh sink: overwrite ONLY the hive partitions
    present in ``df``, leaving every other partition untouched
    (``partitionOverwriteMode=dynamic``). The standard nightly-batch
    pattern — reprocess yesterday's date partition in place without
    rewriting (or even listing) the other 3000 days of a 100 TB table;
    with the default STATIC mode the same call would silently delete
    every existing partition first.

    Scoped per-write via ``DataFrameWriter.option`` rather than mutating
    the session conf, so concurrent writers with different semantics
    don't race on a global setting.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
