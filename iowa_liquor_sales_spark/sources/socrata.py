"""Custom Python DataSource: a Socrata-style paged scan (reference S1).

The reference's extract loop (``src/extract.py:18-60``) issues sequential
HTTP GETs with ``$limit/$offset`` paging and stops on an empty page — one
page at a time, single-threaded, ~5,450 rows/s (BASELINE.md). The faithful
*engine-side* design is a DataSource whose **partitions are the pages**:
the driver plans one ``InputPartition`` per page range and executors fetch
pages concurrently — the same protocol, parallelized by Spark's scheduler.

Because this container has no network, the page fetcher reads staged page
files (one CSV file per page, exactly what the reference's fetcher would
see in an HTTP body). Swapping ``_fetch_page`` for a real
``requests.get(API_URL, params={"$limit": ..., "$offset": ...})`` is the
only change needed for a live source; the Spark integration (schema,
partition planning, per-partition iteration) is identical and is what this
module actually exercises.

Deployment note: the DataSource class is cloudpickled **by reference**, so
Python workers must be able to import this package — run from the repo
root, install the package, or ship it with ``spark-submit --py-files`` /
``sc.addPyFile`` (the normal contract for any Python package on a
cluster).

Registration:
    spark.dataSource.register(SocrataPagedDataSource)
    df = (spark.read.format("socrata_paged")
          .schema(schema)  # all-string bronze schema; silver owns casts
          .option("pages_dir", staged_dir)
          .load())
"""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def fetch_with_retry(
    fetch,
    target: str,
    retries: int = 3,
    timeout: float = 60.0,
    backoff: float = 0.5,
    sleep=None,
) -> object:
    """Retry/timeout envelope for the per-page fetch — the engine analog
    of the reference extractor's ``requests.get(..., timeout=60)`` inside
    an orchestrator-retried task (``src/extract.py:18-31``, timeout at
    ``:25``). Spark already retries whole TASKS; this wraps the single
    network call so one flaky page costs a sub-second backoff instead of
    a task re-run (which would refetch every page the task owns).

    ``fetch(target, timeout)`` does the I/O (a real source passes
    ``lambda u, t: requests.get(u, timeout=t).text``); exponential
    backoff between attempts; the last failure propagates so Spark's
    task retry remains the outer safety net. ``sleep`` is injectable for
    tests.
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fetch(target, timeout)
        except Exception as e:  # noqa: BLE001 - network layer boundary
            last = e
            if attempt < retries:
                do_sleep(backoff * (2**attempt))
    raise last


class SocrataPagedDataSource(DataSource):
    """``format("socrata_paged")`` — one partition per API page."""

    @classmethod
    def name(cls) -> str:
        return "socrata_paged"

    def schema(self) -> str:
        # Bronze contract: everything arrives as string (CSV wire format);
        # callers normally pass an explicit schema instead.
        first = sorted(glob.glob(os.path.join(self.options["pages_dir"], "*.csv")))
        if not first:
            return "value string"
        with open(first[0], newline="") as f:
            header = next(csv.reader(f))
        return ", ".join(f"`{c}` string" for c in header)

    def reader(self, schema) -> "SocrataPagedReader":
        return SocrataPagedReader(self.options, schema)

    def streamReader(self, schema) -> "SocrataPagedStreamReader":
        return SocrataPagedStreamReader(self.options, schema)


class SocrataPagedReader(DataSourceReader):
    def __init__(self, options, schema):
        self.pages_dir = options["pages_dir"]
        self.n_cols = len(schema.fields)

    def partitions(self):
        # Plan-time page discovery = the reference's offset loop, but all
        # pages become independent tasks instead of a serial while-loop.
        # Zero pages (the reference's immediate empty-page stop) still
        # needs one empty partition: Spark invokes read() regardless.
        pages = sorted(glob.glob(os.path.join(self.pages_dir, "*.csv")))
        return [PagePartition(p) for p in pages] or [PagePartition(None)]

    def read(self, partition: PagePartition):
        if partition is None or partition.path is None:
            return
        # Executor-side "HTTP GET" — the process→network boundary of
        # src/extract.py:25 becomes a per-task fetch.
        rows = self._fetch_page(partition.path)
        for row in rows:
            yield tuple((v if v != "" else None) for v in row[: self.n_cols])

    @staticmethod
    def _fetch_page(path: str):
        """Stub for the network fetch: reads one staged page body through
        the same :func:`fetch_with_retry` envelope a live source would use
        (there: ``fetch=lambda u, t: requests.get(u, timeout=t).text`` —
        nothing else in the DataSource changes)."""
        body = fetch_with_retry(
            lambda target, _timeout: open(target, newline="").read(), path
        )
        reader = csv.reader(body.splitlines())
        header_skipped = False
        for row in reader:
            if not header_skipped:
                header_skipped = True
                continue
            yield row


class SocrataPagedStreamReader(DataSourceStreamReader):
    """Streaming twin of the paged scan: the reference's *incremental*
    chunk loop (``src/extract.py:46-57`` — fetch page, advance offset,
    repeat) as a Structured Streaming source. The offset IS the page
    index: ``latestOffset`` discovers how many pages exist right now
    (the live analog: probe ``$offset`` until the first empty page, or
    read a feed cursor), each microbatch plans **one partition per new
    page**, and executors fetch those pages in parallel. Checkpointed
    offsets give exactly-once page consumption across restarts — the
    property the reference's serial loop only gets by never crashing
    mid-run (its Airflow retry refetches everything).

    Driver-side work is O(1) per batch (a directory/page count); all row
    I/O happens on executors, unlike ``SimpleDataSourceStreamReader``
    which reads on the driver and caps at single-process throughput.

    Usage:
        spark.dataSource.register(SocrataPagedDataSource)
        stream = (spark.readStream.format("socrata_paged")
                  .schema(schema).option("pages_dir", staged_dir).load())
    """

    def __init__(self, options, schema):
        self.pages_dir = options["pages_dir"]
        self.n_cols = len(schema.fields)

    def _pages(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.pages_dir, "*.csv")))

    def initialOffset(self) -> dict:
        return {"page": 0, "last": ""}

    def latestOffset(self) -> dict:
        # The offset records the high-water page NAME, not just a count:
        # with a bare count, a late-arriving file that sorts before
        # already-consumed pages would shift the index→file mapping and
        # duplicate some pages while skipping the new one. Name-bounded
        # selection consumes each page at most once; a file whose name
        # sorts below the high-water mark is never consumed (the source
        # contract is append-only, lexicographically increasing page
        # names — exactly what an $offset pager or a feed cursor emits).
        pages = self._pages()
        return {
            "page": len(pages),
            "last": os.path.basename(pages[-1]) if pages else "",
        }

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last"), end.get("last")
        if lo is None or hi is None:
            # Legacy count-only checkpoint: fall back to index slicing.
            pages = self._pages()[start["page"] : end["page"]]
        else:
            pages = [
                p
                for p in self._pages()
                if (lo == "" or os.path.basename(p) > lo)
                and (hi != "" and os.path.basename(p) <= hi)
            ]
        # An empty batch still needs one (empty) partition — same contract
        # as the batch reader: Spark invokes read() regardless.
        return [PagePartition(p) for p in pages] or [PagePartition(None)]

    def read(self, partition: PagePartition):
        if partition is None or partition.path is None:
            return
        rows = SocrataPagedReader._fetch_page(partition.path)
        for row in rows:
            yield tuple((v if v != "" else None) for v in row[: self.n_cols])

    def commit(self, end: dict) -> None:
        # Nothing to clean up: pages are immutable staged bodies. A live
        # source could delete consumed staging files here.
        pass
