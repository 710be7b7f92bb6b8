"""SRC1 as a Spark 4 **custom Python data source**: partitioned
paginated-API ingestion.

The reference's resource scans are sequential NextToken loops over a
paginated REST API (describe_instances pagination,
neptune_etl_aws.py:356-428 and the eleven sibling collect_* scans).
The Spark-idiomatic form is a DataSource V2 (Python API, Spark 4):
the page space is sharded into ``InputPartition`` ranges so a
1000-executor cluster ingests pages in parallel — pagination becomes
the SOURCE's partitioning, not a driver-side loop — and Catalyst sees
a plain relation it can project/filter like any other scan.

The "API" here is a deterministic synthetic pager (`_fetch_page`) —
the same fixture posture as the CloudWatch metric seam
(sources/metrics.py): the transport is swappable, the paging/
partitioning contract is the thing under test, and determinism makes
the relation SQL-recomputable so the driver gate certifies the whole
ingestion path (q_paginated_scan).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.session import SparkSession

SCHEMA = (
    "instance_id BIGINT, name STRING, state STRING, az STRING, "
    "cpu_cores INT, page BIGINT"
)

_STATES = ("running", "stopped", "pending")


def _row(i: int, page_size: int) -> tuple:
    """Deterministic synthetic API record for global row ``i`` —
    mirrors the shape of a describe_instances item (id, name, state,
    az, size) and is reproducible in SQL (the oracle recomputes it
    from ``range``)."""
    state = _STATES[0] if i % 7 < 5 else (_STATES[1] if i % 7 < 6 else _STATES[2])
    return (
        i,
        f"inst-{i}",
        state,
        f"az-{i % 3}",
        2 ** (i % 5),
        i // page_size,
    )


def _fetch_page(page: int, page_size: int, total_rows: int) -> list[tuple]:
    """One page of the synthetic API: rows [page·size, (page+1)·size) ∩
    [0, total). A real connector swaps the body for an HTTP call with
    the page token; everything upstream (partition planning) and
    downstream (schema, Catalyst) is unchanged."""
    lo = page * page_size
    hi = min(lo + page_size, total_rows)
    return [_row(i, page_size) for i in range(lo, hi)]


class _PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page = start_page
        self.end_page = end_page


class _PaginatedScanReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total_rows = int(options.get("total_rows", 10_000))
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_partition = int(options.get("pages_per_partition", 8))

    def partitions(self) -> list[InputPartition]:
        n_pages = (self.total_rows + self.page_size - 1) // self.page_size
        step = max(1, self.pages_per_partition)
        return [
            _PageRange(p, min(p + step, n_pages))
            for p in range(0, n_pages, step)
        ] or [_PageRange(0, 0)]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in range(partition.start_page, partition.end_page):
            yield from _fetch_page(page, self.page_size, self.total_rows)


class _PaginatedStreamReader(DataSourceStreamReader):
    """Micro-batch form of the same pager: the OFFSET is the page
    number, so each micro-batch ingests the pages that 'arrived' since
    the last batch — the reference's 15-minute re-scan cadence
    (stack:178-183) becomes an incremental streaming source instead of
    a full re-read. ``pages_per_poll`` throttles how many pages a
    single ``latestOffset`` advance exposes (rate limiting at the
    source, where the reference throttles its API calls)."""

    def __init__(self, options: dict):
        self.total_rows = int(options.get("total_rows", 10_000))
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_poll = int(options.get("pages_per_poll", 1 << 30))
        self.n_pages = (self.total_rows + self.page_size - 1) // self.page_size
        self._current = 0

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        self._current = min(self.n_pages, self._current + self.pages_per_poll)
        return {"page": self._current}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [_PageRange(int(start["page"]), int(end["page"]))]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in range(partition.start_page, partition.end_page):
            yield from _fetch_page(page, self.page_size, self.total_rows)

    def commit(self, end: dict) -> None:
        pass  # synthetic pager: nothing to ack


class PaginatedScanDataSource(DataSource):
    """``spark.read.format("paginated_scan")`` (batch) and
    ``spark.readStream.format("paginated_scan")`` (micro-batch page
    tail) — register once per session via
    :func:`register_paginated_source`."""

    @classmethod
    def name(cls) -> str:
        return "paginated_scan"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PaginatedScanReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _PaginatedStreamReader(self.options)


def register_paginated_source(spark: SparkSession) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(PaginatedScanDataSource)
