"""Certified-query registry.

Every operator from SURVEY.md §2 is certified by a named query: a
PySpark DataFrame program in ``QUERIES[name]`` plus (where the
semantics are SQL-expressible) a DuckDB-equivalent ANSI-SQL string in
``ORACLE[name]``. The driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value hash.

Plan modules call ``register(name, fn, sql)`` at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, fn: QueryFn, sql: str | None = None) -> None:
    """Register a certified query and (optionally) its DuckDB oracle."""
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql
