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
    """Register a certified query and (optionally) its DuckDB oracle.

    Duplicate names are an error: plan modules import in a fixed order,
    so a name collision would silently SHADOW the earlier query (later
    module wins) and the registry count would drift from the number of
    register() calls — exactly how round 5's q_decontaminate briefly
    vanished. Module re-imports are safe (importlib caches the module,
    so register runs once per name)."""
    if name in QUERIES:
        raise ValueError(
            f"duplicate query registration: {name!r} — pick a distinct q-id"
        )
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql
