"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship flow-edges aggregation at sf0.001.
``queries()`` / ``oracle_sql()`` expose every certified operator from
SURVEY.md §2 via the plan registry in ``etl_neptune_spark.plans``.
"""

from __future__ import annotations

import importlib
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the plan modules populates the registry.
_PLAN_MODULES = [
    "etl_neptune_spark.plans.flow",
    "etl_neptune_spark.plans.relational",
    "etl_neptune_spark.plans.joins",
    "etl_neptune_spark.plans.graph",
    "etl_neptune_spark.plans.llm",
    "etl_neptune_spark.plans.streaming",
    "etl_neptune_spark.plans.timeseries",
    "etl_neptune_spark.plans.metrics",
    "etl_neptune_spark.plans.corpus",
    "etl_neptune_spark.plans.tpch",
    "etl_neptune_spark.plans.linkage",
    "etl_neptune_spark.plans.curation",
    "etl_neptune_spark.plans.formats_q",
    "etl_neptune_spark.plans.web",
    "etl_neptune_spark.plans.geo",
]


def _registry():
    for m in _PLAN_MODULES:
        importlib.import_module(m)
    from etl_neptune_spark.plans import ORACLE, QUERIES

    return QUERIES, ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries, _ = _registry()
    return queries["q_flow_edges"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry()[0])


def oracle_sql() -> dict[str, str]:
    return dict(_registry()[1])
