"""Snapshot-table sources.

The reference extracts from four source families — SQL-over-HTTP scans,
AWS API paginated scans, K8s API scans, and template fetches (reference
`lambda/etl_deepflow/neptune_etl_deepflow.py:116-136`,
`lambda/etl_aws/neptune_etl_aws.py:356-782`,
`lambda/etl_cfn/neptune_etl_cfn.py:169-198`). In this engine every
source materializes as a columnar Parquet snapshot table read through
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free — the collect_* flatten step of
the reference becomes a plain ``select`` projection (SURVEY §2.1 SRC1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated snapshot tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver parquet stores timestamps as TIMESTAMP(NANOS), which Spark
# surfaces as nanos-since-epoch longs under
# spark.sql.legacy.parquet.nanosAsLong (see session.get_spark). These
# columns are restored to TimestampType (microsecond precision — same
# truncation DuckDB applies when reading TIMESTAMP_NS).
_NANOS_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one snapshot table. Plain parquet scan → full pushdown."""
    # Runtime-settable; required even when the session wasn't built by
    # session.get_spark (e.g. the verification driver's own session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several snapshot tables at once."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register snapshot tables as temp views for the SQL surface."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
