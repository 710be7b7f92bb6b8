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


def load_table(spark: SparkSession, sf_dir: str, name: str, raw_filter=None) -> DataFrame:
    """Read one snapshot table. Plain parquet scan → full pushdown.

    ``raw_filter`` (a Column predicate over the *raw* parquet schema,
    i.e. before the nanos→timestamp restoration) is applied directly on
    the scan so simple comparisons against literals reach the reader as
    ``PushedFilters`` — the hook the lookback-window plans use to get
    row-group / partition pruning on the time axis.
    """
    # Runtime-settable; required even when the session wasn't built by
    # session.get_spark (e.g. the verification driver's own session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if raw_filter is not None:
        df = df.filter(raw_filter)
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


# Driver-resolved time anchors, cached per (dir, table, column). One tiny
# bounded action per process per table — the one place a driver-side value
# is the right plan (VERDICT r1): a `max(ts)` scan is answerable from
# parquet footer stats (spark.sql.parquet.aggregatePushdown), and turning
# the anchor into a literal is what lets the main scan's lookback
# predicate partition-prune instead of reading all history. Mirrors the
# reference's source-side literal window (etl_df/neptune_etl_df.py:641,
# `time > now() - 300` pushed into the store).
_ANCHOR_CACHE: dict[tuple[str, str, str], int | None] = {}


def max_ts_nanos(spark: SparkSession, sf_dir: str, table: str = "events", col: str = "ts") -> int | None:
    """Max raw-nanos value of a TIMESTAMP(NANOS)-as-bigint column."""
    key = (sf_dir.rstrip("/"), table, col)
    if key not in _ANCHOR_CACHE:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        prev = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        try:
            row = (
                spark.read.parquet(f"{key[0]}/{table}.parquet")
                .agg(F.max(col).alias("mx"))
                .first()
            )
        finally:
            spark.conf.set("spark.sql.parquet.aggregatePushdown", prev)
        _ANCHOR_CACHE[key] = None if row is None else row["mx"]
    return _ANCHOR_CACHE[key]


def lookback_cutoff_nanos(
    spark: SparkSession, sf_dir: str, days: int, table: str = "events", col: str = "ts"
) -> int | None:
    """Raw-nanos cutoff for a trailing ``days`` window ending at max(ts).

    Computed in microsecond-truncated space — ``floor(ns/1000) >= C_us``
    iff ``ns >= C_us * 1000`` — so a raw-column comparison against this
    literal is bit-identical to filtering the restored TimestampType
    column with ``ts >= max_ts - INTERVAL days DAYS`` (both sides
    microsecond precision), while remaining a plain pushable predicate.
    """
    max_ns = max_ts_nanos(spark, sf_dir, table, col)
    if max_ns is None:
        return None
    lookback_us = days * 86_400 * 1_000_000
    return (max_ns // 1_000 - lookback_us) * 1_000


def load_events_lookback(spark: SparkSession, sf_dir: str, days: int) -> DataFrame:
    """``events`` restricted to the trailing ``days`` window, with the
    cutoff resolved to a literal so the predicate reaches the parquet
    scan (``PushedFilters`` / row-group stats / partition pruning on a
    date-partitioned layout). At 100 TB this is the difference between
    scanning 5 minutes and scanning all history (VERDICT r1 §Perf)."""
    cutoff = lookback_cutoff_nanos(spark, sf_dir, days)
    if cutoff is None:
        return load_table(spark, sf_dir, "events", raw_filter=F.lit(False))
    return load_table(spark, sf_dir, "events", raw_filter=F.col("ts") >= F.lit(cutoff))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several snapshot tables at once."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register snapshot tables as temp views for the SQL surface."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
