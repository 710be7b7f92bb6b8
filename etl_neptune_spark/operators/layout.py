"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

No reference counterpart (the reference's store orders by primary key
only, e.g. the ClickHouse sink in `lambda/etl_df/neptune_etl_df.py` —
one sort key). At 100 TB, parquet row-group min/max stats prune scans
only along the physical sort order; Z-ordering interleaves the bits of
several columns so range predicates on ANY of them keep pruning —
the Delta/Iceberg `OPTIMIZE ZORDER BY` recipe, built here from plain
bit arithmetic so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    2·bits-wide Morton (Z-order) code: x in even positions, y in odd.

    Pure shift/mask expression tree — constant-folds per row inside
    codegen, no UDF. Inputs must already be bucketed to [0, 2^bits)."""
    z: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        bit_pair = xb.bitwiseOR(yb)
        z = bit_pair if z is None else z.bitwiseOR(bit_pair)
    return z


def morton_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB/ANSI rendering of ``morton_interleave`` — kept next to
    the Spark expression so the two cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_by(
    df: DataFrame, x: Column, y: Column, bits: int = 8, num_files: int | None = None
) -> DataFrame:
    """Cluster a DataFrame by the Z-order of two bucketed dimensions,
    ready for a parquet write whose row-group min/max stats prune on
    both columns.

    ``repartitionByRange`` on the code gives globally disjoint z-ranges
    per output file (the property data skipping needs); the within-
    partition sort finishes the clustering. One range shuffle — the
    same cost as a plain global sort by one column."""
    out = df.withColumn("__z", morton_interleave(x, y, bits))
    if num_files:
        out = out.repartitionByRange(num_files, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z").drop("__z")
