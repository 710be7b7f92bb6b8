"""Certified queries for the geospatial grid-join operators: radius
join via grid-cell bucketing with neighbor replication, and
point-in-polygon (bbox) containment via box→covering-cell cover.

No reference counterpart (the reference's joins are key/substring
joins, SURVEY §2.3) — these are the standard distributed-spatial
patterns an analytics engine needs once rows carry coordinates:

- ``q_grid_join`` — "all pairs within radius R" WITHOUT the all-pairs
  cross join: bucket both sides into R×R grid cells, replicate the
  smaller side to its 3×3 neighborhood (any pair within R lands in
  adjacent cells, so the equi-join on cell is a superset), then
  re-filter with the EXACT squared distance. Replication factor is a
  CONSTANT 9 regardless of data size; the shuffle is an equi-join on
  the cell key — the same bounded-replication idea as the bucketed
  range join (operators/timeseries.py), rotated into 2-D.
- ``q_geofence`` — point-in-box containment as an equi-join: each box
  explodes into the grid cells it covers (bounded by box-area /
  cell-area, documented), points join on their single cell, and the
  exact containment predicate re-filters. No BroadcastNestedLoopJoin,
  no per-box scan — the plan scales with points + covered cells.

Coordinates are synthesized DETERMINISTICALLY from integer keys
(multiplicative congruential mixes, pure BIGINT arithmetic), so the
DuckDB oracle rebuilds identical points and certifies the pair set /
containment set with the straightforward quadratic formulation — the
quadratic lives in the oracle, the grid plan in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

# World is [0, 100000)²; radius R = grid cell side = 5000.
R = 5000
R2 = R * R
CELL = R
GEO_WORLD = 100000


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") * 48271 % GEO_WORLD).alias("cx"),
        (F.col("c_custkey") * 69621 % GEO_WORLD).alias("cy"),
    )


def q_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join customers×suppliers within R=5000: per customer with
    ≥1 supplier in range, the neighbor count and exact min squared
    distance. Supplier side (the smaller) replicates to its 3×3 cell
    neighborhood; the join is a hash equi-join on (cell_x, cell_y)."""
    cust = _customer_points(spark, sf_dir).withColumn(
        "gx", F.floor(F.col("cx") / CELL)
    ).withColumn("gy", F.floor(F.col("cy") / CELL))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_suppkey") * 16807 % GEO_WORLD).alias("sx"),
        (F.col("s_suppkey") * 39916801 % GEO_WORLD).alias("sy"),
    )
    # Constant ×9 replication: a pair within R always falls in the same
    # or an adjacent cell when the cell side equals R.
    replicated = (
        supp.withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.floor(F.col("sx") / CELL) + F.col("dx")).alias("gx"),
            (F.floor(F.col("sy") / CELL) + F.col("dy")).alias("gy"),
        )
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    pairs = (
        cust.join(replicated, ["gx", "gy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= R2)
    )
    return pairs.groupBy("c_custkey").agg(
        F.count("*").alias("n_near"),
        F.min("d2").alias("min_d2"),
    )


register(
    "q_grid_join",
    q_grid_join,
    f"""
    WITH c AS (
        SELECT c_custkey,
               c_custkey * 48271 % {GEO_WORLD} AS cx,
               c_custkey * 69621 % {GEO_WORLD} AS cy
        FROM customer
    ),
    s AS (
        SELECT s_suppkey,
               s_suppkey * 16807 % {GEO_WORLD} AS sx,
               s_suppkey * 39916801 % {GEO_WORLD} AS sy
        FROM supplier
    )
    SELECT c_custkey,
           count(*) AS n_near,
           CAST(min((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy))
                AS BIGINT) AS min_d2
    FROM c JOIN s
      ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {R2}
    GROUP BY c_custkey
    """,
)

# Geofence boxes: one 30000×40000 box per region, deterministically
# placed. A box covers at most ceil(30000/5000+1)·ceil(40000/5000+1)
# = 7·9 = 63 cells of the R-sized grid — the replication bound.
BOX_W = 30000
BOX_H = 40000


def q_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-bbox containment as a covering-cell equi-join: each
    region's box explodes into the grid cells it overlaps (≤63 cells),
    customer points join on their single cell, exact containment
    re-filters. Per region: points inside + exact key checksum."""
    boxes = load_table(spark, sf_dir, "region").select(
        "r_regionkey",
        "r_name",
        (F.col("r_regionkey") * 48271 % 7 * 10000).alias("x0"),
        (F.col("r_regionkey") * 69621 % 6 * 10000).alias("y0"),
    )
    covered = boxes.select(
        "r_regionkey",
        "r_name",
        "x0",
        "y0",
        F.explode(
            F.sequence(
                F.floor(F.col("x0") / CELL),
                F.floor((F.col("x0") + BOX_W - 1) / CELL),
            )
        ).alias("gx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("y0") / CELL),
                F.floor((F.col("y0") + BOX_H - 1) / CELL),
            )
        ).alias("gy"),
    )
    pts = _customer_points(spark, sf_dir).select(
        "c_custkey",
        "cx",
        "cy",
        F.floor(F.col("cx") / CELL).alias("gx"),
        F.floor(F.col("cy") / CELL).alias("gy"),
    )
    inside = covered.join(pts, ["gx", "gy"]).filter(
        (F.col("cx") >= F.col("x0"))
        & (F.col("cx") < F.col("x0") + BOX_W)
        & (F.col("cy") >= F.col("y0"))
        & (F.col("cy") < F.col("y0") + BOX_H)
    )
    return inside.groupBy("r_name").agg(
        F.count("*").alias("n_inside"),
        F.sum("c_custkey").alias("key_sum"),
    )


register(
    "q_geofence",
    q_geofence,
    f"""
    WITH b AS (
        SELECT r_name,
               r_regionkey * 48271 % 7 * 10000 AS x0,
               r_regionkey * 69621 % 6 * 10000 AS y0
        FROM region
    ),
    c AS (
        SELECT c_custkey,
               c_custkey * 48271 % {GEO_WORLD} AS cx,
               c_custkey * 69621 % {GEO_WORLD} AS cy
        FROM customer
    )
    SELECT r_name,
           count(*) AS n_inside,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum
    FROM b JOIN c
      ON cx >= x0 AND cx < x0 + {BOX_W}
     AND cy >= y0 AND cy < y0 + {BOX_H}
    GROUP BY r_name
    """,
)
