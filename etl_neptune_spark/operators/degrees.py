"""Graph degree metrics over an edge DataFrame.

The reference computes per-service out/in degree plus label-filtered
neighbor counts in a single Gremlin ``project()`` pass
(lambda/etl_deepflow/neptune_etl_deepflow.py:540-568), then derives
``is_entry_point = upstream_count == 0`` and
``has_db_dependency = db_count > 0`` (lines 566-568).

Spark-first: two grouped aggregations over the edge table (one keyed by
src, one by dst) joined full-outer on the node id — each is a partial+
final hash aggregate; the join key is the node id so the whole thing is
two shuffles of the (much smaller) aggregated sets, not of the raw
edges. Label-filtered counts ride along as ``count_if`` columns in the
same pass (the reference's "4 queries → 1 project()" optimization,
OPTIMIZATION-CHANGELOG.md:44, is the natural Spark plan).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def degree_metrics(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    dst_label_filters: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-node degree metrics from an edge list.

    Returns one row per node id appearing as src or dst:
    ``node, out_degree, in_degree, [out_weight,] [<name>_count...,]
    is_entry_point, ...`` where ``dst_label_filters`` maps an output
    column prefix to a predicate over the edge row (e.g. "db" →
    dst-is-database), counted on out-edges — the reference's
    db/cache-dependency counts.
    """
    out_aggs = [F.count("*").alias("out_degree")]
    if weight:
        out_aggs.append(F.sum(weight).alias("out_weight"))
    for name, pred in (dst_label_filters or {}).items():
        out_aggs.append(F.count_if(pred).alias(f"{name}_count"))
    outs = edges.groupBy(F.col(src).alias("node")).agg(*out_aggs)
    ins = edges.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("in_degree"))

    joined = outs.join(ins, "node", "full_outer")
    fill = {"out_degree": 0, "in_degree": 0}
    if weight:
        fill["out_weight"] = 0
    for name in dst_label_filters or {}:
        fill[f"{name}_count"] = 0
    result = joined.na.fill(fill)

    # Derived flags (neptune_etl_deepflow.py:566-568): an entry point has
    # no upstream callers; downstream/dependency flags from the counts.
    result = result.withColumn("is_entry_point", F.col("in_degree") == 0)
    for name in dst_label_filters or {}:
        result = result.withColumn(f"has_{name}_dependency", F.col(f"{name}_count") > 0)
    return result
