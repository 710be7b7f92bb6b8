"""SRC7 certification: the wide-metric batch-fetch adapter end-to-end.

Models the reference's EC2 metric sweep
(lambda/etl_aws/neptune_etl_aws.py:823-941) on the ``supplier``
dimension: a conditional catalog (parity of ``s_suppkey`` plays the
EKS/non-EKS split, ``% 5`` the CWAgent disk-dimension discovery),
contiguous ≤500-query batching, a deterministic simulated fetch with a
missing-datapoint predicate (``-1.0`` sentinel), the reference's unit
conversions (bytes/period → mbps at 4 dp, percent at 2 dp), and the
wide per-entity join-back. Every step is mirrored in the DuckDB oracle,
so the adapter is value-certified, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.metrics import deterministic_fetch, metric_query_plan, widen_metrics
from .registry import register


def _kv(key: str) -> F.Column:
    return F.max(F.when(F.col("metric_key") == key, F.col("value")))


def q_metric_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC7 — wide multi-metric batch fetch → tall typed frame → wide
    join-back (neptune_etl_aws.py:823-941)."""
    sup = load_table(spark, sf_dir, "supplier")
    is_eks = F.col("s_suppkey") % 2 == 0
    specs = [
        ("cpu_util_avg", "AWS/EC2", "CPUUtilization", "Average", 300, None),
        ("network_in_bytes", "AWS/EC2", "NetworkIn", "Average", 300, None),
        ("network_out_bytes", "AWS/EC2", "NetworkOut", "Average", 300, None),
        ("memory_util", "ContainerInsights", "node_memory_utilization",
         "Average", 300, is_eks),
        ("memory_util", "CWAgent", "mem_used_percent", "Average", 300, ~is_eks),
        ("disk_util", "ContainerInsights", "node_filesystem_utilization",
         "Average", 300, is_eks),
        ("disk_util", "CWAgent", "disk_used_percent", "Average", 300,
         (~is_eks) & (F.col("s_suppkey") % 5 == 0)),
    ]
    plan = metric_query_plan(sup, "s_suppkey", specs)
    tall = deterministic_fetch(
        plan,
        missing=(F.col("entity_id") % 7 == 3)
        & (F.col("metric_key") == "cpu_util_avg"),
    )
    wide = widen_metrics(
        tall,
        out_cols=[
            ("cpu_util_avg", F.round(_kv("cpu_util_avg"), 2)),
            (
                "network_in_mbps",
                F.round(_kv("network_in_bytes") / 300 / 1024 / 1024 * 8, 4),
            ),
            (
                "network_out_mbps",
                F.round(_kv("network_out_bytes") / 300 / 1024 / 1024 * 8, 4),
            ),
            ("memory_util", F.round(_kv("memory_util"), 2)),
            ("disk_util", F.round(_kv("disk_util"), 2)),
        ],
    )
    return wide


register(
    "q_metric_batch",
    q_metric_batch,
    f"""
    WITH ent AS (
        SELECT s_suppkey AS entity_id, s_suppkey % 2 = 0 AS is_eks
        FROM supplier
    ),
    tall AS (
        SELECT entity_id, 'cpu_util_avg' AS metric_key,
               'CPUUtilization' AS metric_name, 300 AS period FROM ent
        UNION ALL
        SELECT entity_id, 'network_in_bytes', 'NetworkIn', 300 FROM ent
        UNION ALL
        SELECT entity_id, 'network_out_bytes', 'NetworkOut', 300 FROM ent
        UNION ALL
        SELECT entity_id, 'memory_util', 'node_memory_utilization', 300
        FROM ent WHERE is_eks
        UNION ALL
        SELECT entity_id, 'memory_util', 'mem_used_percent', 300
        FROM ent WHERE NOT is_eks
        UNION ALL
        SELECT entity_id, 'disk_util', 'node_filesystem_utilization', 300
        FROM ent WHERE is_eks
        UNION ALL
        SELECT entity_id, 'disk_util', 'disk_used_percent', 300
        FROM ent WHERE NOT is_eks AND entity_id % 5 = 0
    ),
    bucketed AS (SELECT *, entity_id % 8 AS bkt FROM tall),
    cnts AS (SELECT bkt, count(*) AS c FROM bucketed GROUP BY bkt),
    offs AS (
        SELECT bkt,
               coalesce(sum(CAST(ceil(c * 1.0 / 500) AS BIGINT))
                   OVER (ORDER BY bkt
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS off
        FROM cnts
    ),
    ranked AS (
        SELECT b.*, row_number() OVER (PARTITION BY bkt
                                       ORDER BY entity_id, metric_key) AS rn
        FROM bucketed b
    ),
    batched AS (
        SELECT ranked.*, CAST(off + (rn - 1) // 500 AS BIGINT) AS batch_id
        FROM ranked JOIN offs USING (bkt)
    ),
    fetched AS (
        SELECT *,
               CASE WHEN entity_id % 7 = 3 AND metric_key = 'cpu_util_avg'
                    THEN NULL
                    ELSE ((entity_id * 131 + period + length(metric_name) * 17)
                          % 10007) / 10.0
               END AS value
        FROM batched
    )
    SELECT entity_id, count(*) AS n_queries, min(batch_id) AS first_batch,
           coalesce(round(max(CASE WHEN metric_key = 'cpu_util_avg'
                                   THEN value END), 2), -1.0) AS cpu_util_avg,
           coalesce(round(max(CASE WHEN metric_key = 'network_in_bytes'
                                   THEN value END) / 300 / 1024 / 1024 * 8, 4),
                    -1.0) AS network_in_mbps,
           coalesce(round(max(CASE WHEN metric_key = 'network_out_bytes'
                                   THEN value END) / 300 / 1024 / 1024 * 8, 4),
                    -1.0) AS network_out_mbps,
           coalesce(round(max(CASE WHEN metric_key = 'memory_util'
                                   THEN value END), 2), -1.0) AS memory_util,
           coalesce(round(max(CASE WHEN metric_key = 'disk_util'
                                   THEN value END), 2), -1.0) AS disk_util
    FROM fetched GROUP BY entity_id
    """,
)
