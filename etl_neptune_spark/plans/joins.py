"""Join plans (SURVEY §2.3).

Every join in the reference is either an equi-join against a small
dimension or a tiny-dimension theta join; all build sides here are
explicit ``F.broadcast`` so the plan is shuffle-free on the probe side
— exactly what you want when the probe side is 100 TB of flows and the
dimension is a pod map with a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec_sum, split_part
from ..sources import load_table
from .flow import _flows
from .registry import register


def q_join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — plain equi inner join to a dimension
    (``samples JOIN metric_name_map ON s.metric_id = m.id``,
    neptune_etl_deepflow.py:184-185)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("calls"),
            F.round(dec_sum("value"), 2).alias("total_value"),
        )
    )


register(
    "q_join_equi",
    q_join_equi,
    """
    SELECT c_mktsegment, count(*) AS calls,
           round(CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)


def q_join_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — double broadcast lookup join: every flow row's src AND dst
    resolved against the IP→service map with inner semantics so
    unmatched endpoints drop (ghost-node avoidance,
    neptune_etl_deepflow.py:675-695)."""
    flows = _flows(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    src_map = F.broadcast(
        nation.select(F.col("n_nationkey").alias("src_key"), F.col("n_name").alias("src_name"))
    )
    dst_map = F.broadcast(
        nation.select(F.col("n_nationkey").alias("dst_key"), F.col("n_name").alias("dst_name"))
    )
    return (
        flows.join(src_map, flows.src == src_map.src_key, "inner")
        .join(dst_map, flows.dst == dst_map.dst_key, "inner")
        .groupBy("src_name", "dst_name")
        .agg(F.count("*").alias("calls"))
    )


register(
    "q_join_ip",
    q_join_ip,
    """
    WITH bounds AS (SELECT max(ts) AS max_ts FROM events),
    flows AS (
        SELECT CAST(user_id % 25 AS BIGINT) AS src,
               TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 8 AS dst
        FROM events, bounds
        WHERE value > 0 AND ts >= max_ts - INTERVAL 15 DAY
    )
    SELECT s.n_name AS src_name, d.n_name AS dst_name, count(*) AS calls
    FROM flows
    JOIN nation s ON flows.src = s.n_nationkey
    JOIN nation d ON flows.dst = d.n_nationkey
    WHERE flows.src != flows.dst
    GROUP BY s.n_name, d.n_name
    """,
)


def q_join_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J11/W3 — left join + fallback coalesce (the
    ``K8S_SERVICE_ALIAS.get(name, name)`` rename and the literal-dict
    enrichment joins, neptune_etl_deepflow.py:60-67,344-345;
    neptune_etl_aws.py:97-103)."""
    ev = load_table(spark, sf_dir, "events")
    sup = load_table(spark, sf_dir, "supplier")
    return (
        ev.join(F.broadcast(sup), ev.user_id == sup.s_suppkey, "left")
        .withColumn(
            "service",
            F.coalesce(F.col("s_name"), F.concat(F.lit("user_"), F.col("user_id"))),
        )
        .groupBy("service")
        .agg(F.count("*").alias("n_events"))
    )


register(
    "q_join_alias",
    q_join_alias,
    """
    SELECT coalesce(s_name, 'user_' || CAST(user_id AS VARCHAR)) AS service,
           count(*) AS n_events
    FROM events LEFT JOIN supplier ON user_id = s_suppkey
    GROUP BY 1
    """,
)


def q_join_envvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — join on exploded map values: each entity's env-var map is
    exploded and the *values* matched against target names to infer
    AccessesData edges (neptune_etl_aws.py:1621-1633,1770-1783)."""
    ev = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    env = F.create_map(
        F.lit("TABLE_ID"),
        F.get_json_object("props", "$.k").cast("bigint"),
        F.lit("TOPIC_ID"),
        F.col("user_id"),
    )
    exploded = ev.select("event_id", F.explode(env).alias("env_key", "env_value"))
    return (
        exploded.join(part, exploded.env_value == part.p_partkey, "inner")
        .groupBy("p_partkey")
        .agg(
            F.count("*").alias("n_accesses"),
            F.countDistinct("env_key").alias("n_env_keys"),
        )
    )


register(
    "q_join_envvar",
    q_join_envvar,
    """
    WITH exploded AS (
        SELECT event_id, 'TABLE_ID' AS env_key,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS env_value
        FROM events
        UNION ALL
        SELECT event_id, 'TOPIC_ID', user_id FROM events
    )
    SELECT p_partkey, count(*) AS n_accesses,
           count(DISTINCT env_key) AS n_env_keys
    FROM exploded JOIN part ON env_value = p_partkey
    GROUP BY p_partkey
    """,
)


def q_join_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — join on a transformed key: ARN/URL split on separator, last
    segment matched (event-source-mapping ARN → function name,
    neptune_etl_aws.py:1785-1809; normalize_name
    neptune_etl_cfn.py:347-354)."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "suffix_key", split_part("c_name", "#", -1).cast("bigint")
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.suffix_key == orders.o_custkey, "inner")
        .groupBy("c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(dec_sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


register(
    "q_join_suffix",
    q_join_suffix,
    """
    SELECT c_name, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS total_spend
    FROM customer JOIN orders
      ON CAST(split_part(c_name, '#', -1) AS BIGINT) = o_custkey
    GROUP BY c_name
    """,
)


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — substring theta join against a tiny literal dimension
    (recovery-tier dict whose key is a substring of the resource name,
    neptune_etl_aws.py:1448-1453,1574-1579). Kept broadcast nested-loop
    — the build side is ≤ 8 literal rows by construction."""
    part = load_table(spark, sf_dir, "part")
    prio = F.broadcast(
        part.sparkSession.createDataFrame(
            [("widget", 1), ("bolt", 2), ("rod", 3), ("nut", 4)],
            "keyword string, priority int",
        )
    )
    matched = (
        part.crossJoin(prio)
        .filter(F.col("p_name").contains(F.col("keyword")))
        .groupBy("p_partkey")
        .agg(F.min("priority").alias("priority"))
    )
    return (
        part.join(matched, "p_partkey", "left")
        .select(
            "p_partkey",
            "p_name",
            F.coalesce(F.col("priority"), F.lit(99)).alias("priority"),
        )
    )


register(
    "q_join_theta",
    q_join_theta,
    """
    WITH prio(keyword, priority) AS (
        VALUES ('widget', 1), ('bolt', 2), ('rod', 3), ('nut', 4)
    ),
    matched AS (
        SELECT p_partkey, min(priority) AS priority
        FROM part JOIN prio ON position(keyword IN p_name) > 0
        GROUP BY p_partkey
    )
    SELECT part.p_partkey, p_name, coalesce(matched.priority, 99) AS priority
    FROM part LEFT JOIN matched ON part.p_partkey = matched.p_partkey
    """,
)


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — semi-join membership test (env value ∈ set of Lambda names →
    Invokes edge, neptune_etl_aws.py:1637-1657)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


register(
    "q_join_semi",
    q_join_semi,
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)


def q_gc_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/J9/S1/SNK4 — ghost-entity GC: graph rows whose key is absent
    from the live snapshot (`_gc_vertices`,
    neptune_etl_aws.py:1932-1961; stale-alias GC,
    neptune_etl_deepflow.py:776-789)."""
    from ..operators import gc_stale

    graph_nodes = load_table(spark, sf_dir, "customer")
    live = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey")
    )
    return gc_stale(graph_nodes, live, ["c_custkey"]).select("c_custkey", "c_name")


register(
    "q_gc_anti",
    q_gc_anti,
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
    """,
)


def q_alarm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12/ST7 — health reset-then-degrade: every node starts the batch
    'healthy', then entities matched by an active-alarm dimension join
    flip to 'degraded' (neptune_etl_aws.py:1469,2068-2111)."""
    cust = load_table(spark, sf_dir, "customer")
    alarms = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "error") & (F.col("value") >= 300.0))
        .select(F.col("user_id").alias("alarm_key"))
        .distinct()
    )
    healthy = cust.withColumn("health_status", F.lit("healthy"))
    return (
        healthy.join(
            F.broadcast(alarms), healthy.c_custkey == alarms.alarm_key, "left"
        )
        .select(
            "c_custkey",
            F.when(F.col("alarm_key").isNotNull(), F.lit("degraded"))
            .otherwise(F.col("health_status"))
            .alias("health_status"),
        )
    )


register(
    "q_alarm_join",
    q_alarm_join,
    """
    SELECT c_custkey,
           CASE WHEN EXISTS (
                    SELECT 1 FROM events
                    WHERE event_type = 'error' AND value >= 300.0
                      AND user_id = c_custkey)
                THEN 'degraded' ELSE 'healthy' END AS health_status
    FROM customer
    """,
)


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — union-all of differently-shaped entity scans
    (``containers + initContainers``, neptune_etl_deepflow.py:357-358),
    via unionByName with missing-column tolerance."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("Customer").alias("label"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.lit("Supplier").alias("label"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return cust.unionByName(sup, allowMissingColumns=True)


register(
    "q_union",
    q_union,
    """
    SELECT 'Customer' AS label, c_name AS name, c_acctbal AS acctbal,
           c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT 'Supplier', s_name, s_acctbal, NULL FROM supplier
    """,
)
