"""Flow-aggregation plans — the deepflow pipeline's query core.

The reference's flagship query (lambda/etl_deepflow/
neptune_etl_deepflow.py:633-646) aggregates L7 flow logs per
(src, dst, port, protocol) with count / avg / p99-quantile /
conditional-count over a sliding lookback window, keeps groups with
``HAVING calls >= 2``-style floors, and takes the top-100 by calls.
Here the ``events`` table plays the flow log (FIXTURES.md): ``user_id``
→ source key, ``props.k`` → destination key, ``event_type`` →
protocol, ``value`` → response duration.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd); the lookback anchor is resolved to a *literal*
by one tiny footer-stats `max(ts)` action (sources.tables.max_ts_micros,
cached per process) so the window predicate reaches the parquet reader
as a ``PushedFilters`` entry — row-group pruning now, partition pruning
on a date-partitioned layout at 100 TB. This mirrors the reference's
source-side literal window (neptune_etl_df.py:641 ``time > now()-300``
pushed into the store). After the pruned scan, the plan is a single
shuffle on the group key (partial + final hash aggregate) followed by
TakeOrderedAndProject — the same shape ClickHouse executes for the
reference, but distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec_avg
from ..sources import load_events_lookback, load_table
from .registry import register

# Deterministic key-space mapping (keeps group counts stable across SF,
# mirroring the reference's bounded src/dst/port/protocol key space).
SRC_MOD = 25
DST_MOD = 8
ERROR_THRESHOLD = 250.0  # value >= threshold counts as an "error" response
LOOKBACK_DAYS = 15
TOP_K = 100


def _flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (src, dst, protocol, value, ts) flow rows, window-filtered.

    Mirrors the reference's WHERE clause (neptune_etl_deepflow.py:640-642):
    non-null endpoints (``ip4 != 0``), positive duration, self-pairs
    dropped, sliding lookback on ``time`` — the lookback cutoff is a
    literal, so both it and the value filter are pushed into the scan.
    """
    events = load_events_lookback(spark, sf_dir, LOOKBACK_DAYS)
    return (
        events.filter(F.col("value") > 0)
        .select(
            (F.col("user_id") % SRC_MOD).cast("bigint").alias("src"),
            (F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("bigint") % DST_MOD).alias(
                "dst"
            ),
            F.col("event_type").alias("protocol"),
            F.col("value"),
            F.col("ts"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def q_flow_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-(src,dst,protocol) call metrics, HAVING floor, top-k.

    SURVEY §2.4 A1 + A3 + A4 + A7, §2.5 W1, §2.2 P5-P7;
    reference neptune_etl_deepflow.py:633-646.
    """
    flows = _flows(spark, sf_dir)
    agg = flows.groupBy("src", "dst", "protocol").agg(
        F.count("*").alias("calls"),
        dec_avg("value").alias("avg_duration_ms"),
        F.round(F.percentile("value", 0.99), 4).alias("p99_ms"),
        F.count_if(F.col("value") >= ERROR_THRESHOLD).alias("error_count"),
    )
    return (
        agg.filter(F.col("calls") >= 2)
        .withColumn(
            "error_rate",
            F.round(F.col("error_count") / F.col("calls"), 4),
        )
        .orderBy(F.desc("calls"), "src", "dst", "protocol")
        .limit(TOP_K)
    )


_FLOW_EDGES_SQL = f"""
WITH bounds AS (SELECT max(ts) AS max_ts FROM events),
flows AS (
    SELECT CAST(user_id % {SRC_MOD} AS BIGINT) AS src,
           TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % {DST_MOD} AS dst,
           event_type AS protocol,
           value
    FROM events, bounds
    WHERE value > 0
      AND ts >= max_ts - INTERVAL {LOOKBACK_DAYS} DAY
)
SELECT src, dst, protocol,
       count(*) AS calls,
       CAST((CAST(sum(CAST(value AS DECIMAL(28,2))) * 20000 AS BIGINT)
             + count(value)) // (2 * count(value)) AS DOUBLE) / 10000.0
           AS avg_duration_ms,
       round(quantile_cont(value, 0.99), 4) AS p99_ms,
       count(*) FILTER (WHERE value >= {ERROR_THRESHOLD}) AS error_count,
       round((count(*) FILTER (WHERE value >= {ERROR_THRESHOLD})) * 1.0 / count(*), 4)
           AS error_rate
FROM flows
WHERE src != dst
GROUP BY src, dst, protocol
HAVING count(*) >= 2
ORDER BY calls DESC, src, dst, protocol
LIMIT {TOP_K}
"""

register("q_flow_edges", q_flow_edges, _FLOW_EDGES_SQL)


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the flagship per-edge metrics
    (operators.incremental): events are split into two disjoint
    micro-batches (event_id parity — any batching works, the merge is
    associative), each reduced to algebraic partial state, the states
    folded with ONE keyed re-aggregation, then rendered. The oracle is
    a FULL single-pass recompute — passing certifies that standing
    state + delta merges are bit-identical to re-scanning history,
    which is what lets a 5-minute incremental run replace a 100 TB
    rescan (reference posture: neptune_etl_deepflow.py:633-646)."""
    from ..operators.incremental import merge_states, partial_state
    from ..sources import load_events_lookback

    events = load_events_lookback(spark, sf_dir, LOOKBACK_DAYS)
    flows = (
        events.filter(F.col("value") > 0)
        .select(
            F.col("event_id"),
            (F.col("user_id") % SRC_MOD).cast("bigint").alias("src"),
            (F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("bigint") % DST_MOD)
            .alias("dst"),
            F.col("event_type").alias("protocol"),
            F.col("value"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    keys = ["src", "dst", "protocol"]
    batches = [flows.filter(F.col("event_id") % 2 == p) for p in (0, 1)]
    states = [
        partial_state(
            b,
            keys,
            counts={
                "calls": None,
                "error_count": F.col("value") >= ERROR_THRESHOLD,
            },
            # decimal (NOT double) partial sum: re-merging stays exact
            sums={"sum_ms": F.col("value").cast("decimal(28,2)")},
            maxs={"max_ms": F.col("value")},
        )
        for b in batches
    ]
    merged = merge_states(
        states, keys, sum_cols=["calls", "error_count", "sum_ms"],
        max_cols=["max_ms"],
    )
    # Exact half-up 4-dp mean via integer arithmetic: floor((2n + d)/2d)
    # on 10⁻⁴-scaled units. round(double, 4) is NOT portable — Spark
    # rounds the shortest decimal rendering of the quotient, DuckDB the
    # binary value, and they disagree on half-ulp boundaries (seen at
    # sf0.1: 35.18825 → .1883 vs .1882). Integer division is identical
    # everywhere, and dividing the same integer by 10⁴ yields the same
    # double in both engines.
    avg4 = F.expr("(CAST(sum_ms * 20000 AS BIGINT) + calls) div (2 * calls)")
    return merged.select(
        *keys,
        "calls",
        (avg4.cast("double") / F.lit(10000.0)).alias("avg_duration_ms"),
        "error_count",
        "max_ms",
    )


register(
    "q_incremental_agg",
    q_incremental_agg,
    f"""
    WITH bounds AS (SELECT max(ts) AS max_ts FROM events),
    flows AS (
        SELECT CAST(user_id % {SRC_MOD} AS BIGINT) AS src,
               TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                   % {DST_MOD} AS dst,
               event_type AS protocol,
               value
        FROM events, bounds
        WHERE value > 0
          AND ts >= max_ts - INTERVAL {LOOKBACK_DAYS} DAY
    )
    SELECT src, dst, protocol,
           count(*) AS calls,
           CAST((CAST(sum(CAST(value AS DECIMAL(28,2))) * 20000 AS BIGINT)
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0
               AS avg_duration_ms,
           count(*) FILTER (WHERE value >= {ERROR_THRESHOLD}) AS error_count,
           max(value) AS max_ms
    FROM flows
    WHERE src != dst
    GROUP BY src, dst, protocol
    """,
)


def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (counting algorithm, insert
    case): V = orders ⋈ lineitem is maintained as V_old plus
    ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB (operators.incremental.
    delta_join_view), never recomputed from scratch. Certified by
    aggregating the maintained view and comparing against a full
    recompute oracle — any error in the delta algebra (a missed or
    double-counted term) shifts the totals. Deltas are deterministic
    key slices (orderkey mod); decimal sums keep the certificate
    fold-order independent."""
    from ..functions.scalar import dec_sum
    from ..operators.incremental import delta_join_view

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    line = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    a_new = F.col("o_orderkey") % 7 == 0
    b_new = F.col("o_orderkey") % 5 == 0
    v_old = orders.filter(~a_new).join(line.filter(~b_new), "o_orderkey")
    delta_v = delta_join_view(
        orders.filter(~a_new),
        orders.filter(a_new),
        line.filter(~b_new),
        line.filter(b_new),
        on=["o_orderkey"],
    )
    return (
        v_old.unionByName(delta_v)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            dec_sum("l_extendedprice").alias("revenue"),
        )
    )


register(
    "q_ivm_join",
    q_ivm_join,
    """
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)


def q_ivm_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under GENERAL deltas — inserts AND
    deletes on BOTH sides (operators.incremental.delta_join_view_signed,
    the full Gupta-Mumick counting algorithm): orders gain a batch
    (keys %5=0), lose a batch (%7=0 of the standing rows); customers
    lose the %11=0 segment. The maintained view (standing V ⊎ signed
    ΔV, zero-net rows dropped) must equal the full recompute of
    A_new ⋈ B_new — which is exactly what the oracle computes. The
    delete case is what the insert-only q_ivm_join cannot express:
    retractions must cancel exactly, including the ΔA ⋈ ΔB cross term
    (an inserted order joining a deleted customer nets out)."""
    from ..operators.incremental import (
        apply_signed_delta,
        delta_join_view_signed,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    a_old = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta_a = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("__mult", F.lit(1))
        .unionByName(
            orders.filter(
                (F.col("o_orderkey") % 5 != 0) & (F.col("o_orderkey") % 7 == 0)
            ).withColumn("__mult", F.lit(-1))
        )
    )
    delta_b = cust.filter(F.col("custkey") % 11 == 0).withColumn(
        "__mult", F.lit(-1)
    )
    v_old = a_old.join(cust, "custkey")
    dv = delta_join_view_signed(a_old, delta_a, cust, delta_b, on=["custkey"])
    return apply_signed_delta(v_old, dv)


register(
    "q_ivm_deletes",
    q_ivm_deletes,
    """
    WITH a_new AS (
        SELECT o_orderkey, o_custkey AS custkey FROM orders
        WHERE o_orderkey % 5 = 0
           OR (o_orderkey % 5 != 0 AND o_orderkey % 7 != 0)
    ),
    b_new AS (
        SELECT c_custkey AS custkey, c_mktsegment FROM customer
        WHERE c_custkey % 11 != 0
    )
    SELECT a_new.custkey, a_new.o_orderkey, b_new.c_mktsegment
    FROM a_new JOIN b_new USING (custkey)
    """,
)
