"""TPC-H-shaped certified queries (Q1 / Q3 / Q5 / Q6 adapted to the
driver fixture's column subset).

These aren't reference semantics — they're the standard relational
benchmark shapes, included to certify that the engine runs classic
warehouse workloads end-to-end with engine-portable numerics: every
money expression rides exact DECIMAL arithmetic (scale addition under
multiplication keeps products exact), sums stay decimal until one final
double cast, and means use the integer half-up identity from
``functions.dec_avg`` — so the DuckDB oracle match is bit-exact, not
tolerance-based.

Plan shapes: Q1 is one pruned scan + a 2-key hash aggregate; Q3/Q5 are
broadcast-dimension joins feeding a keyed agg (customer/nation/region
are dimension-sized); Q6 is a pure pushed-predicate scan-aggregate.
At 100 TB all four are the canonical shapes Catalyst already
distributes; nothing here shuffles more than once per aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec_avg
from ..sources import load_table
from .registry import register

# Exact decimal building blocks (Spark and DuckDB both add scales under
# decimal multiplication, so these products are exact in both engines).
# Lazy (functions, not module-level Columns): Column construction needs
# an active SparkContext, and the driver may import this module / call
# oracle_sql() before any session exists.
def _ext():
    return F.col("l_extendedprice").cast("decimal(18,2)")


def _one():
    return F.lit(1).cast("decimal(4,2)")


def _disc():
    return F.col("l_discount").cast("decimal(4,2)")


def _tax():
    return F.col("l_tax").cast("decimal(4,2)")

_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: per (returnflag, linestatus) decimal-
    exact sums of qty / price / discounted price / charge, half-up
    means, and row counts over the shipped-by cutoff."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _ext() * (_one() - _disc())
    charge = disc_price * (_one() + _tax())
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(_ext()).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


register(
    "q_tpch_q1",
    q_tpch_q1,
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(sum({_SQL_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({_SQL_REV}
                    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
                AS DOUBLE) AS sum_charge,
           CAST((CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) * 20000 AS BIGINT)
                 + count(l_quantity)) // (2 * count(l_quantity)) AS DOUBLE)
               / 10000.0 AS avg_qty,
           CAST((CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) * 20000
                      AS BIGINT)
                 + count(l_extendedprice)) // (2 * count(l_extendedprice))
                AS DOUBLE) / 10000.0 AS avg_price,
           CAST((CAST(sum(CAST(l_discount AS DECIMAL(28,2))) * 20000 AS BIGINT)
                 + count(l_discount)) // (2 * count(l_discount)) AS DOUBLE)
               / 10000.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)


Q3_TOP = 10


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (o_orderpriority standing in for the
    absent o_shippriority): BUILDING-segment revenue per open order,
    top-10 by revenue — broadcast customer dim, one keyed agg, then a
    distributed TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust.select("c_custkey")),
                    orders["o_custkey"] == F.col("c_custkey"),
                ).select("o_orderkey", "o_orderdate", "o_orderpriority")
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_ext() * (_one() - _disc())).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "o_orderkey")
        .limit(Q3_TOP)
    )


register(
    "q_tpch_q3",
    q_tpch_q3,
    f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, o.o_orderkey
    LIMIT {Q3_TOP}
    """,
)


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: revenue per nation where the
    supplying and ordering nations match, one order-date year,
    dimension chain customer→nation→region broadcast throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(_ext() * (_one() - _disc())).cast("double").alias("revenue"))
    )


register(
    "q_tpch_q5",
    q_tpch_q5,
    f"""
    SELECT n.n_name, CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue change: one pushed-predicate scan and
    a single global decimal sum — the purest pushdown benchmark."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").cast("decimal(4,2)") >= F.lit("0.05").cast("decimal(4,2)"))
        & (F.col("l_discount").cast("decimal(4,2)") <= F.lit("0.07").cast("decimal(4,2)"))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_ext() * _disc()).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


register(
    "q_tpch_q6",
    q_tpch_q6,
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN
          CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
      AND l_quantity < 24
    """,
)


Q4_LATE_DAYS = 90


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): count orders per
    priority having at least one LATE lineitem (shipped more than
    ``Q4_LATE_DAYS`` days after the order date — standing in for the
    absent commit/receipt dates). The EXISTS becomes a LEFT SEMI join
    with a non-equi conjunct; the build side is keyed on l_orderkey, so
    the plan is one shuffle-or-broadcast semi join + one hash agg."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], Q4_LATE_DAYS)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


register(
    "q_tpch_q4",
    q_tpch_q4,
    f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
    )
    GROUP BY o_orderpriority
    """,
)


Q18_MIN_QTY = 300
Q18_TOP = 10


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds a floor, joined back to customer, top-10
    by quantity. The HAVING subquery is one keyed hash agg whose
    survivor set is tiny, so the join-back broadcasts the survivors —
    never re-shuffling lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > Q18_MIN_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(Q18_TOP)
    )


register(
    "q_tpch_q18",
    q_tpch_q18,
    f"""
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(b.qty_dec AS DOUBLE) AS total_qty
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT {Q18_TOP}
    """,
)


Q10_TOP = 20


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): lost revenue per
    customer from 'R'-flagged lineitems in one order-date quarter,
    top-20 by revenue — fact-side filters pushed, customer/nation dims
    broadcast, one keyed agg, distributed top-k."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_ext() * (_one() - _disc())).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(Q10_TOP)
    )


register(
    "q_tpch_q10",
    q_tpch_q10,
    f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT {Q10_TOP}
    """,
)
