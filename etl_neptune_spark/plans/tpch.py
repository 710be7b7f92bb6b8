"""TPC-H-shaped certified queries — all 22 shapes adapted to the
driver fixture's column subset (Q11/Q16/Q20 run over a
deterministically synthesized partsupp; see the partsupp block below).

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
            # round the DECIMAL sums to 2 dp BEFORE the double cast:
            # at scale 6 the scaled integer exceeds 2^53 around sf1 and
            # the two engines' decimal->double conversions differ by one
            # ulp (sf1 strict sweep catch); a 2 dp decimal converts
            # identically everywhere at any SF below 2^53 cents.
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
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
           CAST(round(sum({_SQL_REV}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum({_SQL_REV}
                    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2)
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


Q7_BLOC = ("NATION_1", "NATION_2", "NATION_3")


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: revenue between trading-bloc nations
    per (supp_nation, cust_nation, ship year), every cross-nation
    direction inside the ``Q7_BLOC`` (classic Q7 fixes one pair; the
    bloc keeps the identical shape while staying populated at every
    fixture scale). Supplier and customer nation resolve through
    broadcast dims; the only shuffle is the final 3-key hash agg —
    lineitem↔orders is the single fact-fact join and rides the
    l_orderkey equi key."""
    bloc = list(Q7_BLOC)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cus_n = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(sup_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cus_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            F.col("supp_nation").isin(bloc)
            & F.col("cust_nation").isin(bloc)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_ext() * (_one() - _disc())).cast("double").alias("revenue"))
    )


register(
    "q_tpch_q7",
    q_tpch_q7,
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_3-supplied fraction of
    AMERICA-region ECONOMY-part order revenue per order year. Numerator
    and denominator are conditional/total decimal sums inside ONE keyed
    agg (no scalar-subquery join); the share is a single double division
    of exact values, identical text in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    sup_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cus_n = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    rev = _ext() * (_one() - _disc())
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cus_n), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region["r_regionkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sup_n), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev.cast("decimal(24,4)"))
                .otherwise(zero)
            ).alias("nat_dec"),
            F.sum(rev.cast("decimal(24,4)")).alias("all_dec"),
        )
        .select(
            "o_year",
            (F.col("nat_dec").cast("double") / F.col("all_dec").cast("double"))
            .alias("mkt_share"),
        )
    )


register(
    "q_tpch_q8",
    q_tpch_q8,
    f"""
    WITH flat AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST({_SQL_REV} AS DECIMAL(24,4)) AS rev,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                         ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
           / CAST(sum(rev) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer distribution: histogram of per-customer order
    counts, customers with zero (non-urgent) orders included via the
    LEFT OUTER join. Two hash aggs — per-customer then per-count — both
    keyed shuffles with map-side combine; no window, no broadcast of the
    fact side."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    "q_tpch_q13",
    q_tpch_q13,
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: PROMO-part share of one ship-month's
    revenue. Conditional and total decimal sums in ONE global agg (no
    scalar-subquery join); part is a broadcast dim; the percentage is a
    final double division of exact sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (_ext() * (_one() - _disc())).cast("decimal(24,4)")
    zero = F.lit(0).cast("decimal(24,4)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .alias("promo_dec"),
            F.sum(rev).alias("all_dec"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("promo_dec").cast("double")
                / F.col("all_dec").cast("double")
            ).alias("promo_revenue")
        )
    )


register(
    "q_tpch_q14",
    q_tpch_q14,
    f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST({_SQL_REV} AS DECIMAL(24,4))
                                 ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
           / CAST(sum(CAST({_SQL_REV} AS DECIMAL(24,4))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the supplier(s) with maximum quarterly
    revenue. The revenue view is one keyed decimal agg; the global max is
    a 1-row agg broadcast back as an equi join on the EXACT decimal value
    (never compared in floating point), so ties surface identically in
    both engines; supplier is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_ext() * (_one() - _disc())).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("mx_dec"))
    return (
        rev.join(F.broadcast(mx), rev["rev_dec"] == mx["mx_dec"])
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


register(
    "q_tpch_q15",
    q_tpch_q15,
    f"""
    WITH revenue AS (
        SELECT l_suppkey, sum({_SQL_REV}) AS rev_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.rev_dec AS DOUBLE) AS total_revenue
    FROM revenue r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.rev_dec = (SELECT max(rev_dec) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)


Q2_SIZE = 30
Q2_TOP = 25


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): with no partsupp table in
    the fixture, the part↔supplier relation and its cost come from
    lineitem — cost(part, supp) := min(l_extendedprice) over their
    lineitems. The correlated MIN subquery becomes a per-part keyed agg
    joined back on the EXACT decimal cost (never floating-point
    equality); part/supplier/nation/region are broadcast dims. Two keyed
    shuffles of the fact side total (cost pairs, per-part min), then a
    distributed top-k."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == Q2_SIZE) | (F.col("p_type") == "LARGE")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .drop("p_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_ext()).alias("cost_dec"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mp_key")).agg(
        F.min("cost_dec").alias("min_dec")
    )
    return (
        cost.join(
            min_cost,
            (cost["l_partkey"] == F.col("mp_key"))
            & (cost["cost_dec"] == F.col("min_dec")),
        )
        .join(F.broadcast(supp), cost["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .join(F.broadcast(part), cost["l_partkey"] == part["p_partkey"])
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("cost_dec").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(Q2_TOP)
    )


register(
    "q_tpch_q2",
    q_tpch_q2,
    f"""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_dec
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_size = {Q2_SIZE} OR p_type = 'LARGE')
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           CAST(c.cost_dec AS DOUBLE) AS supply_cost
    FROM cost c
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN part p ON c.l_partkey = p.p_partkey
    WHERE r.r_name = 'EUROPE'
      AND c.cost_dec = (SELECT min(c2.cost_dec) FROM cost c2
                        WHERE c2.l_partkey = c.l_partkey)
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT {Q2_TOP}
    """,
)


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lineitems of one brand
    whose quantity is under 20% of that part's mean quantity. The
    correlated AVG is cleared of division entirely —
    ``qty < 0.2 * sum/cnt``  ⇔  ``5 * qty * cnt < sum`` in exact
    decimal/bigint arithmetic — so the threshold compare is bit-exact in
    both engines; per-part totals are one keyed agg joined back on
    l_partkey (broadcastable: bounded by the brand's part count)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey")
    ).drop("p_partkey")
    per_part = branded.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum_dec"),
        F.count("*").alias("qty_cnt"),
    )
    return (
        branded.join(F.broadcast(per_part), branded["l_partkey"] == F.col("pp_key"))
        .filter(
            F.lit(5)
            * F.col("l_quantity").cast("decimal(18,2)")
            * F.col("qty_cnt")
            < F.col("qty_sum_dec")
        )
        .agg(
            (F.sum(_ext()).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


register(
    "q_tpch_q17",
    q_tpch_q17,
    """
    WITH branded AS (
        SELECT l.* FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#1'
    ), per_part AS (
        SELECT l_partkey AS pp_key,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum_dec,
               count(*) AS qty_cnt
        FROM branded GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           count(*) AS n_small
    FROM branded b
    JOIN per_part pp ON b.l_partkey = pp.pp_key
    WHERE 5 * CAST(b.l_quantity AS DECIMAL(18,2)) * pp.qty_cnt
          < pp.qty_sum_dec
    """,
)


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: three OR'd (brand, size-range,
    quantity-range) branches over the lineitem↔part join. Part is a
    broadcast dim; the disjunction stays a single JVM-side predicate so
    the join output filters without a shuffle; one global decimal sum."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(branch)
        .agg(
            F.sum(_ext() * (_one() - _disc())).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


register(
    "q_tpch_q19",
    q_tpch_q19,
    f"""
    SELECT CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)


Q21_LATE_DAYS = 90
Q21_TOP = 20


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: late lineitems
    (shipped > ``Q21_LATE_DAYS`` days after order date, standing in for
    the absent receipt/commit dates) in finalized multi-supplier orders
    where that supplier was the ONLY late one. The classic
    EXISTS / NOT-EXISTS pair is rewritten as ONE per-order aggregate —
    (#distinct suppliers, #distinct late suppliers) — joined back to the
    late rows on l_orderkey: two keyed shuffles of the fact instead of
    two correlated self-joins; the DuckDB oracle keeps the canonical
    correlated form, so the rewrite is certified equivalent."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    base = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).withColumn(
        "is_late",
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), Q21_LATE_DAYS),
    )
    ostats = base.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "nlate"
        ),
    )
    return (
        base.filter(F.col("is_late"))
        .join(ostats, base["l_orderkey"] == ostats["ok"])
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q21_TOP)
    )


register(
    "q_tpch_q21",
    q_tpch_q21,
    f"""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT {Q21_TOP}
    """,
)


Q22_NATIONS = (1, 3, 5, 7, 9, 11, 13)
Q22_INACTIVE_SINCE = "1999-01-01"


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (c_nationkey standing in for
    the absent phone country code): rich-but-inactive customers per
    nation — account balance above the cohort's positive mean, no orders
    on file. The scalar AVG subquery resolves driver-side as ONE bounded
    1-row aggregate (sum, count) turned into literals — the same
    two-phase anchor pattern as ``sources.tables._ts_anchor``, which at
    100 TB keeps the main scan a single pushdown-friendly pass — and the
    mean compare is division-free: ``bal > sum/cnt`` ⇔ ``bal*cnt > sum``
    in exact decimal/bigint; inactivity (no orders since
    ``Q22_INACTIVE_SINCE`` — every fixture customer has SOME historical
    order, so the classic no-orders-ever test is vacuous here) is one
    LEFT ANTI join against the date-pruned orders scan."""
    in_set = F.col("c_nationkey").isin(*Q22_NATIONS)
    cust = load_table(spark, sf_dir, "customer")
    cohort = cust.filter(in_set & (F.col("c_acctbal") > 0))
    row = cohort.agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
        F.count("*").alias("c"),
    ).first()
    bal_sum, bal_cnt = row["s"], row["c"]
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_INACTIVE_SINCE).cast("timestamp")
    ).select("o_custkey")
    rich = cust.filter(
        in_set
        & (
            F.col("c_acctbal").cast("decimal(18,2)") * F.lit(bal_cnt)
            > F.lit(bal_sum).cast("decimal(38,2)")
        )
    )
    return (
        rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


register(
    "q_tpch_q22",
    q_tpch_q22,
    f"""
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN {Q22_NATIONS}
      AND CAST(c_acctbal AS DECIMAL(18,2))
          * (SELECT count(*) FROM customer
             WHERE c_acctbal > 0 AND c_nationkey IN {Q22_NATIONS})
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
             WHERE c_acctbal > 0 AND c_nationkey IN {Q22_NATIONS})
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >=
                            TIMESTAMP '{Q22_INACTIVE_SINCE} 00:00:00')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit: per (supplier nation, order year)
    profit over name-matched parts, where the absent partsupp supply
    cost is stood in by ``p_retailprice · l_quantity`` — keeping Q9's
    two-term ``revenue − cost`` amount in exact decimal arithmetic.
    Part (pattern-filtered), supplier, and nation broadcast; the only
    fact-fact join is lineitem↔orders on the equi key; one 2-key agg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _ext() * (_one() - _disc()) - (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    ).cast("decimal(22,4)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


register(
    "q_tpch_q9",
    q_tpch_q9,
    f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_SQL_REV}
                    - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                           * CAST(l.l_quantity AS DECIMAL(18,2))
                           AS DECIMAL(22,4))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)


Q12_LATE_DAYS = 60


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority check, with ship-lag
    classes standing in for the absent l_shipmode): per lag class
    (EXPRESS = shipped within ``Q12_LATE_DAYS`` days of ordering, SLOW
    otherwise), how many high-priority vs low-priority orders it
    carried in one ship year. One fact-fact equi join on l_orderkey,
    the class derived JVM-side, two conditional counts in ONE keyed
    agg — the canonical case-sum pattern at any scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    mode = F.when(
        F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), Q12_LATE_DAYS),
        "EXPRESS",
    ).otherwise("SLOW")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


register(
    "q_tpch_q12",
    q_tpch_q12,
    f"""
    SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
                THEN 'EXPRESS' ELSE 'SLOW' END AS ship_mode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY ship_mode
    """,
)


# ---------------------------------------------------------------------------
# Synthesized partsupp: the one TPC-H table the fixture lacks. Derived
# DETERMINISTICALLY from part × supplier-count by pure integer
# arithmetic (the same spirit as dbgen's partkey→suppkey formula), so
# Spark and DuckDB materialize the identical relation and Q11/Q16/Q20
# become certifiable. 4 suppliers per part; the stride
# greatest(S//4, 1) keeps the four suppkeys distinct for every S ≥ 8.
# Money stays integer CENTS end-to-end (bigint sums are exact and
# engine-portable; one final /100 render).
# ---------------------------------------------------------------------------

def _supplier_count(spark: SparkSession, sf_dir: str) -> int:
    # Bounded 1-row action, the Q22/lookback anchor pattern.
    return load_table(spark, sf_dir, "supplier").count()


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    s_cnt = _supplier_count(spark, sf_dir)
    stride = max(s_cnt // 4, 1)
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    return p.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    ).select(
        "ps_partkey",
        ((F.col("ps_partkey") + F.col("i") * stride) % s_cnt).alias("ps_suppkey"),
        ((F.col("ps_partkey") * 7 + F.col("i") * 11) % 1000 + 1)
        .cast("int")
        .alias("ps_availqty"),
        ((F.col("ps_partkey") * 31 + F.col("i") * 17) % 900000 + 100000)
        .alias("ps_supplycost_cents"),
    )


_PARTSUPP_SQL = """
    partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + t.range * greatest((SELECT count(*) FROM supplier) // 4, 1))
                   % (SELECT count(*) FROM supplier) AS ps_suppkey,
               CAST((p_partkey * 7 + t.range * 11) % 1000 + 1 AS INTEGER)
                   AS ps_availqty,
               (p_partkey * 31 + t.range * 17) % 900000 + 100000
                   AS ps_supplycost_cents
        FROM part, range(0, 4) t
    )
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: per-part inventory value
    (supplycost·availqty, exact integer cents) for one nation's
    suppliers, kept when the part's value exceeds 1/1000 of the
    nation's total. The scalar threshold resolves to a driver literal
    (one bounded 1-row action — the Q22 anchor pattern) and the
    compare is integer-exact (value_cents · 1000 > total_cents); the
    oracle keeps the canonical scalar-subquery form."""
    ps = _partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    in_nation = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("ps_partkey", (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v_cents"))
    )
    per_part = in_nation.groupBy("ps_partkey").agg(F.sum("v_cents").alias("value_cents"))
    total_cents = per_part.agg(F.sum("value_cents")).collect()[0][0] or 0  # bounded: single scalar row
    return (
        per_part.filter(F.col("value_cents") * 1000 > F.lit(int(total_cents)))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


register(
    "q_tpch_q11",
    q_tpch_q11,
    f"""
    WITH {_PARTSUPP_SQL},
    nat AS (
        SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v_cents
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ),
    per_part AS (
        SELECT ps_partkey, sum(v_cents) AS value_cents FROM nat GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100 AS value
    FROM per_part
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM per_part)
    ORDER BY value DESC, ps_partkey
    """,
)


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship: distinct supplier count
    per (brand, type, size) over the synthesized partsupp, excluding
    one brand, one type family, sizes outside the probe list, and
    "complaint" suppliers (negative account balance standing in for
    the comment scan). The NOT-IN becomes a broadcast LEFT ANTI join —
    key set is supplier-sized — while the oracle keeps the canonical
    NOT IN subquery."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("ECONOMY"))
        & (F.col("p_size").isin(1, 3, 11, 21, 31, 41, 49, 50))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complaints = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(complaints), "ps_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


register(
    "q_tpch_q16",
    q_tpch_q16,
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type NOT LIKE 'ECONOMY%'
      AND p_size IN (1, 3, 11, 21, 31, 41, 49, 50)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: suppliers in one nation
    holding excess stock (availqty > half the 1997 shipped quantity of
    that part from that supplier) of 'small%' parts. The correlated
    quantity subquery becomes ONE (partkey, suppkey)-keyed aggregate
    of lineitem joined back to partsupp; the excess compare is
    integer-exact (2·availqty > sum_qty in decimal); supplier and
    nation prune by broadcast semi-join. The oracle keeps the
    canonical nested-IN correlated form."""
    ps = _partsupp(spark, sf_dir)
    small = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select(F.col("p_partkey").alias("ps_partkey")).distinct()
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
    excess = (
        ps.join(F.broadcast(small), "ps_partkey", "left_semi")
        .join(shipped, ["ps_partkey", "ps_suppkey"], "inner")
        .filter(
            (F.col("ps_availqty") * 2).cast("decimal(18,2)") > F.col("sum_qty")
        )
        .select("ps_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    # Canonical Q20 filters ONE nation; the fixture's supplier dimension
    # is 10 rows at smoke scale (sf0.001), where most of the 25 nations
    # hold zero suppliers — a half-keyspace region keeps the shape (the
    # broadcast nation semi-join) while staying populated at every SF.
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") < 13
    ).select("n_nationkey")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(excess.withColumnRenamed("ps_suppkey", "s_suppkey"), "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


register(
    "q_tpch_q20",
    q_tpch_q20,
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_nationkey < 13
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND CAST(ps_availqty * 2 AS DECIMAL(18,2)) > (
            SELECT sum(CAST(l_quantity AS DECIMAL(18,2)))
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        )
      )
    ORDER BY s_name, s_suppkey
    """,
)
