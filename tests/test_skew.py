"""Salted-aggregation / salted-join equivalence tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.operators.skew import salted_agg, salted_join
from etl_neptune_spark.sources import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_equals_direct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    direct = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("mx"),
        F.avg("value").alias("mean"),
    )
    salted = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("count", "value"),
            "total": ("sum", "value"),
            "mx": ("max", "value"),
            "mean": ("avg", "value"),
        },
        salt=8,
    )
    d = {r[0]: r[1:] for r in direct.collect()}
    s = {r[0]: r[1:] for r in salted.collect()}
    assert d.keys() == s.keys()
    for k in d:
        assert d[k][0] == s[k][0] and d[k][2] == s[k][2]
        assert abs(d[k][1] - s[k][1]) < 1e-6 * max(1.0, abs(d[k][1]))
        assert abs(d[k][3] - s[k][3]) < 1e-9 * max(1.0, abs(d[k][3]))


def test_salted_join_equals_direct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dim = customer.withColumnRenamed("c_custkey", "o_custkey")
    direct = orders.join(dim, "o_custkey")
    salted = salted_join(orders, dim, "o_custkey", salt=4)
    assert _rows(salted.select("o_orderkey", "c_name")) == _rows(
        direct.select("o_orderkey", "c_name")
    )
    # left join preserves unmatched probe rows
    some_dim = dim.filter(F.col("o_custkey") % 2 == 0)
    direct_l = orders.join(some_dim, "o_custkey", "left")
    salted_l = salted_join(orders, some_dim, "o_custkey", salt=4, how="left")
    assert _rows(salted_l.select("o_orderkey", "c_name")) == _rows(
        direct_l.select("o_orderkey", "c_name")
    )
