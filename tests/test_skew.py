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


def test_aqe_skew_join_split_fires(spark):
    """The AQE skew-join split actually ENGAGES on a zipfian key: with
    broadcast disabled and the skew thresholds sized for test data, the
    final adaptive plan must mark the sort-merge join's skewed side
    (skew=true / AQEShuffleRead with skewed partition splits)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # ~200k rows, 70% on key 0, padded so the hot partition is MBs
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 7, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias(
                "pad"
            ),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's QueryExecution is
        # the one that runs — AQE finalizes the plan we assert on;
        # count() would spawn a separate execution and leave this plan
        # isFinalPlan=false.
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skew_fixture_deterministic(spark, sf_dir, tmp_path):
    """gen_skew_fixture is a pure function of the source tables: two
    builds produce identical hot-key histograms, and the hot user
    really dominates."""
    from tools.gen_skew_fixture import build

    out = str(tmp_path / "skewfix")
    build(spark, sf_dir, out)
    ev = spark.read.parquet(f"{out}/events.parquet")
    total = ev.count()
    hot = ev.filter("user_id = 0").count()
    assert 0.25 < hot / total < 0.45  # ~35% routed to the hot user
    docs = spark.read.parquet(f"{out}/documents.parquet")
    top = (
        docs.groupBy("text").count().orderBy("count", ascending=False).first()
    )
    assert top["count"] > docs.count() * 0.05  # boilerplate dominates


def test_skew_fixture_hot_customer_cell(spark, sf_dir, tmp_path):
    """v2 fixture: ~30% of customers collapse onto one custkey, giving
    q_grid_join a hot grid cell; the query must still run green on the
    skewed copy (the skew-bench entry's correctness floor)."""
    from etl_neptune_spark.plans.geo import q_grid_join
    from tools.gen_skew_fixture import build

    out = str(tmp_path / "skewfix")
    build(spark, sf_dir, out)
    cust = spark.read.parquet(f"{out}/customer.parquet")
    total = cust.count()
    hot = cust.filter("c_custkey = 7").count()
    assert 0.2 < hot / total < 0.45, hot / total
    res = q_grid_join(spark, out)
    assert res.count() >= 0  # runs green under the hot cell
    # the hot key's output row exists and aggregates all its clones
    hot_row = res.filter("c_custkey = 7").collect()
    assert len(hot_row) <= 1
