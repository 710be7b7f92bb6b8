"""Gated-query tests for the non-parquet wire formats (SRC2-SRC5, P2):
the fixture parse paths behind q_csv_scan / q_json_scan /
q_template_scan, plus the distributed two-phase rank helper they share
the round with (operators/rank.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.operators.rank import ntile_from_rank, prefix_sums
from etl_neptune_spark.plans import formats_q


def test_csv_scan_counts(spark, sf_dir):
    out = formats_q.q_csv_scan(spark, sf_dir)
    rows = {r["protocol"]: r for r in out.collect()}
    assert set(rows) == {"TCP", "UDP", "HTTP", "HTTPS", "GRPC"}
    # fixture is deterministic: 240 rows, calls >= 10 keeps 216
    assert sum(r["n_flows"] for r in rows.values()) == 216
    assert all(r["total_calls"] > 0 for r in rows.values())


def test_json_scan_explodes_containers(spark, sf_dir):
    out = formats_q.q_json_scan(spark, sf_dir).collect()
    # 60 pods with 1 + i % 3 containers each = 120 container rows
    assert len(out) == 120
    by_pod = {}
    for r in out:
        by_pod.setdefault(r["pod_name"], []).append(r)
    assert len(by_pod) == 60
    # nested projection carried through: typed restart counts
    assert all(isinstance(r["restarts"], int) for r in out)
    assert all(r["image"].startswith("registry.local/") for r in out)


def test_template_scan_resources(spark, sf_dir):
    out = formats_q.q_template_scan(spark, sf_dir).collect()
    assert len(out) == 25
    ids = sorted(r["logical_id"] for r in out)
    assert ids[0] == "Res00" and ids[-1] == "Res24"
    assert {r["resource_type"] for r in out} == {
        "AWS::EC2::VPC",
        "AWS::EC2::Subnet",
        "AWS::Lambda::Function",
        "AWS::S3::Bucket",
        "AWS::IAM::Role",
    }
    assert sorted(r["idx"] for r in out) == list(range(25))


def test_partition_prune_query_prunes(spark, sf_dir):
    """q_partition_prune's read-back scan must carry non-empty
    PartitionFilters on `day` — the 100 TB read-path certificate."""
    out = formats_q.q_partition_prune(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in seg and seg.strip()
    rows = {r["day"]: r for r in out.collect()}
    assert set(rows) == {"2024-01-05", "2024-01-06", "2024-01-07"}
    assert all(r["n_events"] > 0 for r in rows.values())


def test_prefix_sums_matches_global_window(spark):
    """Distributed two-phase row number == single-partition row_number
    on a frame with duplicate order keys + unique tiebreaker."""
    from pyspark.sql import Window

    df = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("uid")
    )
    got = prefix_sums(
        df, [F.asc("k"), F.asc("uid")], row_number="i", npartitions=7
    )
    want = df.withColumn(
        "i", F.row_number().over(Window.orderBy(F.asc("k"), F.asc("uid")))
    )
    assert (
        got.select("k", "uid", "i").exceptAll(want.select("k", "uid", "i")).count()
        == 0
    )
    assert got.count() == 1000


def test_prefix_sums_cumsum_and_totals(spark):
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    got = prefix_sums(
        df,
        [F.asc("k")],
        sums={"cum_v": F.col("v")},
        totals={"tot_v": "cum_v"},
        npartitions=5,
    )
    rows = {r["k"]: r for r in got.collect()}
    assert rows[1]["cum_v"] == 2
    assert rows[100]["cum_v"] == 100 * 101  # 2 * sum(1..100)
    assert all(r["tot_v"] == 100 * 101 for r in rows.values())


def test_ntile_from_rank_matches_ntile(spark):
    """Closed-form NTILE(k) from (i, n) == F.ntile(k) for awkward
    n/k combinations including n < k."""
    from pyspark.sql import Window

    for n, k in [(10, 4), (103, 10), (3, 7), (12, 12), (1, 5)]:
        df = spark.range(1, n + 1).select(F.col("id").alias("i"))
        got = df.select(
            "i",
            ntile_from_rank(F.col("i"), F.lit(n).cast("bigint"), k)
            .cast("int")
            .alias("b"),
        )
        want = df.select(
            "i", F.ntile(k).over(Window.orderBy("i")).alias("b")
        )
        diff = got.exceptAll(want).count()
        assert diff == 0, f"ntile mismatch for n={n}, k={k}"


def test_bucketed_merge_query_is_shuffle_free(spark, sf_dir):
    """q_bucketed_merge's full-outer merge must run with NO Exchange —
    the bucketed scans satisfy the join's hash requirement."""
    from etl_neptune_spark.plans.formats_q import q_bucketed_merge

    out = q_bucketed_merge(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "Exchange" not in plan, plan[:1500]
    assert out.count() > 0


def test_prefix_sums_empty_and_descending(spark):
    from pyspark.sql import Window

    empty = spark.createDataFrame([], "k bigint, uid bigint")
    got = prefix_sums(
        empty, [F.asc("k"), F.asc("uid")], row_number="i", npartitions=4
    )
    assert got.count() == 0 and "i" in got.columns

    df = spark.range(0, 500).select(
        (F.col("id") % 9).alias("k"), F.col("id").alias("uid")
    )
    got = prefix_sums(
        df, [F.desc("k"), F.asc("uid")], row_number="i", npartitions=6
    )
    want = df.withColumn(
        "i", F.row_number().over(Window.orderBy(F.desc("k"), F.asc("uid")))
    )
    assert got.exceptAll(want).count() == 0
