"""Sink-side layout tests: the date-partitioned parquet sink that makes
the lookback scans partition-prune at 100 TB, plus ORC and CSV
round-trips for the secondary format surface.

SCALE.md claims "partition pruning on a date-partitioned layout — a
5-minute window reads 5 minutes, not all history"; this test writes
that layout and asserts the pruned scan actually skips the other
partitions (PartitionFilters in the scan node + partition count).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.sources import load_table


def test_date_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(out)
    )

    back = spark.read.parquet(out)
    assert back.count() == events.count()

    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    # the pruned scan must touch exactly one of the ~30 day partitions
    scanned = one_day.select(F.countDistinct("day")).first()[0]
    assert scanned == 1
    expected = events.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected

    # partition-pruned aggregate matches the unpartitioned computation
    a = (
        one_day.agg(F.sum(F.col("value").cast("decimal(28,2)"))).first()[0]
    )
    b = (
        events.filter(F.to_date("ts") == "2024-01-05")
        .agg(F.sum(F.col("value").cast("decimal(28,2)")))
        .first()[0]
    )
    assert a == b


def test_orc_and_csv_round_trip(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n = events.count()

    orc_path = str(tmp_path / "events_orc")
    events.write.mode("overwrite").orc(orc_path)
    orc_back = spark.read.orc(orc_path)
    assert orc_back.count() == n
    assert dict(orc_back.dtypes) == dict(events.dtypes)

    csv_path = str(tmp_path / "events_csv")
    events.write.mode("overwrite").option("header", True).csv(csv_path)
    csv_back = (
        spark.read.option("header", True)
        .schema(events.schema)
        .csv(csv_path)
    )
    assert csv_back.count() == n
    # value-level fidelity on a keyed sample
    a = {r.event_id: r.value for r in events.filter(F.col("event_id") < 100).collect()}
    b = {r.event_id: r.value for r in csv_back.filter(F.col("event_id") < 100).collect()}
    assert a == b
