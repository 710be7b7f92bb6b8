"""Shuffle-free MERGE on bucketed tables — the 100 TB claim, proven.

SURVEY §7 and operators/merge.py state that with both sides bucketed on
the merge key the full-outer join runs without an Exchange. This test
writes both sides as bucketed tables and asserts the executed merge
plan contains NO shuffle (bucketed scans satisfy the join's required
hash distribution — given plain-equality keys; see merge_keyed's
``null_safe`` note).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_neptune_spark.operators.merge import merge_keyed
from etl_neptune_spark.sources import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    existing = cust.select(
        F.lit("EC2Instance").alias("label"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
    incoming = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.lit("EC2Instance").alias("label"),
        F.col("c_name").alias("name"),
        (F.col("c_acctbal") * 2).alias("balance"),
    )
    names = []
    for name, df in (("bt_existing", existing), ("bt_incoming", incoming)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "label", "name")
            .sortBy("label", "name")
            .mode("overwrite")
            .saveAsTable(name)
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_merge_has_no_exchange(spark, bucketed_tables):
    ex, inc = (spark.table(n) for n in bucketed_tables)
    merged = merge_keyed(
        ex,
        inc,
        keys=["label", "name"],
        update_cols=["balance"],
        null_safe=False,
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "Exchange" not in plan, plan
    # and the merge is still correct: updated where incoming, kept where not
    n_ex, n_inc = ex.count(), inc.count()
    assert merged.count() == n_ex
    doubled = merged.join(
        ex.select("name", F.col("balance").alias("old")), "name"
    ).filter(F.col("balance") != F.col("old"))
    assert doubled.count() == n_inc
