"""Snapshot CDC diff and compaction-bin planning."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_neptune_spark.operators.cdc import (
    apply_changelog,
    compaction_bins,
    snapshot_diff,
)


def test_snapshot_diff_classifies_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged — absent from the diff
         (2, "b", 21.0),      # update (value)
         (3, "c", None),      # unchanged with NULL value — absent
         (5, "e", 50.0)],     # insert; key 4 deleted
        "k long, s string, v double",
    )
    out = {r.k: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert set(out) == {2, 4, 5}
    assert out[2].change == "update" and out[2].old_v == 20.0 and out[2].new_v == 21.0
    assert out[4].change == "delete" and out[4].new_s is None
    assert out[5].change == "insert" and out[5].old_s is None


def test_snapshot_diff_null_value_transition_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    rows = snapshot_diff(old, new, keys=["k"]).collect()
    assert len(rows) == 1 and rows[0].change == "update"


def test_compaction_bins_respect_target_and_oversize(spark):
    files = spark.createDataFrame(
        [("big", 900), ("a", 300), ("b", 300), ("c", 300), ("d", 90)],
        "path string, size_bytes long",
    )
    rows = {r.path: r for r in compaction_bins(files, target_bytes=500).collect()}
    # Every file assigned exactly once; bytes conserved across bins.
    assert set(rows) == {"big", "a", "b", "c", "d"}
    total = sum(r.size_bytes for r in rows.values())
    assert sum({r.bin: r.bin_bytes for r in rows.values()}.values()) == total
    # Cum-sum windows (size desc): big 900→bin 1 ALONE (oversize file
    # dominates its own bin); a 1200/b 1500→bin 2; c 1800→3, d 1890→3.
    assert rows["big"].bin == 1
    assert {p for p, r in rows.items() if r.bin == rows["big"].bin} == {"big"}
    assert rows["a"].bin == rows["b"].bin == 2
    assert rows["c"].bin == rows["d"].bin == 3
    # Each shared bin's bytes stay within target + one straddling file.
    for r in rows.values():
        if r.path != "big":
            assert r.bin_bytes <= 500 + r.size_bytes


_SCHEMA = "k long, v long"
_snap = st.dictionaries(st.integers(0, 6), st.one_of(st.none(), st.integers(0, 3)), max_size=6)


def _df(spark, d):
    return spark.createDataFrame(list(d.items()) or [], _SCHEMA)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_snap, new=_snap)
def test_diff_apply_round_trip(spark, old, new):
    """apply_changelog(v_old, snapshot_diff(v_old, v_new)) == v_new for
    arbitrary keyed snapshots, including NULL values and NULL→value /
    value→NULL transitions."""
    diff = snapshot_diff(_df(spark, old), _df(spark, new), keys=["k"])
    applied = apply_changelog(_df(spark, old), diff, keys=["k"])
    assert {r.k: r.v for r in applied.collect()} == new


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_snap)
def test_diff_of_identical_snapshots_is_empty(spark, old):
    assert snapshot_diff(_df(spark, old), _df(spark, old), keys=["k"]).count() == 0
