"""multiset_diff_count must agree with the two-sided exceptAll zero-test
it replaced in the certificate queries (r10 optimization: one job/one
shuffle instead of two exceptAll jobs)."""

from __future__ import annotations

from etl_neptune_spark.operators.equality import multiset_diff_count


def _except_all_diff(a, b) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_equal_multisets_give_zero(spark):
    a = spark.createDataFrame(
        [(1, "x", 1.5), (1, "x", 1.5), (2, "y", float("nan"))],
        "id int, s string, v double",
    )
    b = spark.createDataFrame(
        [(2, "y", float("nan")), (1, "x", 1.5), (1, "x", 1.5)],
        "id int, s string, v double",
    )
    assert multiset_diff_count(a, b) == 0
    assert _except_all_diff(a, b) == 0


def test_multiplicity_mismatch_detected(spark):
    a = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "id int, s string")
    b = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "id int, s string")
    # (1,"x") appears 2 vs 1 and (2,"y") 1 vs 2: two differing values.
    got = multiset_diff_count(a, b)
    assert got != 0
    assert (_except_all_diff(a, b) != 0) == (got != 0)


def test_disjoint_and_null_rows(spark):
    a = spark.createDataFrame([(1, None), (3, "z")], "id int, s string")
    b = spark.createDataFrame([(1, None), (4, "w")], "id int, s string")
    got = multiset_diff_count(a, b)
    assert got != 0
    assert (_except_all_diff(a, b) != 0) == (got != 0)
    # The shared (1, NULL) row must not count as a difference.
    assert multiset_diff_count(a, a) == 0
