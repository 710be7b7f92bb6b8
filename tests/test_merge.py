"""Merge-engine property tests — the semantics the reference got wrong
in production (fix_neptune_data.py:32-68: cardinality clobber;
neptune_etl_aws.py:225-227: onMatch must not rewrite create-only cols;
neptune_etl_aws.py:332: None props must not clobber)."""

from __future__ import annotations

from etl_neptune_spark.operators import gc_stale, merge_keyed


def _nodes(spark, rows):
    return spark.createDataFrame(
        rows, "name string, metric double, segment string, created_batch int"
    )


def test_merge_dedupe_order_takes_last_write_per_key(spark):
    # Duplicate keys in incoming would fan out through the full-outer
    # join; dedupe_order keeps only the greatest-ordered row per key.
    existing = _nodes(spark, [("a", 1.0, "s1", 1)])
    incoming = _nodes(spark, [("a", 5.0, "x", 2), ("a", 9.0, "y", 3)])
    out = merge_keyed(
        existing,
        incoming,
        keys=["name"],
        update_cols=["metric", "segment"],
        create_only_cols=["created_batch"],
        dedupe_order="created_batch",
    ).collect()
    assert len(out) == 1
    assert (out[0].metric, out[0].segment, out[0].created_batch) == (9.0, "y", 1)


def test_merge_update_create_and_insert(spark):
    existing = _nodes(spark, [("a", 1.0, "s1", 1), ("b", 2.0, "s2", 1)])
    incoming = _nodes(spark, [("b", 20.0, None, 2), ("c", 30.0, "s3", 2)])
    out = {
        r.name: r
        for r in merge_keyed(
            existing,
            incoming,
            keys=["name"],
            update_cols=["metric", "segment"],
            create_only_cols=["created_batch"],
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    # untouched existing row survives
    assert out["a"].metric == 1.0 and out["a"].created_batch == 1
    # matched: metric overwritten, None segment does NOT clobber,
    # create-only stamp NOT rewritten
    assert out["b"].metric == 20.0
    assert out["b"].segment == "s2"
    assert out["b"].created_batch == 1
    # insert: takes incoming values including create-only stamp
    assert out["c"].metric == 30.0 and out["c"].created_batch == 2


def test_merge_idempotent(spark):
    existing = _nodes(spark, [("a", 1.0, "s1", 1), ("b", 2.0, "s2", 1)])
    incoming = _nodes(spark, [("b", 20.0, None, 2), ("c", 30.0, "s3", 2)])
    kw = dict(keys=["name"], update_cols=["metric", "segment"], create_only_cols=["created_batch"])
    once = merge_keyed(existing, incoming, **kw)
    twice = merge_keyed(once, incoming, **kw)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_missing_column_in_one_side(spark):
    existing = spark.createDataFrame([("a", 1.0)], "name string, metric double")
    incoming = spark.createDataFrame([("a", "x"), ("b", "y")], "name string, owner string")
    out = {
        r.name: r
        for r in merge_keyed(
            existing, incoming, keys=["name"], update_cols=["metric", "owner"]
        ).collect()
    }
    assert out["a"].metric == 1.0 and out["a"].owner == "x"
    assert out["b"].metric is None and out["b"].owner == "y"


def test_merge_rejects_unknown_columns(spark):
    df = spark.createDataFrame([("a", 1.0)], "name string, metric double")
    try:
        merge_keyed(df, df, keys=["name"], update_cols=["nope"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)


def test_gc_stale_returns_only_missing_keys(spark):
    graph = spark.createDataFrame([("a",), ("b",), ("c",)], "name string")
    live = spark.createDataFrame([("b",)], "name string")
    stale = {r.name for r in gc_stale(graph, live, ["name"]).collect()}
    assert stale == {"a", "c"}
