"""Tests for the late round-5 waves: storage certificates
(q_schema_evolution, q_mv_rewrite, q_store_time_travel), order
statistics (q_exact_quantiles, q_mode), segments (q_bitmask) and the
kNN eval. Values are oracle-certified; these pin the properties the
value hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.plans import formats_q, graph, llm, relational, timeseries
from etl_neptune_spark.sources import load_table


def test_schema_evolution_nulls_only_in_old_generation(spark, sf_dir):
    out = {r["o_orderstatus"]: r
           for r in formats_q.q_schema_evolution(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    per = {r["o_orderstatus"]: (r["n"], r["odd"]) for r in orders.groupBy(
        "o_orderstatus").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("o_orderkey") % 2 == 1).alias("odd")).collect()}
    for st, (n, odd) in per.items():
        assert out[st]["n_rows"] == n
        assert out[st]["n_priced"] == odd  # only the new generation is priced


def test_mv_rewrite_composes_to_month(spark, sf_dir):
    """The MV answer must equal the direct monthly aggregate — rollup
    composability checked engine-side (the oracle checks vs DuckDB)."""
    mv = {(r["month"], r["event_type"]): (r["n_events"], r["cents"])
          for r in timeseries.q_mv_rewrite(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    direct = ev.groupBy(
        F.date_trunc("month", "ts").cast("date").alias("month"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"),
    )
    expect = {(r["month"], r["event_type"]): (r["n"], r["c"])
              for r in direct.collect()}
    assert mv == expect


def test_store_time_travel_classes_partition_keys(spark, sf_dir):
    rows = {r["status"]: r for r in
            graph.q_store_time_travel(spark, sf_dir).collect()}
    assert set(rows) == {"inserted", "updated", "carried"}
    # v0 checksum only covers keys that existed at v0
    assert rows["inserted"]["cents_v0"] == 0
    for st in ("updated", "carried"):
        assert rows[st]["n_keys"] > 0


def test_exact_quantiles_bracket_numpy(spark, sf_dir):
    out = {r["event_type"]: r
           for r in relational.q_exact_quantiles(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    ).collect()
    groups: dict[str, list[int]] = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["c"])
    for et, vals in groups.items():
        vals.sort()
        n = len(vals)
        for q in relational.QUANTILE_PCTS:
            rank = -(-n * q // 100)  # ceil
            assert out[et][f"p{q}"] == vals[rank - 1], (et, q)


def test_bitmask_decodes_types(spark, sf_dir):
    rows = relational.q_bitmask(spark, sf_dir).collect()
    for r in rows:
        assert r["n_types"] == bin(r["mask"]).count("1")
        assert 0 < r["mask"] < 32
        assert r["n_users"] <= r["n_user_weeks"]


def test_knn_confusion_totals(spark, sf_dir):
    rows = llm.q_knn_classifier(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_queries = emb.filter(F.col("vec_id") % 7 == 0).count()
    assert sum(r["n"] for r in rows) == n_queries
    # every predicted label comes from the real label domain (accuracy
    # itself is a property of the synthetic fixture, not the engine —
    # these embeddings' labels are NOT neighborhood-recoverable, and
    # that is exactly what the confusion matrix is for)
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["pred_label"] for r in rows} <= labels
    assert {r["true_label"] for r in rows} <= labels
