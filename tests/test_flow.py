from __future__ import annotations

from etl_neptune_spark.plans.flow import TOP_K, q_flow_edges


def test_flow_edges_shape(spark, sf_dir):
    df = q_flow_edges(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= TOP_K
    cols = df.columns
    assert cols == [
        "src",
        "dst",
        "protocol",
        "calls",
        "avg_duration_ms",
        "p99_ms",
        "error_count",
        "error_rate",
    ]
    for r in rows:
        assert r.src != r.dst
        assert r.calls >= 2
        assert 0 <= r.error_count <= r.calls
        assert 0.0 <= r.error_rate <= 1.0
        assert r.avg_duration_ms > 0


def test_flow_edges_deterministic(spark, sf_dir):
    a = [tuple(r) for r in q_flow_edges(spark, sf_dir).collect()]
    b = [tuple(r) for r in q_flow_edges(spark, sf_dir).collect()]
    assert a == b


def test_incremental_state_merge_is_batching_invariant(spark, sf_dir):
    """Folding 1, 2, or 5 micro-batches of partial state must yield the
    identical standing table — the associativity that lets incremental
    runs replace full rescans."""
    from pyspark.sql import functions as F

    from etl_neptune_spark.operators.incremental import merge_states, partial_state
    from etl_neptune_spark.sources import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 7).alias("k"),
        F.col("value").cast("decimal(28,2)").alias("v"),
    )

    def standing(n_batches: int):
        states = [
            partial_state(
                events.filter(F.col("event_id") % n_batches == p),
                ["k"],
                counts={"n": None},
                sums={"s": F.col("v")},
                maxs={"mx": F.col("v")},
            )
            for p in range(n_batches)
        ]
        merged = merge_states(states, ["k"], ["n", "s"], ["mx"])
        return sorted(tuple(r) for r in merged.collect())

    one, two, five = standing(1), standing(2), standing(5)
    assert one == two == five
