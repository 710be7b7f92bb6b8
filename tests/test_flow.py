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
