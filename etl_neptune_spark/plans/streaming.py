"""Certified query for the streaming layer's event-time window
aggregation (ST2). ``windowed_flow_metrics`` is the same logical plan
in batch and streaming mode (watermark is a no-op in batch); running it
in batch mode against the DuckDB oracle certifies the window slicing +
aggregate semantics the streaming tests then exercise with triggers,
checkpoints and file-arrival batches (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from ..streaming.pipeline import flow_projection, windowed_flow_metrics
from .flow import DST_MOD, ERROR_THRESHOLD, SRC_MOD
from .registry import register

WINDOW_DAYS = 7


def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 7-day event-time windows over the flow projection —
    exact window boundaries (epoch-aligned) + per-window edge metrics."""
    events = load_table(spark, sf_dir, "events")
    return windowed_flow_metrics(flow_projection(events), window=f"{WINDOW_DAYS} days")


register(
    "q_stream_window",
    q_stream_window,
    f"""
    WITH flows AS (
        SELECT CAST(user_id % {SRC_MOD} AS BIGINT) AS src,
               TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                   % {DST_MOD} AS dst,
               event_type AS protocol,
               value, ts
        FROM events
        WHERE value > 0
    ),
    valid AS (SELECT * FROM flows WHERE src != dst)
    SELECT time_bucket(INTERVAL '{WINDOW_DAYS} days', ts, TIMESTAMP '1970-01-01')
               AS window_start,
           time_bucket(INTERVAL '{WINDOW_DAYS} days', ts, TIMESTAMP '1970-01-01')
               + INTERVAL '{WINDOW_DAYS} days' AS window_end,
           src, dst, protocol,
           count(*) AS calls,
           CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / count(value)
               AS avg_duration_ms,
           count(*) FILTER (WHERE value >= {ERROR_THRESHOLD}) AS error_count
    FROM valid
    GROUP BY 1, 2, src, dst, protocol
    """,
)


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (14-day size, 7-day slide): every row
    lands in size/slide = 2 overlapping windows. Spark aligns window
    starts to the epoch by the SLIDE interval; the oracle reproduces
    that as time_bucket(slide) - k*slide for k in 0..1."""
    events = load_table(spark, sf_dir, "events")
    return windowed_flow_metrics(
        flow_projection(events), window=f"{2 * WINDOW_DAYS} days", slide=f"{WINDOW_DAYS} days"
    )


register(
    "q_sliding_window",
    q_sliding_window,
    f"""
    WITH flows AS (
        SELECT CAST(user_id % {SRC_MOD} AS BIGINT) AS src,
               TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                   % {DST_MOD} AS dst,
               event_type AS protocol,
               value, ts
        FROM events
        WHERE value > 0
    ),
    valid AS (SELECT * FROM flows WHERE src != dst),
    slid AS (
        SELECT v.*,
               time_bucket(INTERVAL '{WINDOW_DAYS} days', ts, TIMESTAMP '1970-01-01')
                   - t.range * INTERVAL '{WINDOW_DAYS} days' AS window_start
        FROM valid v, range(0, 2) t
    )
    SELECT window_start,
           window_start + INTERVAL '{2 * WINDOW_DAYS} days' AS window_end,
           src, dst, protocol,
           count(*) AS calls,
           CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / count(value)
               AS avg_duration_ms,
           count(*) FILTER (WHERE value >= {ERROR_THRESHOLD}) AS error_count
    FROM slid
    GROUP BY 1, 2, src, dst, protocol
    """,
)
