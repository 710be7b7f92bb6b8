"""Structured-Streaming layer — SURVEY §2.8 ST1–ST7.

The reference is a recurring micro-batch system (EventBridge rates
5 min / 15 min / daily, lib/neptune-etl-stack.ts:148-238) whose state
lives in an idempotently-upserted keyed store. This package maps that
onto Structured Streaming: file-arrival sources, event-time windows,
and ``foreachBatch`` driving the engine's MERGE/GC operators against a
versioned parquet store.
"""

from .dedup import flag_neardups_batch, run_neardup_stream
from .pipeline import (
    EVENTS_SCHEMA,
    apply_health_alarms,
    dedup_stream,
    deepflow_batch,
    flow_projection,
    flow_stream,
    run_deepflow_stream,
    windowed_flow_metrics,
)
from .store import GraphStore

__all__ = [
    "EVENTS_SCHEMA",
    "GraphStore",
    "apply_health_alarms",
    "dedup_stream",
    "deepflow_batch",
    "flag_neardups_batch",
    "flow_projection",
    "flow_stream",
    "run_deepflow_stream",
    "windowed_flow_metrics",
]
