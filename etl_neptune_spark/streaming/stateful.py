"""Custom stateful streaming operator — ``applyInPandasWithState``.

The windowed/foreachBatch pipeline covers the reference's recompute-
per-run semantics; this operator demonstrates the third streaming
mode the engine exposes: TRUE keyed running state maintained by the
state store across micro-batches AND across query restarts (the
checkpoint holds it). Shape: per-(src,dst,protocol) running call/error
totals and first/last-seen stamps — the "lifetime edge counters" a
flow topology accumulates, which no per-batch recompute can produce.

State is kept as epoch-micros longs (exact, engine-neutral); the
output schema mirrors the state plus the key. At scale the state store
is RocksDB-backed and partitioned by the grouping key — the same
shuffle the aggregation would need anyway.

Spark 4's successor API (``transformWithStateInPandas`` — multiple
named state variables, TTL, timers) is the natural upgrade path but
requires the Python protobuf runtime for state serialization, which
this container lacks (ImportError probed 2026-08); the
``applyInPandasWithState`` form below is functionally equivalent for
this operator's single-value state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .pipeline import ERROR_THRESHOLD

OUTPUT_SCHEMA = (
    "src long, dst long, protocol string, calls long, errors long, "
    "first_seen_us long, last_seen_us long"
)
STATE_SCHEMA = "calls long, errors long, first_seen_us long, last_seen_us long"


def running_edge_totals(flows: DataFrame) -> DataFrame:
    """Running per-edge totals across every batch ever seen."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        calls, errors, first_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            calls += len(pdf)
            errors += int((pdf["value"] >= ERROR_THRESHOLD).sum())
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
            mn, mx = int(ts_us.min()), int(ts_us.max())
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
        state.update((calls, errors, first_us, last_us))
        src, dst, protocol = key
        yield pd.DataFrame(
            [
                {
                    "src": src,
                    "dst": dst,
                    "protocol": protocol,
                    "calls": calls,
                    "errors": errors,
                    "first_seen_us": first_us,
                    "last_seen_us": last_us,
                }
            ]
        )

    return flows.groupBy("src", "dst", "protocol").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
