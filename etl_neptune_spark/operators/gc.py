"""Ghost-entity GC — anti-join retention.

The reference deletes graph entities absent from the latest source
snapshot: per-label set difference ``stale = graph_ids - live_ids``
then drop (lambda/etl_aws/neptune_etl_aws.py:1932-2066 `_gc_vertices`),
and stale-alias node removal
(lambda/etl_deepflow/neptune_etl_deepflow.py:776-789).

Spark-first: a ``left_anti`` join. ``gc_stale`` returns the *stale*
rows (what the reference drops); ``gc_keep`` returns the survivors
(the rewritten table). Both are one shuffle on the key — broadcastable
when the live snapshot is a small dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def gc_stale(graph: DataFrame, live: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``graph`` whose key no longer exists in ``live``."""
    return graph.join(live.select(*keys).distinct(), list(keys), "left_anti")


def gc_keep(graph: DataFrame, live: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``graph`` still present in ``live`` (the post-GC table)."""
    return graph.join(live.select(*keys).distinct(), list(keys), "left_semi")
