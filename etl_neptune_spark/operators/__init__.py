from .degrees import degree_metrics
from .gc import gc_stale
from .merge import merge_keyed

__all__ = ["degree_metrics", "gc_stale", "merge_keyed"]
