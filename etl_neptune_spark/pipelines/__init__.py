"""End-to-end pipeline compositions — SURVEY §3 plus the corpus DAG.

Each reference pipeline, re-expressed as a composition of the engine's
certified operators against the fixture tables: deepflow lives in
``streaming.pipeline`` (§3.1); ``aws`` is the 16-step snapshot DAG
(§3.2); ``cfn`` is the template-dependency extraction (§3.3);
``corpus`` is the LLM-data analogue — raw documents through quality
gates, decontamination, exact + near dedup, split, and packing.
"""

from .aws import run_aws_snapshot_etl
from .cfn import extract_declared_deps, run_cfn_etl
from .corpus import run_corpus_pipeline

__all__ = [
    "extract_declared_deps",
    "run_aws_snapshot_etl",
    "run_cfn_etl",
    "run_corpus_pipeline",
]
