"""End-to-end pipeline compositions — SURVEY §3.

Each reference pipeline, re-expressed as a composition of the engine's
certified operators against the fixture tables: deepflow lives in
``streaming.pipeline`` (§3.1); ``aws`` is the 16-step snapshot DAG
(§3.2); ``cfn`` is the template-dependency extraction (§3.3).
"""

from .aws import run_aws_snapshot_etl
from .cfn import extract_declared_deps, run_cfn_etl

__all__ = ["extract_declared_deps", "run_aws_snapshot_etl", "run_cfn_etl"]
