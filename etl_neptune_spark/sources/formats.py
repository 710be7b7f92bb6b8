"""Non-parquet source formats — SURVEY §2.1 SRC2–SRC6.

The reference ingests four wire formats besides its primary stores:

- **TSV rows** from ClickHouse HTTP (``ch_query``,
  lambda/etl_deepflow/neptune_etl_deepflow.py:116-125) — here
  ``read_tsv`` (schema-full CSV scan, tab separator, pushdown intact).
- **JSON rows** (``ch_query_json``, neptune_etl_deepflow.py:127-136;
  K8s API payloads neptune_etl_deepflow.py:288-442) — ``read_json``
  plus ``explode_nested`` for the containers[]/status.* shapes.
- **Templates** (CloudFormation ``GetTemplate`` JSON with YAML
  fallback, lambda/etl_cfn/neptune_etl_cfn.py:169-183) —
  ``parse_template_text`` mirrors the JSON-then-YAML fallback;
  YAML support is optional (import-guarded) exactly because the
  reference vendored PyYAML for it.
- **Small dimension maps** (logical→physical id,
  neptune_etl_cfn.py:185-198) — ``broadcast_dim`` wraps the
  literal-rows → broadcast-join pattern every §2.3 J-join builds on.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_tsv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = False
) -> DataFrame:
    """Schema-full TSV scan (SRC2). Explicit schema — never inference —
    so the scan is a single pass and column pruning works."""
    return (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("header", str(header).lower())
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """JSON-lines scan (SRC3/SRC4). Schema optional: nested API payloads
    (K8s pods etc.) usually want an explicit StructType so missing
    fields surface as typed nulls instead of schema drift."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def explode_nested(
    df: DataFrame, array_col: str, fields: Sequence[str], keep: Sequence[str] = ()
) -> DataFrame:
    """Flatten one nested array-of-struct column: one output row per
    element, projecting ``fields`` (dotted paths relative to the
    element) — the K8s ``spec.containers[].image`` /
    ``status.containerStatuses[].restartCount`` shape
    (neptune_etl_deepflow.py:331-367)."""
    el = F.explode(F.col(array_col)).alias("_el")
    out = [F.col(k) for k in keep]
    out += [F.col(f"_el.{f}").alias(f.replace(".", "_")) for f in fields]
    return df.select(*keep, el).select(*out)


def parse_template_text(text: str) -> dict:
    """JSON-parse with YAML fallback (SRC5) — the reference's
    ``get_cfn_template`` behavior (neptune_etl_cfn.py:175-179). YAML is
    optional: raise a clear error when the text needs it and no parser
    is installed."""
    try:
        return json.loads(text)
    except (json.JSONDecodeError, TypeError):
        try:
            import yaml  # vendored by the reference; optional here
        except ImportError as e:  # pragma: no cover
            raise ValueError(
                "template is not JSON and no YAML parser is available"
            ) from e
        return yaml.safe_load(text)


def broadcast_dim(
    spark: SparkSession, rows: Sequence[tuple], schema: str
) -> DataFrame:
    """Literal dimension table marked for broadcast (SRC6 + every J11
    enrichment map): the FAULT_BOUNDARY_MAP / alias-map / priority-map
    pattern as a build-side-safe DataFrame."""
    return F.broadcast(spark.createDataFrame(list(rows), schema))
