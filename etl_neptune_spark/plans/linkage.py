"""Certified queries for entity resolution, exact substring-span
dedup, Z-order layout, and bounded-error approximate distinct counts.

These extend the engine past the reference's deterministic-id world
(`lambda/etl_aws/neptune_etl_aws.py:209-253` merges on exact ids) into
the fuzzy/layout territory a 100 TB training-data pipeline needs.
Operators live in ``operators.linkage`` / ``operators.layout``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import morton_interleave, morton_sql
from ..operators.linkage import er_matches, repeated_span_stats
from ..sources import load_table
from .registry import register


def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over part names: collapse the 2000-row
    record table to its distinct names, block on the first name token,
    verify candidates with Levenshtein ≤ 3 (JVM builtin → codegen).
    Each matched pair carries how many raw records each side collapsed
    (the re-expansion factor for downstream canonicalization)."""
    parts = load_table(spark, sf_dir, "part")
    return er_matches(parts, "p_name", "p_partkey", max_edit=3).select(
        "a_name",
        "b_name",
        "dist",
        "a_rec",
        "b_rec",
        F.col("a_key").alias("a_min_key"),
        F.col("b_key").alias("b_min_key"),
    )


register(
    "q_entity_match",
    q_entity_match,
    """
    WITH d AS (
        SELECT p_name AS name, count(*) AS n_rec, min(p_partkey) AS min_key
        FROM part GROUP BY p_name
    ),
    b AS (SELECT name, n_rec, min_key, string_split(name, ' ')[1] AS blk FROM d)
    SELECT a.name AS a_name, o.name AS b_name,
           levenshtein(a.name, o.name) AS dist,
           a.n_rec AS a_rec, o.n_rec AS b_rec,
           a.min_key AS a_min_key, o.min_key AS b_min_key
    FROM b a JOIN b o ON a.blk = o.blk AND a.name < o.name
    WHERE levenshtein(a.name, o.name) <= 3
    """,
)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (Lee et al. 2022 re-expressed
    relationally): every 8-word window, corpus-wide occurrence counts
    via one digest-keyed aggregation, per-doc duplicated-span fraction
    and a keep verdict. Docs shorter than 8 words have no span and are
    absent (nothing to deduplicate)."""
    docs = load_table(spark, sf_dir, "documents")
    return repeated_span_stats(docs, n=8, max_dup_frac=0.3)


register(
    "q_span_dedup",
    q_span_dedup,
    """
    WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    posn AS (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS pos
        FROM w
    ),
    sp AS (
        SELECT doc_id, pos, array_to_string(ws[pos:pos+7], ' ') AS span
        FROM posn
    ),
    cnt AS (SELECT span, count(*) AS occ FROM sp GROUP BY span)
    SELECT sp.doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN cnt.occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           round(sum(CASE WHEN cnt.occ >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS dup_frac,
           round(sum(CASE WHEN cnt.occ >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) <= 0.3 AS keep
    FROM sp JOIN cnt USING (span)
    GROUP BY sp.doc_id
    """,
)


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two bucketed event
    dimensions — the layout `OPTIMIZE ZORDER BY` computes so parquet
    min/max stats prune range predicates on either column. Certifies
    the bit-interleave math; ``operators.layout.zorder_by`` adds the
    range-shuffle clustering (covered by tests/test_linkage.py)."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).cast("long")
    y = (F.col("event_id") % 256).cast("long")
    return ev.select(
        "event_id",
        x.alias("x_bucket"),
        y.alias("y_bucket"),
        morton_interleave(x, y, bits=8).alias("z_code"),
    )


register(
    "q_zorder",
    q_zorder,
    f"""
    SELECT event_id,
           (user_id % 256) AS x_bucket,
           (event_id % 256) AS y_bucket,
           ({morton_sql('(user_id % 256)', '(event_id % 256)', bits=8)}) AS z_code
    FROM events
    """,
)


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per event type, certified
    against the exact count with a 5% relative-error contract: the
    oracle computes the exact count and asserts the bound holds
    (within_5pct must be uniformly true). The approximate path is the
    100 TB plan — one pass, constant memory per group, no
    count-distinct expand — and HLL sketches merge associatively
    across partitions, so the answer is partitioning-independent."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("approx") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("within_5pct"),
        )
    )


register(
    "q_approx_distinct",
    q_approx_distinct,
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
