"""Corpus assembly operators: deterministic split assignment and
concat-and-chunk sequence packing.

No reference counterpart (BASELINE.json north-star scope): these are
the two operations that turn a curated document set into training
input — a reproducible train/val/test partition and the assignment of
each document to a fixed-capacity context window.

Scale posture: split assignment is a pure per-row expression (zero
shuffle). Sequence packing needs a *global* prefix sum of token
counts; the naive formulation is a single-partition window over the
whole corpus, which dies at 100 TB. Here it is the two-phase layout
also used by ``sources.metrics``: a parallel per-block running sum
(window partitioned by a deterministic block key) plus a tiny
block-offset table (one row per block, metadata-scale) broadcast back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5-hex first character thresholds: 0-b train (12/16), c-d val
# (2/16), e-f test (2/16). Hash-based so the assignment is stable
# under corpus growth and independent of ingest order.
_VAL_LO, _TEST_LO = "c", "e"


def split_expr(id_col: str = "doc_id") -> Column:
    """train/val/test label from the md5 of the document id."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return (
        F.when(h < _VAL_LO, "train").when(h < _TEST_LO, "val").otherwise("test")
    )


def assign_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic ``split`` column (75/12.5/12.5 by md5
    bucket). Pure narrow projection — no shuffle, survives any scale."""
    return docs.withColumn("split", split_expr(id_col))


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Group-aware train/val/test split: every document in a near-dup
    cluster lands in the SAME split, so no train example has a
    near-duplicate in val/test (the eval-leakage failure mode a plain
    per-doc hash split cannot prevent — near-identical docs hash to
    independent buckets).

    ``dup_pairs`` is any pairwise near-dup edge set (MinHash / exact
    Jaccard / SimHash output); clusters are its connected components,
    and the split is the md5 bucket of the cluster's canonical id
    (min member id — singletons use their own id, so isolated docs get
    exactly the ``assign_split`` assignment).

    Scale: components cost is a function of the (small) dup-pair graph,
    not the corpus; the join back is one hash join on the doc id; the
    split itself stays a per-row expression. No reference counterpart
    (north-star scope).
    """
    from .components import connected_components

    comp = connected_components(dup_pairs, src=pair_a, dst=pair_b)
    return (
        docs.join(comp, docs[id_col] == comp["vertex"], "left")
        .withColumn("group_id", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("split", split_expr("group_id"))
        .drop("vertex", "component")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = 2048,
    block: int = 1024,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out in ``id_col``
    order and cut into ``capacity``-token context windows.

    Returns one row per document with its global token ``start``
    offset, the ``seq_id`` of the window its first token lands in, and
    ``crosses_boundary`` (the document straddles a window edge and
    will be split at training time).

    Precondition: ``id_col`` is numeric and globally unique (the fixture
    ids are dense bigints). Blocks of ``block`` consecutive ids give a
    deterministic, order-preserving partition key, so phase 1 (the
    within-block running sum) parallelizes across the corpus and only
    the one-row-per-block offset table is ordered globally.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        (F.col(id_col) / block).cast("bigint").alias("_blk"),
    )
    w_blk = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("_cum", F.sum("n_tokens").over(w_blk))
    # One row per block: metadata-scale (corpus_rows / block); the
    # global running offset over it is a window over that tiny table,
    # then broadcast back to the data path.
    w_off = (
        Window.orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("_blk")
        .agg(F.sum("n_tokens").alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
        .select("_blk", "_off")
    )
    packed = local.join(F.broadcast(offsets), "_blk")
    start = F.col("_off") + F.col("_cum") - F.col("n_tokens")
    end = F.col("_off") + F.col("_cum") - 1
    return packed.select(
        F.col(id_col),
        F.col("n_tokens"),
        start.alias("start"),
        (start / capacity).cast("bigint").alias("seq_id"),
        (
            (start / capacity).cast("bigint")
            != (end / capacity).cast("bigint")
        ).alias("crosses_boundary"),
    )


def pack_summary(packed: DataFrame, capacity: int = 2048) -> DataFrame:
    """Per-window occupancy report: documents whose first token lands
    in each window, token mass, and boundary-straddlers. One keyed
    hash aggregation on ``seq_id`` — linear, shuffle-minimal."""
    return packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
        F.min(F.col("start")).alias("first_start"),
        F.sum(F.col("crosses_boundary").cast("int")).alias("n_straddlers"),
    )
