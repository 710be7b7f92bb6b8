"""End-to-end corpus-assembly pipeline: raw documents → training-ready
packed sequences, as one batch DAG.

No reference counterpart (the reference pipelines are infrastructure
ETL; this is the LLM-data analogue of their staged ``run_etl`` posture —
reference lambda/etl_aws/neptune_etl_aws.py:1393-2114 sequences steps
and accumulates per-step ``stats``; so does this). Every stage is an
individually-certified operator; this module only sequences them and
counts what each gate removes — the per-stage accounting a data-curation
run must publish.

Stages (the standard curation order — cheap gates first so expensive
stages see the smallest corpus):

1. **Quality gates**: language ID + quality score + Gopher-style
   repetition verdict (all native expressions, shuffle-free).
2. **Decontamination**: drop docs sharing a word 3-gram with the eval
   set (broadcast of the eval shingle set, anti-join on the hits).
3. **Exact dedup**: first-arrival-wins on the content hash.
4. **Near-dup clustering**: MinHash band pairs → connected components →
   keep each cluster's minimum doc id.
5. **Split + packing**: md5-bucket train/val/test assignment, then
   concat-and-chunk packing of the train split.

At 100 TB each stage is one or two keyed shuffles over a monotonically
shrinking corpus; nothing here adds a plan shape the certified queries
don't already pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import minhash_lsh_pairs
from ..operators.packing import assign_split, pack_sequences
from ..operators.text import (
    decontaminate,
    lang_id,
    quality_score,
    repetition_features,
)
from ..sources import load_table


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    eval_docs: DataFrame | None = None,
    min_quality: float = 0.3,
    capacity: int = 512,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation DAG over the ``documents`` table.

    Returns ``(packed_train_docs, stats)`` where ``stats`` counts the
    corpus after every gate (the reference's per-step stats
    accumulation, SURVEY §2.4 A16). Deterministic end to end: every
    gate is seedless (md5-derived), so re-runs are byte-identical.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats: dict[str, int] = {"raw": docs.count()}

    # 1. quality gates — native expressions, one pass.
    rep = repetition_features(docs).select("doc_id", "keep")
    gated = (
        docs.join(rep, "doc_id")
        .withColumn("lang", lang_id(F.col("text")))
        .withColumn("q", quality_score(F.col("text")))
        .filter(F.col("keep") & (F.col("lang") == "en") & (F.col("q") >= min_quality))
        .select("doc_id", "text")
    )
    stats["after_quality"] = gated.count()

    # 2. decontamination against the eval set (default: the same
    # deterministic held-out slice q_decontaminate certifies).
    if eval_docs is None:
        eval_docs = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    hits = decontaminate(gated, eval_docs, n=3).select("doc_id")
    clean = gated.join(hits, "doc_id", "left_anti")
    stats["after_decontamination"] = clean.count()

    # 3. exact dedup — first-arrival-wins on the content hash.
    w_min = Window.partitionBy("content_hash")
    exact = (
        clean.withColumn("content_hash", F.md5(F.col("text")))
        .withColumn("keep_id", F.min("doc_id").over(w_min))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
    )
    stats["after_exact_dedup"] = exact.count()

    # 4. near-dup clusters → keep each cluster's min doc id (docs in no
    # cluster survive via the anti-join against the losers).
    pairs = minhash_lsh_pairs(exact)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    losers = comps.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("doc_id")
    )
    survivors = exact.join(losers, "doc_id", "left_anti")
    stats["after_near_dedup"] = survivors.count()

    # 5. split assignment, then packing of the train split.
    split = assign_split(survivors)
    train = split.filter(F.col("split") == "train").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    stats["train_docs"] = train.count()
    packed = pack_sequences(train, token_col="n_tokens", capacity=capacity)
    stats["packed_sequences"] = packed.select("seq_id").distinct().count()
    return packed, stats
