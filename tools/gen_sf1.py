"""sf1 amplifier — a 10× fixture for the scaling sweep (VERDICT r4
task 2: the sf0.1 → sf1 step is where a hidden super-linear term first
shows; no driver-provided sf1 exists, so derive one).

DETERMINISTIC amplification of /root/testdata/sf0.1 (no randomness —
every value is a pure function of the source row and the replica
index r ∈ 0..9):

- ``events``  ×10: new event_id = id·10 + r; user population also
  grows 10× (user_id·10 + r) so per-user rollups scale in CARDINALITY,
  not just mass; ts shifts by r minutes (density grows inside the same
  span, like a busier service); value jitters by a deterministic cent
  so value-grid frames (q_ks_test-style) grow too.
- ``documents`` ×10: doc_id·10 + r. Replica r=0 keeps the original
  text; r=1 is an EXACT copy for every 5th original (duplicate RATE is
  preserved, so dup-cluster COUNT grows ~linearly with the corpus —
  cluster SIZE must NOT grow with scale, or pair mass grows
  quadratically: the first draft of this amplifier appended a tiny
  suffix for r≥2, leaving ~all shingles shared, which made every doc a
  10-way near-dup cluster and OOMed the candidate-pair join at sf1 —
  a fixture artifact, not a corpus shape); r≥2 (and non-copy r=1)
  REPLACE every 3rd word with a (doc, r)-salted token: the dedup
  shingles are word 3-GRAMS, so no original 3-gram survives mutation
  (replicas are genuinely new content), word count — hence postings —
  grows exactly ×10, and the doc salt keeps mutated-shingle df at ~1
  (an unsalted marker left 2-word windows colliding corpus-wide:
  df≈190, Σdf² ×175, and the inverted-index self-join OOMed/ground —
  measured, not hypothetical. A boilerplate-prepend variant that
  pushed a shingle class over df_cap was tried and REJECTED: its
  boundary-shingle halo inflated the light join and span costs 2-5×,
  muddying the linearity signal — the heavy path is covered by
  tests/test_llm_ops.py::test_ngram_jaccard_df_cap_heavy_accounting
  instead).
  Known axis shift: distinct-shingle count grows ~×80 (all-new-text
  regime — the base corpus reuses a tiny phrase pool, 27k distinct
  shingles across 5k docs), so digest-bound kernels (MinHash) scale
  with that axis rather than with rows; SCALING.md notes it.
- ``embeddings`` ×10: vec_id·10 + r, one coordinate perturbed per
  replica (deterministic) so ANN candidate sets stay non-degenerate.
- ``orders``/``lineitem`` ×10 with consistent orderkey remapping
  (o_orderkey·10 + r on both sides) — fact tables grow, dimension
  tables (region/nation/customer/supplier/part) stay, the standard
  fact-vs-dim scaling shape.

Output: <repo>/spark-warehouse/sf1/<table>.parquet (dims symlinked).
Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, src: str, out: str, tables: set[str] | None = None) -> None:
    """Amplify ``src`` ×10 into ``out``. ``tables`` restricts which fact
    tables are generated (default: all five) — the sf100 probe amplifies
    only the LLM-pipeline facts (events/documents/embeddings) because
    its query set never touches orders/lineitem and 600M lineitem rows
    would dominate generation time for nothing."""
    from pyspark.sql import functions as F

    from etl_neptune_spark.sources import load_table

    def want(name: str) -> bool:
        return tables is None or name in tables

    os.makedirs(out, exist_ok=True)
    r = F.col("_r")

    def amplified(name: str):
        return load_table(spark, src, name).withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(9)))
        )

    ev = amplified("events").select(
        (F.col("event_id") * 10 + r).alias("event_id"),
        (F.col("ts") + (r * F.expr("INTERVAL 1 MINUTE"))).alias("ts"),
        (F.col("user_id") * 10 + r).alias("user_id"),
        "event_type",
        (F.col("value") + r.cast("double") * 0.01).alias("value"),
        "props",
    )
    if want("events"):
        ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    keep_original = (r == 0) | ((r == 1) & (F.col("doc_id") % 5 == 0))
    # (doc, r)-salted replacement token — see module docstring. The salt
    # is the FULL doc_id (r9: it was doc_id % 997, which at 5M docs gave
    # every salt value ~5k carriers; re-salting already-amplified text in
    # generations 2-3 then COLLIDED shingles across unrelated docs —
    # prefix df degraded 1.2 → 7.1 and the sf100 prefix join's candidate
    # multiset blew past local disk, a pure fixture artifact). A
    # globally-unique token per (doc, replica) keeps mutated-shingle
    # document frequency exactly 1 at every generation — the documented
    # intent of the salt.
    tok = F.concat(
        F.lit("zzsf"),
        r.cast("string"),
        F.lit("x"),
        F.col("doc_id").cast("string"),
    )
    mutated = F.array_join(
        F.zip_with(
            F.split(F.col("text"), " "),
            F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
            lambda w, i: F.when(i % 3 == 2, tok).otherwise(w),
        ),
        " ",
    )
    new_text = F.when(keep_original, F.col("text")).otherwise(mutated)
    docs = amplified("documents").select(
        (F.col("doc_id") * 10 + r).alias("doc_id"),
        new_text.alias("text"),
        "lang",
        "source",
        F.length(new_text).cast("bigint").alias("n_chars"),
    )
    if want("documents"):
        docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = amplified("embeddings").select(
        (F.col("vec_id") * 10 + r).alias("vec_id"),
        F.transform(
            "embedding",
            lambda v, i: v
            + F.when(
                i == F.pmod(r.cast("int"), F.size("embedding")),
                r.cast("float") * F.lit(0.003),
            ).otherwise(F.lit(0.0)),
        ).cast("array<float>").alias("embedding"),
        "label",
    )
    if want("embeddings"):
        # Write with real scan parallelism (r10, guide §6): the narrow
        # amplified frame otherwise lands as ONE file with ONE row
        # group (2M vectors ≈ 30 MB compressed), and a single-row-group
        # file is unsplittable — every downstream kernel, checkpoint
        # and cap-split pass serializes through one task regardless of
        # maxPartitionBytes. This single-file layout, not the Python
        # boundary alone, was the r9 ">40 min at 2M vectors" bind.
        emb.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet")
        )

    orders = amplified("orders").select(
        (F.col("o_orderkey") * 10 + r).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    if want("orders"):
        orders.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))

    li = amplified("lineitem").select(
        (F.col("l_orderkey") * 10 + r).alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    if want("lineitem"):
        li.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))

    for t in "region nation customer supplier part".split():
        dst = os.path.join(out, f"{t}.parquet")
        srcf = os.path.join(src.rstrip("/"), f"{t}.parquet")
        if not os.path.exists(dst) and os.path.exists(srcf):
            os.symlink(srcf, dst)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "spark-warehouse", "sf1")
    )
    from etl_neptune_spark.session import get_spark

    spark = get_spark("gen_sf1")
    build(spark, src, out)
    print(f"sf1 fixture written to {out}")


if __name__ == "__main__":
    main()
