"""Incremental join-view maintenance, cross-corpus dedup, PMI."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.operators.dedup import cross_minhash_pairs
from etl_neptune_spark.operators.incremental import delta_join_view
from etl_neptune_spark.operators.text import collocation_pmi


def test_delta_join_view_matches_full_recompute(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, av string"
    )
    b = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (3, 30), (4, 40)], "k long, bv long"
    )
    a_new, b_new = F.col("k") >= 3, F.col("k").isin(1, 4)
    delta = delta_join_view(
        a.filter(~a_new), a.filter(a_new), b.filter(~b_new), b.filter(b_new), ["k"]
    )
    maintained = a.filter(~a_new).join(b.filter(~b_new), "k").unionByName(delta)
    full = a.join(b, "k")
    # Bag equality: same multiset of joined rows, no term missed or doubled.
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_delta_join_view_empty_deltas_are_noop(spark):
    a = spark.createDataFrame([(1, "x")], "k long, av string")
    b = spark.createDataFrame([(1, 10)], "k long, bv long")
    empty_a, empty_b = a.filter(F.lit(False)), b.filter(F.lit(False))
    assert delta_join_view(a, empty_a, b, empty_b, ["k"]).count() == 0


def test_cross_minhash_pairs_finds_only_cross_side(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different words about spark shuffles and joins here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
         (11, "nothing shared with anything else in this corpus at all")],
        "doc_id long, text string",
    )
    out = cross_minhash_pairs(corpus, batch, min_jaccard=0.5).collect()
    assert [(r.corpus_id, r.batch_id, r.jaccard) for r in out] == [(1, 10, 1.0)]


def test_collocation_pmi_prefers_exclusive_pairs(spark):
    # "a b" always adjacent and exclusive; "c d" words also appear apart.
    docs = spark.createDataFrame(
        [(i, "a b c d c e d f") for i in range(10)], "doc_id long, text string"
    )
    rows = {(r.w1, r.w2): r for r in collocation_pmi(docs, min_count=10).collect()}
    ab, cd = rows[("a", "b")], rows[("c", "d")]
    assert ab.pair_count == 10 and ab.c1 == 10 and ab.c2 == 10
    # p(a b)=10/70, p(a)=p(b)=10/80 → pmi=ln((1/7)/(1/64)) > 0
    assert ab.pmi > cd.pmi > 0
