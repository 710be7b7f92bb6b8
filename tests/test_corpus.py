"""Corpus-assembly operator tests: repetition filters, decontamination,
split assignment, sequence packing, PII redaction, centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.operators.dedup import word_shingles
from etl_neptune_spark.operators.packing import (
    assign_split,
    pack_sequences,
    pack_summary,
)
from etl_neptune_spark.operators.text import (
    decontaminate,
    redact_pii,
    repetition_features,
)


def test_word_shingles_short_doc_is_empty_not_error(spark):
    # Regression: sequence(1, 0) is descending in Spark and slice(_, 0, n)
    # throws — a doc shorter than n words must yield [] and never error.
    df = spark.createDataFrame([("a b",), ("",), ("a b c d e f",)], "text string")
    rows = df.select(F.size(word_shingles(F.col("text"), 5)).alias("k")).collect()
    assert [r.k for r in rows] == [0, 0, 2]


def test_repetition_features_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_features(docs).collect()}
    assert out[1].top_word_frac == 1.0 and not out[1].keep
    assert out[2].keep and out[2].distinct_ratio == 0.9
    # "the" appears twice in 10 words.
    assert out[2].top_word_frac == 0.2


def test_decontaminate_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),       # shares 1 3-gram
            (2, "clean text with no overlap here"),
            (3, "alpha beta gamma delta zz"),  # shares 2 3-grams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hit_shingles for r in decontaminate(docs, bench, n=3).collect()}
    assert out == {1: 1, 3: 2}


def test_split_assignment_is_deterministic_and_total(spark):
    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = assign_split(docs)
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # 12/16 expected train share; allow generous hash slack.
    assert 0.6 < counts["train"] / 1000 < 0.9
    # Re-running yields the identical assignment (hash-determinism).
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in assign_split(docs).collect()}
    assert a == b


def test_pack_sequences_matches_serial_prefix_sum(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.randint(1, 900)) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # Small block size forces many blocks → exercises the offset join.
    packed = {
        r.doc_id: r
        for r in pack_sequences(docs, capacity=1000, block=37).collect()
    }
    start = 0
    for i, n in rows:
        assert packed[i].start == start, i
        assert packed[i].seq_id == start // 1000
        assert packed[i].crosses_boundary == (start // 1000 != (start + n - 1) // 1000)
        start += n
    summary = pack_summary(spark.createDataFrame(list(packed.values())), 1000)
    total = summary.agg(F.sum("tokens")).first()[0]
    assert total == start


def test_pack_sequences_plan_has_no_global_single_partition_window(spark):
    docs = spark.range(10000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n_tokens")
    )
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    # The data-path window is partitioned by block; only the tiny
    # per-block offset table may be singly-partitioned.
    first_window = plan[plan.index("Window") :][:400]
    assert "_blk" in first_window


def test_redact_counts_and_scrubs(spark):
    docs = spark.createDataFrame(
        [(1, "mail me at bob.smith@corp.example.org or call 415-5551234 now")],
        "doc_id long, text string",
    )
    r = redact_pii(docs).first()
    assert r.n_emails == 1 and r.n_phones == 1
    import hashlib

    clean = "mail me at <EMAIL> or call <PHONE> now"
    assert r.clean_hash == hashlib.md5(clean.encode()).hexdigest()
