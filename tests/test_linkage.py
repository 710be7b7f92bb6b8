"""Entity resolution, span dedup, and Z-order layout operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.operators.layout import morton_interleave, zorder_by
from etl_neptune_spark.operators.linkage import (
    blocked_candidates,
    collapse_exact,
    doc_spans,
    er_matches,
    repeated_span_stats,
)


def test_er_collapse_block_verify(spark):
    recs = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corp"),  # exact dup — must collapse
            (3, "acme corp."),  # edit distance 1
            (4, "acme labs"),  # distance 4 from "acme corp" — filtered
            (5, "zenith inc"),  # different block — never a candidate
        ],
        "key long, name string",
    )
    out = er_matches(recs, "name", "key", max_edit=2).collect()
    assert len(out) == 1
    m = out[0]
    assert (m.a_name, m.b_name, m.dist) == ("acme corp", "acme corp.", 1)
    assert m.a_rec == 2 and m.b_rec == 1  # collapse carried the record count
    assert m.a_key == 1 and m.b_key == 3


def test_er_multi_key_blocking_dedups_candidates(spark):
    names = collapse_exact(
        spark.createDataFrame([(1, "red gear"), (2, "red gearx")], "k long, name string"),
        "name",
        "k",
    )
    # Two overlapping blocking keys: same pair reachable through both —
    # must surface exactly once.
    cands = blocked_candidates(
        names,
        [F.split(F.col("name"), " ")[0], F.substring("name", 1, 3)],
    ).collect()
    assert len(cands) == 1


def test_doc_spans_positions_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, None)], "doc_id long, text string"
    )
    rows = doc_spans(docs, n=3).collect()
    # doc 1 has two 3-word windows at positions 1 and 2; doc 2 too short.
    assert sorted((r.doc_id, r.pos) for r in rows) == [(1, 1), (1, 2)]


def test_repeated_span_stats_marks_cross_and_intra_doc_repeats(spark):
    docs = spark.createDataFrame(
        [
            (1, "x y z q"),      # spans: "x y z", "y z q"
            (2, "x y z w"),      # shares "x y z" with doc 1
            (3, "p p p p"),      # intra-doc repeat: "p p p" twice
            (4, "u v w t"),      # all unique spans
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repeated_span_stats(docs, n=3, max_dup_frac=0.4).collect()}
    assert out[1].n_spans == 2 and out[1].n_dup_spans == 1
    assert out[2].n_dup_spans == 1
    assert out[3].n_spans == 2 and out[3].n_dup_spans == 2  # self-repeat counts
    assert out[4].n_dup_spans == 0 and out[4].keep
    assert not out[3].keep  # 100% duplicated > 40% cap


def test_morton_interleave_known_values(spark):
    df = spark.range(1).select(
        morton_interleave(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    )
    # x=5 (bits 1,0,1 at even positions 0,2,4), y=3 (bits 1,1,0 at odd 1,3,5)
    # z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    #   = 1 | 2 | 0 | 8 | 16 | 0 = 27
    assert df.collect()[0].z == 27


def test_zorder_by_clusters_ranges_disjointly(spark, sf_dir):
    from etl_neptune_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    x, y = (F.col("user_id") % 16).cast("long"), (F.col("event_id") % 16).cast("long")
    out = zorder_by(ev, x, y, bits=4, num_files=4)
    # Partitions must hold globally disjoint z-ranges (the data-skipping
    # property): max(z) of partition i < min(z) of partition i+1.
    zs = out.withColumn("z", morton_interleave(x, y, 4)).select("z")
    bounds = (
        zs.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("p")
        .collect()
    )
    nonempty = [b for b in bounds if b.lo is not None]
    assert len(nonempty) > 1
    for a, b in zip(nonempty, nonempty[1:]):
        assert a.hi <= b.lo
