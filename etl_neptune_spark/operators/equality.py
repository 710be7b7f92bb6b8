"""Single-pass multiset-equality check for in-query certificates.

Several certificates raise when two DataFrames are not multiset-equal
(persisted-vs-fresh ANN answers, streamed-vs-batched appends,
compaction invariance). The original form::

    a.exceptAll(b).count() + b.exceptAll(a).count()

costs TWO actions, each planning a shuffling set-difference over both
inputs — four traversals of the inputs and two jobs per check.
``multiset_diff_count`` computes the same zero-test in ONE action and
ONE shuffle: tag each side with a +1/-1 weight, union, hash-aggregate
by the full row, and count groups whose weight sum is non-zero.

Equivalence of the zero test: ``sum(|w|) == 0`` over the grouped union
iff every row value occurs with equal multiplicity on both sides iff
``exceptAll`` is empty in both directions. (The non-zero COUNT differs
from the exceptAll row-count sum — it counts distinct differing values,
not excess rows — but every certificate only branches on ``diff != 0``
and reports the number in an error message, so the check is
equivalent and the failure report stays informative.)

Float columns compare exactly (IEEE bit-for-bit via hash aggregation,
NaN==NaN and -0.0==0.0 per Spark's group-key semantics) — the same
comparison ``exceptAll`` (also hash-based) applied, so certificates see
identical verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multiset_diff_count(a: DataFrame, b: DataFrame) -> int:
    """Number of distinct row values whose multiplicity differs between
    ``a`` and ``b`` (0 iff the frames are multiset-equal). One job, one
    shuffle; both inputs traversed once."""
    cols = a.columns
    tagged = a.select(*cols, F.lit(1).alias("__w")).unionByName(
        b.select(*cols, F.lit(-1).alias("__w"))
    )
    return (
        tagged.groupBy(*cols)
        .agg(F.sum("__w").alias("__d"))
        .filter(F.col("__d") != 0)
        .count()
    )
