"""Skew mitigation — salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on in ``session.get_spark``) handles most
runtime skew; these helpers cover the two places AQE cannot: a hash
AGGREGATE whose hot key overwhelms one reducer, and a broadcast-less
join against a skewed build side. Both are pure plan rewrites — no
driver-side sampling, deterministic output.

At 100 TB: a handful of hot keys (the reference's flow table has
exactly this shape — a few chatty service pairs dominate) turn one
shuffle partition into the straggler; salting fans each hot key over
``salt`` reducers and re-combines, bounding any reducer at ~1/salt of
the hot key's volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Aggregates that re-combine with themselves across salt buckets.
_RECOMBINE = {"sum": F.sum, "min": F.min, "max": F.max}


def _row_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt from full row content.

    The salt becomes a shuffle grouping/join key, so it must be stable
    under task retry and stage recomputation — nondeterministic
    expressions (monotonically_increasing_id, rand) can re-salt rows
    mid-shuffle and lose/duplicate them (SPARK-23207-class hazard).
    Content hashing is retry-stable; rows identical in every column
    share a bucket, which affects spread only in the degenerate
    all-duplicates case, never correctness.
    """
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column | str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregate: groupBy(keys + salt) partial, then
    groupBy(keys) final. ``aggs`` maps output name → (fn, column) where
    fn ∈ {sum, count, min, max, avg}; count and avg are rewritten to
    sums so they re-combine exactly.

    Equivalent to ``df.groupBy(keys).agg(...)`` for any input;
    worthwhile when key frequency is very skewed. (Spark's hash
    aggregate already does map-side partials — salting additionally
    splits the REDUCE side of a hot key.)
    """
    salted = df.withColumn("__salt", _row_salt(df, salt))

    partial_exprs, final_exprs = [], []
    for name, (fn, col) in aggs.items():
        c = F.col(col) if isinstance(col, str) else col
        if fn == "count":
            partial_exprs.append(F.count(c).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "avg":
            partial_exprs.append(F.sum(c).alias(f"__ps_{name}"))
            partial_exprs.append(F.count(c).alias(f"__pc_{name}"))
            final_exprs.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        elif fn in _RECOMBINE:
            partial_exprs.append(_RECOMBINE[fn](c).alias(f"__p_{name}"))
            final_exprs.append(_RECOMBINE[fn](f"__p_{name}").alias(name))
        else:
            raise ValueError(f"unsupported salted aggregate: {fn}")

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the fact side's key,
    replicate the (smaller, but not broadcastable) dim side across all
    salt values, join on (key, salt). Output equals
    ``facts.join(dim, key, how)``; the hot key's probe rows now land on
    ``salt`` different reducers.

    Supported: inner and left joins (replication preserves their
    multiplicity).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    f = facts.withColumn("__salt", _row_salt(facts, salt))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return f.join(d, [key, "__salt"], how).drop("__salt")
