"""Incremental aggregate-state maintenance.

The reference's pipelines are INCREMENTAL by construction — the
deepflow ETL re-aggregates only a 5-minute window every run and merges
the result into the graph's standing per-edge metrics (reference
`lambda/etl_deepflow/neptune_etl_deepflow.py:633-646` with the standing
state kept in Neptune vertices). The Spark-native form of that posture
is an ALGEBRAIC aggregate state: per micro-batch, reduce events to
partial states (count / decimal-sum / conditional-count / max — all
commutative monoids), then fold new states into the standing table with
one keyed re-aggregation. Re-scanning history is never needed, and the
merge is associative, so any batching (5 minutes or 5 hours) yields
bit-identical standing metrics — which is exactly what
``q_incremental_agg`` certifies against a full single-pass recompute.

Non-mergeable metrics (exact percentiles) are out of scope by design:
at 100 TB you keep a mergeable sketch (t-digest / KLL) next to these
exact monoid columns; the reference's own p99 lives in ClickHouse's
approximate ``quantile`` for the same reason.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_state(
    batch: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column] | None = None,
    counts: dict[str, Column] | None = None,
    maxs: dict[str, Column] | None = None,
) -> DataFrame:
    """Reduce one micro-batch to per-key algebraic state.

    ``sums`` values should already be decimal-cast where exactness
    across re-merges matters (a double partial sum re-summed is
    fold-order dependent; a decimal one is exact).
    """
    aggs = [F.count("*").alias(n) if c is None else F.count_if(c).alias(n)
            for n, c in (counts or {}).items()]
    aggs += [F.sum(c).alias(n) for n, c in (sums or {}).items()]
    aggs += [F.max(c).alias(n) for n, c in (maxs or {}).items()]
    return batch.groupBy(*keys).agg(*aggs)


def merge_states(
    states: Iterable[DataFrame],
    keys: Sequence[str],
    sum_cols: Sequence[str],
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold partial states into one: union + ONE keyed re-aggregation
    (counts and sums re-sum, maxes re-max — the monoid operations).
    The union is free (no shuffle); the single exchange is on the state
    key, sized by the number of DISTINCT keys, not by event volume —
    the property that makes the standing-state table cheap to maintain
    at 100 TB."""
    it = iter(states)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.max(c).alias(c) for c in max_cols]
    return out.groupBy(*keys).agg(*aggs)


def delta_join_view(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """ΔV for the join view V = A ⋈ B under insert-only deltas:

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    — the classic incremental-view-maintenance algebra (counting
    algorithm, insert case). Appending ΔV to the stored V_old yields
    exactly A_new ⋈ B_new (certified by ``q_ivm_join`` against a full
    recompute). At 100 TB the wins compound: the two big terms join a
    DELTA against a standing side (broadcast when the delta is small),
    the stored view is never rescanned, and with both standing tables
    bucketed on the join key all three terms are shuffle-free."""
    d_av = delta_a.join(b_old, list(on))
    a_dv = a_old.join(delta_b, list(on))
    dd = delta_a.join(delta_b, list(on))
    return d_av.unionByName(a_dv).unionByName(dd)


def delta_join_view_signed(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
    mult_col: str = "__mult",
) -> DataFrame:
    """ΔV for V = A ⋈ B under GENERAL deltas (inserts AND deletes) —
    the full counting algorithm (Gupta-Mumick): deltas carry a signed
    multiplicity column (+1 insert, −1 delete), and

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    with output multiplicity the PRODUCT of the inputs' (standing rows
    carry +1). Summing multiplicities per joined row and dropping
    zeros yields exactly A_new ⋈ B_new — deletions retract the join
    rows they contributed, re-inserts cancel retractions, no rescan of
    the standing view. Same three delta-vs-standing joins as the
    insert-only form, so the 100 TB posture is unchanged (broadcast
    deltas, bucketed standing sides → shuffle-free).

    ``apply_signed_delta`` collapses (V_old ∪ ΔV) to the new view."""
    a1 = a_old.withColumn(mult_col, F.lit(1))
    b1 = b_old.withColumn(mult_col, F.lit(1))
    da = delta_a.withColumnRenamed(mult_col, "__ma")
    db = delta_b.withColumnRenamed(mult_col, "__mb")

    def _prod(df: DataFrame, ma: str, mb: str) -> DataFrame:
        return df.withColumn(mult_col, F.col(ma) * F.col(mb)).drop(ma, mb)

    d_av = _prod(da.join(b1.withColumnRenamed(mult_col, "__mb"), list(on)), "__ma", "__mb")
    a_dv = _prod(a1.withColumnRenamed(mult_col, "__ma").join(db, list(on)), "__ma", "__mb")
    dd = _prod(da.join(db, list(on)), "__ma", "__mb")
    return d_av.unionByName(a_dv).unionByName(dd)


def apply_signed_delta(
    v_old: DataFrame, delta_v: DataFrame, mult_col: str = "__mult"
) -> DataFrame:
    """(V_old ⊎ ΔV) under bag semantics: sum signed multiplicities over
    ALL columns, keep rows with positive net count, and re-expand the
    multiplicity so the result is a plain bag relation identical to a
    full recompute. One keyed agg + a bounded per-row explode."""
    cols = [c for c in v_old.columns if c != mult_col]
    v1 = v_old.withColumn(mult_col, F.lit(1)) if mult_col not in v_old.columns else v_old
    merged = (
        v1.unionByName(delta_v)
        .groupBy(*cols)
        .agg(F.sum(mult_col).alias("__net"))
        .filter(F.col("__net") > 0)
    )
    return merged.withColumn(
        "__i", F.explode(F.sequence(F.lit(1), F.col("__net")))
    ).select(*cols)
