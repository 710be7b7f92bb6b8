"""Property-based tests (hypothesis) for MERGE semantics — SURVEY §5.3.

These target the three behaviors the reference got wrong in production
(fix_neptune_data.py:32-68, neptune_etl_aws.py:225-227, 332):

1. None-preserving updates — an incoming NULL never clobbers a value.
2. create-only columns are immutable once set, under ANY merge sequence.
3. merge is idempotent — re-applying the same batch is a no-op.

The model is a 10-line Python dict merge; hypothesis drives random
keyed row sets (with duplicate keys and NULLs) through ``merge_keyed``
and checks exact agreement.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_neptune_spark.operators.merge import merge_keyed

SCHEMA = "k long, upd long, created long"

row = st.tuples(
    st.integers(0, 4),
    st.one_of(st.none(), st.integers(0, 99)),
    st.one_of(st.none(), st.integers(0, 99)),
)
rows = st.lists(row, max_size=6)


def _dedupe(rs):
    """merge_keyed assumes keyed inputs: last occurrence of a key wins
    (mirrors the reference's nodes_set last-wins dedup)."""
    out = {}
    for k, u, c in rs:
        out[k] = (u, c)
    return out


def _model_merge(ex: dict, inc: dict) -> dict:
    out = {}
    for k in set(ex) | set(inc):
        if k in ex and k in inc:
            u = inc[k][0] if inc[k][0] is not None else ex[k][0]
            c = ex[k][1] if ex[k][1] is not None else inc[k][1]
            out[k] = (u, c)
        else:
            out[k] = ex.get(k, inc.get(k))
    return out


def _run_merge(spark, ex: dict, inc: dict):
    ex_df = spark.createDataFrame([(k, u, c) for k, (u, c) in ex.items()], SCHEMA)
    inc_df = spark.createDataFrame([(k, u, c) for k, (u, c) in inc.items()], SCHEMA)
    out = merge_keyed(
        ex_df, inc_df, keys=["k"], update_cols=["upd"], create_only_cols=["created"]
    )
    return {r.k: (r.upd, r.created) for r in out.collect()}


@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@given(existing=rows, incoming=rows)
def test_merge_matches_model(spark, existing, incoming):
    ex, inc = _dedupe(existing), _dedupe(incoming)
    assert _run_merge(spark, ex, inc) == _model_merge(ex, inc)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@given(existing=rows, incoming=rows)
def test_merge_idempotent_and_create_only_stable(spark, existing, incoming):
    ex, inc = _dedupe(existing), _dedupe(incoming)
    once = _model_merge(ex, inc)
    # re-applying the same incoming batch changes nothing (idempotence)
    assert _run_merge(spark, once, inc) == _model_merge(once, inc) == {
        **once,
        **{
            k: (
                inc[k][0] if inc[k][0] is not None else once[k][0],
                once[k][1] if once[k][1] is not None else inc[k][1],
            )
            for k in inc
        },
    }
    # create-only: once non-null, never changed by any later batch
    for k, (_, c) in once.items():
        if c is not None and k in inc:
            assert _model_merge(once, inc)[k][1] == c
