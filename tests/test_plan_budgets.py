"""Runtime exchange/shuffle budgets (VERDICT r5 task 3).

The r5 prefix-rank pid-divergence bug was a RE-EXECUTED exchange:
identical plan shape, but the range shuffle ran twice with divergent
partition ids — invisible to the shape audit, caught only at sf1. An
executed-exchange count catches that class at sf0.01: losing exchange
reuse (or accidentally adding a shuffle) changes the count.

Each entry pins (shuffle_exchanges, broadcast_exchanges,
reused_exchanges) from the EXECUTED adaptive plan at sf0.01 for a
representative query: the flagship agg, top-k (zero shuffles —
TakeOrderedAndProject), the join classes, the MERGE, the minhash
LSH pipeline, the six two-phase rank rewrites (post-checkpoint
consumers), and the composed LLM pipeline (which must KEEP its 2
reused exchanges). On an intentional plan change, update the budget
here with one doc line saying why.

Budget history:
- r6: initial budgets recorded (tools/plan_metrics.py introduced).
"""

from __future__ import annotations

import pytest

SF_01 = "/root/testdata/sf0.01"

# (shuffle_exchanges, broadcast_exchanges, reused_exchanges)
BUDGETS = {
    "q_flow_edges": (1, 0, 0),      # one agg shuffle, top-k local
    "q_topk": (0, 0, 0),            # TakeOrderedAndProject — no exchange
    "q_sum": (1, 0, 0),
    "q_join_equi": (1, 1, 0),       # agg shuffle + broadcast dim
    "q_join_ip": (1, 1, 1),         # ip map broadcast REUSED for src+dst
    "q_degrees": (4, 0, 0),         # out/in/label-filtered degree aggs
    "q_upsert_nodes": (2, 0, 0),    # SMJ full-outer MERGE (both sides)
    "q_gc_anti": (1, 1, 0),         # broadcast anti-join + final agg
    "q_dedup_minhash": (2, 3, 0),   # banded LSH: band agg + verify join
    "q_llm_pipeline": (4, 4, 2),    # composed stages SHARE 2 exchanges
    # two-phase rank rewrites — post-checkpoint consumers only (the
    # pre-checkpoint range exchange is pinned by test_plans.py's
    # capture hook); the offset-table windows are metadata-scale
    "q_gini": (4, 1, 0),
    "q_rfm": (3, 1, 0),
    "q_auc": (4, 1, 0),
    "q_lorenz": (5, 1, 0),
    "q_gains": (5, 1, 0),
    "q_ks_test": (4, 1, 0),
}


@pytest.fixture(scope="module")
def measured(spark):
    import __spark_entry__ as e
    from tools.plan_metrics import collect_exec_metrics

    queries = e.queries()
    out = {}
    for name in BUDGETS:
        df = queries[name](spark, SF_01)
        out[name] = collect_exec_metrics(spark, df)
    return out


def test_exchange_counts_match_budget(measured):
    drift = {}
    for name, (sh, bc, re_) in BUDGETS.items():
        m = measured[name]
        got = (
            m["shuffle_exchanges"],
            m["broadcast_exchanges"],
            m["reused_exchanges"],
        )
        if got != (sh, bc, re_):
            drift[name] = {"expected": (sh, bc, re_), "got": got}
    assert not drift, (
        "exchange budget drift (intentional? update BUDGETS with a doc "
        f"line): {drift}"
    )


def test_shuffles_moved_real_bytes(measured):
    # a query with N>0 executed shuffles must report nonzero shuffle
    # bytes — zero bytes would mean the metric wiring regressed and the
    # budget test is no longer observing real executions
    for name, m in measured.items():
        if m["shuffle_exchanges"] > 0:
            assert m["shuffle_bytes"] > 0, name
