from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def registry():
    return entrymod.queries(), entrymod.oracle_sql()


def test_every_query_has_oracle_or_is_declared(registry):
    queries, oracles = registry
    assert set(oracles) <= set(queries)


def test_all_queries_run_nonempty(spark, sf_dir, registry):
    queries, _ = registry
    for name, fn in queries.items():
        df = fn(spark, sf_dir)
        assert df.count() > 0, f"{name} returned no rows at {sf_dir}"


def test_argmax_latest_per_key(spark, sf_dir, registry):
    queries, _ = registry
    df = queries["q_argmax"](spark, sf_dir)
    # one row per user, and users are unique
    rows = df.collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))


def test_filter_valid_rejects_fabricated_bad_names(spark, sf_dir, registry):
    queries, _ = registry
    rows = queries["q_filter_valid"](spark, sf_dir).collect()
    for r in rows:
        assert not r.svc_name.startswith("arn:")
        assert "/" not in r.svc_name
