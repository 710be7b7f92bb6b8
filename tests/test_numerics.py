"""Property tests for the engine-portable numeric identities.

``dec_avg`` claims: for positive 2-dp inputs, the emitted mean equals
the true rational mean rounded HALF-UP to 4 decimals, computed without
any float rounding step. The model is exact ``fractions.Fraction``
arithmetic — hypothesis drives random value sets against it.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_neptune_spark.functions import dec_avg

# 2-dp fixed-point values in the fixture's value domain
cents = st.integers(min_value=0, max_value=100_000)


@settings(
    deadline=None,
    max_examples=20,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(cents, min_size=1, max_size=40))
def test_dec_avg_matches_exact_half_up_rational(spark, xs):
    df = spark.createDataFrame(
        [(float(c) / 100.0,) for c in xs], "value double"
    )
    got = df.agg(dec_avg("value").alias("m")).first()["m"]

    # exact half-up at 4 dp: floor(mean*10^4 + 1/2), then the same
    # integer-over-10^4 double the engine emits
    mean = Fraction(sum(xs), 100 * len(xs))
    q = (mean * 10_000 * 2 + 1) // 2
    want = float(q) / 10_000.0
    assert got == want, (xs, got, want)
