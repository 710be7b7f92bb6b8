"""Market-basket co-occurrence mining: association rules over
(user, item) baskets — support / confidence / lift for item pairs.

No reference counterpart (BASELINE.json north star): the classic
recommendation/affinity shape a warehouse engine is expected to cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    min_pair_users: int = 5,
    max_basket: int = 1000,
    round_dp: int = 4,
) -> DataFrame:
    """Association rules for unordered item pairs:
    ``(item_a < item_b, n_ab, n_a, n_b, support, confidence, lift)``
    where n_* count DISTINCT users, support = n_ab/N,
    confidence = n_ab/n_a (a→b), lift = n_ab·N/(n_a·n_b).

    Scale posture: the pair generation is a self-join ON THE USER KEY
    — both sides sit on the same hashpartitioning(user) exchange, so
    cost is Σ_u |basket_u|², bounded by ``max_basket`` (mega-baskets —
    bots, shared accounts — are dropped entirely, the standard
    co-occurrence mining guard; dropped baskets also leave N and the
    per-item counts so every measure stays consistent). Item totals
    are an item-keyed aggregate joined back by broadcast (the item
    dimension is vocabulary-sized). N resolves to one bounded 1-row
    action (anchor-literal pattern). Ratio arithmetic is a fixed IEEE
    sequence rounded at ``round_dp``.
    """
    items = baskets.select(user_col, item_col).distinct()
    sized = items.withColumn(
        "bsz", F.count("*").over(Window.partitionBy(user_col))
    )
    kept = sized.filter(F.col("bsz") <= max_basket).drop("bsz")
    n_users = kept.select(user_col).distinct().count()
    item_counts = kept.groupBy(item_col).agg(F.count("*").alias("n_i"))
    a = kept.select(F.col(user_col).alias("u"), F.col(item_col).alias("item_a"))
    b = kept.select(F.col(user_col).alias("u"), F.col(item_col).alias("item_b"))
    pairs = (
        a.join(b, "u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_users)
    )
    ca = F.broadcast(item_counts.select(F.col(item_col).alias("item_a"), F.col("n_i").alias("n_a")))
    cb = F.broadcast(item_counts.select(F.col(item_col).alias("item_b"), F.col("n_i").alias("n_b")))
    n_lit = F.lit(n_users)
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / n_lit, round_dp).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), round_dp).alias("confidence"),
            F.round(F.col("n_ab") * n_lit / (F.col("n_a") * F.col("n_b")), round_dp).alias("lift"),
        )
    )
