"""Mergeable frequency sketches for corpus-scale term statistics.

Two-phase heavy hitters: per-partition Misra-Gries summaries nominate
a candidate superset, then ONE exact counting pass restricted to the
candidates certifies the output — the standard way to find frequent
items over 100 TB without shuffling the full (term, count) space.

No reference counterpart (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], text_col: str, k: int
) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per Spark PARTITION (state carried
    across the partition's Arrow batches): at most ``k`` counters;
    every item with partition-local frequency > n_p/k survives."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for text in pdf[text_col]:
            if text is None:
                continue
            for w in text.lower().split(" "):
                if not w:
                    continue
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
    yield pd.DataFrame({"word": sorted(counters)})


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    phi: float = 0.02,
) -> DataFrame:
    """Exact frequent terms: every word whose corpus-wide frequency
    exceeds ``phi`` of all tokens, with its exact count.

    Phase 1 (sketch): each partition runs Misra-Gries with
    ``k = ceil(1/phi)`` counters over its own tokens — O(k) memory,
    zero shuffle. Pigeonhole guarantees the union of per-partition
    survivors is a SUPERSET of the true heavy hitters: if a word
    stayed ≤ n_p/k in every partition its global count is ≤ N/k ≤ φN.
    Phase 2 (verify): one token pass counts ONLY the candidate terms
    (broadcast hash semi-join on the candidate set), so the keyed
    shuffle carries ≤ partitions·k distinct terms instead of the full
    vocabulary — at 100 TB that is the difference between shuffling a
    bounded candidate list and shuffling every distinct token. The
    total-token denominator N resolves to one bounded 1-row action
    (anchor-literal pattern) and the output is EXACT (sketch error
    never reaches the result — it only prunes the candidate space).
    """
    import math

    k = max(1, math.ceil(1.0 / phi))
    spark = docs.sparkSession
    candidates = docs.select(text_col).mapInPandas(
        lambda it: _misra_gries_partition(it, text_col, k), "word string"
    ).distinct()

    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word") != "")
    n_tokens = words.count()
    counted = (
        words.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    return (
        counted.filter(F.col("n") > F.lit(float(n_tokens)) * F.lit(phi))
        .select(
            "word",
            "n",
            F.round(F.col("n") / F.lit(float(n_tokens)), 6).alias("freq"),
        )
    )


def _group_mg_partition(
    batches: Iterator[pd.DataFrame], group_col: str, text_col: str, k: int
) -> Iterator[pd.DataFrame]:
    """Per-(partition, group) Misra-Gries summaries — one k-counter
    sketch per group value seen in the partition (the group domain is
    dimension-sized, so partition memory is O(groups · k))."""
    sketches: dict[str, dict[str, int]] = {}
    for pdf in batches:
        for g, text in zip(pdf[group_col], pdf[text_col]):
            if text is None or g is None:
                continue
            counters = sketches.setdefault(g, {})
            for w in text.lower().split(" "):
                if not w:
                    continue
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
    groups, words = [], []
    for g in sorted(sketches):
        for w in sorted(sketches[g]):
            groups.append(g)
            words.append(w)
    yield pd.DataFrame({group_col: groups, "word": words})


def group_heavy_hitters(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    phi: float = 0.02,
) -> DataFrame:
    """Exact per-group frequent terms: every (group, word) whose
    frequency exceeds ``phi`` of the GROUP's tokens, with exact counts.

    Same two-phase shape as ``heavy_hitters``, pigeonholed per group:
    if a word stayed ≤ n_p(g)/k in every partition's group-g sketch,
    its group-global count is ≤ N_g/k ≤ φ·N_g — so the per-(partition,
    group) survivor union is a candidate superset per group. The exact
    pass counts only candidate (group, word) keys (broadcast semi-join)
    and the per-group token totals come from one dimension-sized
    aggregate joined back by broadcast — the keyed shuffle carries
    ≤ partitions·groups·k candidate keys, never groups × vocabulary.
    """
    import math

    k = max(1, math.ceil(1.0 / phi))
    candidates = (
        docs.select(group_col, text_col)
        .mapInPandas(
            lambda it: _group_mg_partition(it, group_col, text_col, k),
            f"{group_col} string, word string",
        )
        .distinct()
    )
    words = docs.select(
        group_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    totals = words.groupBy(group_col).agg(F.count("*").alias("n_g"))
    counted = (
        words.join(F.broadcast(candidates), [group_col, "word"], "left_semi")
        .groupBy(group_col, "word")
        .agg(F.count("*").alias("n"))
    )
    return (
        counted.join(F.broadcast(totals), group_col)
        .filter(F.col("n") > F.col("n_g") * F.lit(phi))
        .select(
            group_col,
            "word",
            "n",
            F.round(F.col("n") / F.col("n_g"), 6).alias("freq"),
        )
    )
