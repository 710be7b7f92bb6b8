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
