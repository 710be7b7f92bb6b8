"""Connected components over a pair/edge frame — duplicate-cluster
resolution for dedup pipelines.

Near-duplicate detection (MinHash LSH, n-gram Jaccard, embedding
cosine) emits PAIRS; keeping one survivor per duplicate GROUP requires
the transitive closure of those pairs — i.e. connected components.
This is the canonical follow-on stage of a 100 TB dedup pass (the
pair graph is tiny relative to the corpus: only near-dup docs appear).

Implementation: iterative min-label propagation (the HashToMin /
"small-star" family): every vertex starts labeled with itself; each
round every vertex takes the min of its own and its neighbors' labels;
stop when a round changes nothing. Each round is ONE keyed shuffle
(join + groupBy on the vertex), and the round count is the graph
diameter — for duplicate clusters typically 2-3. The driver holds only
the loop counter and a per-round change count (one bounded action), no
graph data. No SQL oracle can express the fixpoint directly, but
DuckDB's recursive CTE computes the same closure exactly, which is how
``q_dup_clusters`` is value-certified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(vertex, component) for every vertex incident to an edge, where
    ``component`` is the minimum vertex id in its connected component.

    Converges in at most ``diameter`` rounds; raises if ``max_iter``
    rounds do not reach the fixpoint (pathological chain graphs —
    raise ``max_iter`` or pre-contract).
    """
    # Persist the symmetrized edge list: every round joins against it
    # (and edges may carry an expensive lineage, e.g. a similarity
    # join); without materialization each round would recompute that
    # lineage from scratch.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # Pre-partition on the per-round join key: the cached frame's
        # hashpartitioning(b) is reused every iteration, so only the
        # (much smaller) label frame shuffles per round.
        .repartition(F.col("b"))
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
        .persist()
    )
    labels.count()  # materialize seed + edge cache before iterating
    cached = labels  # the persisted frame backing `labels`
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr"))
        )
        # Keep the old label alongside the new one: the convergence
        # check is then a filter-count on this same frame, not a
        # second labels join.
        stepped = (
            labels.join(nbr_min, labels["v"] == nbr_min["a"], "left")
            .select(
                F.col("v"),
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = stepped.filter(
            F.col("component") != F.col("old_component")
        ).count()
        cached.unpersist()
        cached = stepped
        labels = stepped.select("v", "component")
        if changed == 0:
            return labels.select(F.col("v").alias("vertex"), "component")
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
