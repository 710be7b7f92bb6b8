"""Connected components over a pair/edge frame — duplicate-cluster
resolution for dedup pipelines.

Near-duplicate detection (MinHash LSH, n-gram Jaccard, embedding
cosine) emits PAIRS; keeping one survivor per duplicate GROUP requires
the transitive closure of those pairs — i.e. connected components.
This is the canonical follow-on stage of a 100 TB dedup pass (the
pair graph is tiny relative to the corpus: only near-dup docs appear).

Implementation: alternating **large-star / small-star** rounds (the
MapReduce connected-components algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) rather than plain
min-label propagation. Propagation needs O(diameter) rounds — fine for
shallow dup clusters, pathological on chain-shaped graphs; star
contraction REWIRES the graph each round (large-star hangs every
larger neighbor off the local minimum, small-star contracts the rest),
which provably converges in O(log d) alternations on any graph. Each
half-round is one keyed aggregate + one equi-join on the vertex — the
same shuffle shape as propagation, just fewer rounds. The driver holds
only the loop counter and a per-round fixpoint digest (one bounded
action per round), no graph data.

No SQL oracle can express the fixpoint directly, but DuckDB's
recursive CTE computes the same closure exactly, which is how
``q_dup_clusters`` is value-certified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: for every vertex u, connect each STRICTLY LARGER
    neighbor v to m = min(N(u) ∪ {u}). Keeps every component connected
    (each emitted edge stays within the component) while hanging deep
    branches directly off local minima."""
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        # m ≤ a < b, so (b, m) is never a self loop.
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient every edge (larger → smaller); for every
    vertex u, connect u and all its (smaller) neighbors to
    m = min(N(u) ∪ {u}) = min(N(u)). Contracts the shallow fringe that
    large-star leaves behind."""
    d = (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = d.groupBy("a").agg(F.min("b").alias("m"))
    nbr_edges = d.join(mins, "a").select(F.col("b").alias("a"), F.col("m").alias("b"))
    self_edges = mins.select(F.col("a"), F.col("m").alias("b"))
    return (
        nbr_edges.unionByName(self_edges)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(vertex, component) for every vertex incident to an edge, where
    ``component`` is the minimum vertex id in its connected component.

    Alternates large-star/small-star until the edge set is a star
    forest (fixpoint — detected by an order-insensitive edge-set
    digest, one tiny action per round); raises if ``max_iter`` rounds
    do not converge. O(log d) rounds on any graph shape, including the
    chain graphs that defeat plain propagation.
    """
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .unionByName(edges.select(F.col(dst).alias("vertex")))
        .distinct()
        .persist()
    )
    # Each star round references `e` several times (symmetrize + two
    # joins), so lineage grows GEOMETRICALLY round over round — without
    # truncation the analyzer itself OOMs after ~10 rounds. Eager
    # localCheckpoint cuts the plan at every round boundary (the
    # standard iterative-graph recipe; a production cluster would use a
    # reliable checkpoint dir to also survive executor loss).
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def digest(df: DataFrame):
        # Order-insensitive fixpoint fingerprint: (n, XOR xxhash64(a,b))
        # — xor never overflows (sum of longs would trip ANSI mode) and
        # is exact on a distinct edge set. At the star-forest fixpoint
        # both halves leave the set invariant; a collision faking
        # convergence early would need 2^-64-scale luck AND equal count.
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = digest(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = digest(e)
        if cur == prev:
            break
        prev = cur
    else:
        verts.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # Star forest: every non-root has exactly one edge (v → root); the
    # root itself has none → component = self. `verts` and `e` stay
    # cached — they back this lazy result.
    return verts.join(
        e.select(F.col("a").alias("vertex"), F.col("b").alias("component")),
        "vertex",
        "left",
    ).select(
        "vertex", F.coalesce("component", F.col("vertex")).alias("component")
    )
