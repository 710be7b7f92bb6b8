"""Similarity search over embedding columns (array<float>).

No reference counterpart (BASELINE.json north star). Two paths:

- **Brute-force cosine top-k** — exact baseline: crossJoin + window
  top-k. Quadratic; correct at any scale where the query set is small
  (the common "score this batch against the corpus" case: broadcast the
  queries, scan the corpus once).
- **Sign-LSH bucketed ANN** — the scale path: bucket every vector by
  the sign pattern of its leading components (a fixed random-hyperplane
  sketch), then search only within the bucket. Candidate generation is
  an equi-join on the bucket key; recall/latency trades with the bit
  width exactly like an IVF coarse quantizer.

All arithmetic is built-in JVM-side expressions; vectors are cast to
double before accumulation so the fold is deterministic and
oracle-comparable. When the dimensionality is known (it always is for
an embedding column) the dot product is UNROLLED into a flat
``a[0]*b[0] + a[1]*b[1] + …`` expression: higher-order functions like
``aggregate``/``zip_with`` execute interpreted per row, while the
unrolled sum stays inside whole-stage codegen — same left-to-right
fold order, ~20× faster. Norms are computed once per vector *before*
any pairwise join, not once per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ as a deterministic left fold in doubles.

    With ``dim`` the fold is unrolled for codegen; without it a HOF
    fold handles unknown-width arrays. Both add terms left-to-right,
    so the IEEE result is identical."""
    if dim is not None:
        terms = [a[i].cast("double") * b[i].cast("double") for i in range(dim)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.4,
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (id_a < id_b, rounded 4 dp).
    Exact/quadratic — the LSH path bounds the candidate set at scale.

    Norms are attached per vector before the pairwise join (each norm
    computed once, not once per pair), and the streamed side is spread
    to full parallelism — a broadcast nested-loop join otherwise
    inherits the scan's partitioning (1 for a small local file)."""
    from .dedup import _spread

    e = emb.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col), dim).alias("nrm")
    )
    a = _spread(e).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")), 4),
        )
        .filter(F.col("cos") >= min_cosine)
        .select("id_a", "id_b", "cos")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector (self excluded).

    Scale shape: broadcast the (small) query set, scan the corpus once,
    per-query top-k via ranking window on the scored pairs.
    """
    from pyspark.sql import Window

    from .dedup import _spread

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv"), dim), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def sign_bucket(vec: Column, bits: int = 12) -> Column:
    """Random-hyperplane sketch: the sign pattern of the first ``bits``
    components as a bit string (axis-aligned hyperplanes — a fixed,
    engine-independent projection family)."""
    return F.array_join(
        F.transform(
            F.slice(vec, 1, bits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


def lsh_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the sign-LSH bucket, ranked
    by exact cosine within the bucket. Candidate generation is an
    equi-join on the bucket key — linear shuffle, no crossJoin."""
    from pyspark.sql import Window

    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("bucket")
    )
    a = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    b = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv"), dim), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
