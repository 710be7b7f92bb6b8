"""Similarity search over embedding columns (array<float>).

No reference counterpart (BASELINE.json north star). Four operators:

- **cosine_neardup_pairs** — exact all-pairs cosine ≥ τ via a BLOCKED
  matrix product: rows are hashed into B blocks, every unordered block
  pair becomes one ``applyInPandas`` group, and each group scores its
  pair of sub-matrices with one numpy matmul. Replication factor is B
  per row (the classical blocked all-pairs layout); at 100 TB pick B
  so a block fits executor memory, and the shuffle stays linear in
  B × corpus instead of quadratic.
- **brute_force_topk** — exact top-k for a (small) query set: corpus
  blocks cogrouped with the broadcast-replicated query set, numpy
  scores per block, then a global ranking window over the B × k
  survivors per query (block-local top-k is a superset of the global
  top-k, so the result is exact).
- **lsh_topk** — ANN scale path #1: seeded random-hyperplane sign-LSH
  bucket as a hash-based coarse quantizer, numpy top-k inside each
  bucket.
- **ivf_topk** — ANN scale path #2: k-means coarse quantizer trained
  on a bounded driver-side sample (the FAISS recipe), distributed cell
  assignment, nprobe-cell exact re-ranking.

Why numpy and not SQL expressions: a 64-term unrolled dot product in a
join condition or filter lands in one generated-code method past
HotSpot's JIT size threshold — measured ~3 µs/pair, interpreted — and
higher-order functions (``aggregate``/``zip_with``) are interpreted by
construction. An Arrow-batched matmul does the same 2M-pair × 64-dim
workload in milliseconds and is how a production vector pipeline
shapes this job. SQL helpers (``dot``/``norm``/``cosine``) are kept
for expression-level uses.

Numerics: scores are computed in float64 and rounded half-even to 4 dp.
numpy's pairwise summation can differ from a sequential fold by ~1 ulp;
for a 4-dp rounded cosine the probability that this flips a rounded
value is ~1e-11 per pair — the DuckDB oracle agrees in practice.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ as a deterministic left fold in doubles.

    With ``dim`` (and operands given as column NAMES) the fold unrolls
    into one SQL string parsed JVM-side — a single py4j call, flat
    codegen, same left-associative order as the HOF fold. Keep results
    out of join conditions / filters: a >8 KB generated method won't
    JIT (see module docstring)."""
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        return F.expr(
            " + ".join(
                f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
                for i in range(dim)
            )
        )
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def _matrix(col: pd.Series) -> np.ndarray:
    """Stack a pandas Series of array<float> rows into (n, dim) float64."""
    return np.vstack(col.to_numpy()).astype(np.float64)


def _arrow_matrix(arr, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from an Arrow ``list<float>`` column with NO
    per-row Python objects (VERDICT r9 task 1): the list values buffer
    is viewed zero-copy with ``to_numpy`` and reshaped; the only copy
    is one bulk cast to ``dtype``. The pandas route materializes one
    ndarray object per row before ``np.vstack`` copies each — that
    per-row conversion is what bound the ANN certificates' sf100 walls
    at scan parallelism (>40 min at 2M vectors, SCALING.md)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("_arrow_matrix: null embedding row")
    vals = arr.flatten().to_numpy(zero_copy_only=True)
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
    else:
        offs = arr.offsets.to_numpy(zero_copy_only=True)
        widths = offs[1:] - offs[:-1]
        dim = int(widths[0]) if len(widths) else 0
        if not (widths == dim).all():
            raise ValueError("_arrow_matrix: ragged embedding column")
    m = vals.reshape(n, dim)
    return m.astype(dtype) if m.dtype != dtype else m


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _key_py(v):
    """Grouping-key element from applyInArrow → Python native (the key
    arrives as pyarrow scalars; applyInPandas passed natives)."""
    return v.as_py() if hasattr(v, "as_py") else v


# Below this estimated input size the pre-kernel repartition is pure
# fixed cost: the kernel finishes faster than the shuffle's round-trip
# (measured r11 — a repartition(32) of ~2k vectors costs ~0.3 s per
# call and the ANN lifecycle certs call the assign kernel many times
# per run, while the kernel itself is <50 ms at that size). 16 MB of
# scan bytes ≈ several hundred thousand vectors — the size where the
# r10 A/B first showed the per-row win. Parameterised for clusters
# whose scan splits are already sized by the source layout.
_SPREAD_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MIN_BYTES", str(16 * 1024 * 1024))
)


def _spread(df: DataFrame) -> DataFrame:
    """Hash-repartition to full parallelism before a CPU-heavy Arrow
    kernel (assign/encode): a 2M-row embeddings parquet arrives as ~8
    file splits locally, serializing the per-row numpy work onto a
    fraction of the cores — and every cap-split round that re-reads the
    lineage pays it again. Gated on BOTH the current partition count
    and the optimizer's size estimate (VERDICT r10 task 3): a real
    cluster scan that already yields enough splits skips the extra
    shuffle, and a tiny input (where the kernel is cheaper than the
    shuffle it would buy) skips it too — right insurance at scale,
    dead weight at certificate scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — estimate unavailable: keep the insurance
        est = None
    if est is not None and est < _SPREAD_MIN_BYTES:
        return df
    return df.repartition(target)


def cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.4,
    dim: int | None = None,
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (id_a < id_b, rounded 4 dp).

    Exact. Blocked all-pairs: each row is replicated to the ``n_blocks``
    unordered block pairs it participates in; one numpy matmul scores
    each group. ``dim`` is unused here (numpy infers it) but kept for
    signature parity with the SQL helpers."""
    nb = n_blocks
    keyed = (
        emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .withColumn("blk", F.pmod(F.hash(F.col("vid")), F.lit(nb)))
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))
        .withColumn("g1", F.least("blk", "other"))
        .withColumn("g2", F.greatest("blk", "other"))
        # keep one copy per unordered block pair (blk==other appears once)
        .filter((F.col("blk") != F.col("other")) | (F.col("other") == F.col("g2")))
    )

    import pyarrow as parrow

    empty = parrow.table(
        {
            "id_a": parrow.array([], parrow.int64()),
            "id_b": parrow.array([], parrow.int64()),
            "cos": parrow.array([], parrow.float64()),
        }
    )

    def score(key, t):
        # applyInArrow (r10): zero-copy vector ingest; same rounded
        # float64 scores and the same unordered-pair semantics (the
        # raw matrix is sliced BEFORE the single _unit pass, exactly
        # as the pandas form normalized each slice).
        g1, g2 = (_key_py(key[0]), _key_py(key[1]))
        ids = t.column("vid").to_numpy()
        m = _arrow_matrix(t.column("vec"))
        if g1 == g2:
            u = _unit(m)
            c = np.round(u @ u.T, 4)
            ii, jj = np.where(np.triu(c >= min_cosine, k=1))
            a_ids, b_ids = ids[ii], ids[jj]
        else:
            blk = t.column("blk").to_numpy()
            ma, mb = blk == g1, blk == g2
            if not ma.any() or not mb.any():
                return empty
            ia, ib = ids[ma], ids[mb]
            c = np.round(_unit(m[ma]) @ _unit(m[mb]).T, 4)
            ii, jj = np.where(c >= min_cosine)
            a_ids, b_ids = ia[ii], ib[jj]
        cos = c[ii, jj]
        lo = np.minimum(a_ids, b_ids).astype(np.int64)
        hi = np.maximum(a_ids, b_ids).astype(np.int64)
        return parrow.table(
            {
                "id_a": parrow.array(lo),
                "id_b": parrow.array(hi),
                "cos": parrow.array(cos),
            }
        )

    return keyed.groupBy("g1", "g2").applyInArrow(
        score, schema="id_a long, id_b long, cos double"
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    min_cosine: float = 0.4,
    n_blocks: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): pairwise cosine is scored ONLY within a coarse
    cluster, never across the corpus — here the cluster is the
    ``cluster_col`` column (in production, the IVF/k-means assignment
    from ``ivf_topk``'s trainer). Verdict is the deterministic
    keep-first rule: a vector is dropped iff some smaller-id vector in
    the same cluster has cosine ≥ ``min_cosine`` (after the same 4 dp
    round the other cosine operators certify at).

    Returns (id, cluster, keep) for every input row.

    Scale: cost is Σ_c |c|²/blocks — the cluster count grows with the
    corpus so |c| stays bounded; each (cluster, block-pair) group is one
    Arrow-batched numpy matmul, and the verdict needs one distinct on
    the (small) dropped-id set plus one hash anti-join back. No
    corpus×corpus stage exists.
    """
    nb = n_blocks
    keyed = (
        emb.select(
            F.col(cluster_col).alias("grp"),
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
        )
        .withColumn("blk", F.pmod(F.hash(F.col("vid")), F.lit(nb)))
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))
        .withColumn("g1", F.least("blk", "other"))
        .withColumn("g2", F.greatest("blk", "other"))
        .filter((F.col("blk") != F.col("other")) | (F.col("other") == F.col("g2")))
    )

    import pyarrow as parrow

    _empty_vid = parrow.table({"vid": parrow.array([], parrow.int64())})

    def dropped(key, t):
        # applyInArrow (r10): zero-copy vector ingest, same rounded
        # float64 scores, same keep-first verdict.
        g1, g2 = _key_py(key[1]), _key_py(key[2])
        ids = t.column("vid").to_numpy()
        m = _arrow_matrix(t.column("vec"))
        if g1 == g2:
            u = _unit(m)
            c = np.round(u @ u.T, 4)
            ii, jj = np.where(np.triu(c >= min_cosine, k=1))
            a_ids, b_ids = ids[ii], ids[jj]
        else:
            blk = t.column("blk").to_numpy()
            ma, mb = blk == g1, blk == g2
            if not ma.any() or not mb.any():
                return _empty_vid
            ia, ib = ids[ma], ids[mb]
            c = np.round(_unit(m[ma]) @ _unit(m[mb]).T, 4)
            ii, jj = np.where(c >= min_cosine)
            a_ids, b_ids = ia[ii], ib[jj]
        # id_a < id_b and the LARGER id is the one dropped (keep-first).
        return parrow.table(
            {"vid": parrow.array(np.maximum(a_ids, b_ids).astype(np.int64))}
        )

    drops = (
        keyed.groupBy("grp", "g1", "g2")
        .applyInArrow(dropped, schema="vid long")
        .dropDuplicates(["vid"])
    )
    return (
        emb.select(id_col, cluster_col)
        .join(drops, emb[id_col] == drops["vid"], "left")
        .select(
            id_col,
            cluster_col,
            F.col("vid").isNull().alias("keep"),
        )
    )


def _masked_topk_kernel(k: int, with_label: bool):
    """Arrow-batch scorer shared by ``brute_force_topk`` and
    ``lsh_hard_negatives``: one numpy matmul scores a query block
    against a candidate block, self-pairs are masked, same-label pairs
    are masked when ``with_label`` (SQL three-valued ``!=`` semantics:
    a NULL on EITHER side drops the pair), and each query keeps its
    block-local top-k by (cos desc, neighbor_id asc) on the rounded
    score — a superset of the global top-k, so the ranking window
    above it is exact."""

    import pyarrow as pa

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def score(key, qt, ct):
        # applyInArrow (r10, VERDICT r9 task 1): zero-copy vector
        # ingest + numpy-slice output assembly — same rounded float64
        # scores, same masks, same (cos desc, id asc) lexsort.
        if qt.num_rows == 0 or ct.num_rows == 0:
            return empty
        qi, ci = qt.column("vid").to_numpy(), ct.column("vid").to_numpy()
        c = np.round(
            _unit(_arrow_matrix(qt.column("vec")))
            @ _unit(_arrow_matrix(ct.column("vec"))).T,
            4,
        )
        c[qi[:, None] == ci[None, :]] = -np.inf  # exclude self
        if with_label:
            qlc, clc = qt.column("lbl"), ct.column("lbl")
            ql = qlc.to_numpy(zero_copy_only=False)
            cl = clc.to_numpy(zero_copy_only=False)
            c[ql[:, None] == cl[None, :]] = -np.inf  # exclude same class
            # SQL three-valued "q.label != c.label" also drops any pair
            # where EITHER label is NULL — match that, not numpy equality
            # (which only excludes both-NULL pairs).
            qn = qlc.is_null().to_numpy(zero_copy_only=False)
            cn = clc.is_null().to_numpy(zero_copy_only=False)
            c[qn[:, None] | cn[None, :]] = -np.inf
        kk = min(k, c.shape[1])
        out_q, out_n, out_c = [], [], []
        for r in range(c.shape[0]):
            # top-k by (cos desc, neighbor_id asc) on the ROUNDED score
            order = np.lexsort((ci, -c[r]))[:kk]
            sel = order[np.isfinite(c[r, order])]
            if len(sel):
                out_q.append(np.full(len(sel), qi[r], dtype=np.int64))
                out_n.append(ci[sel].astype(np.int64))
                out_c.append(c[r, sel])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )

    return score


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
    n_blocks: int = 8,
    exclude_label_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector (self excluded).

    The query set is replicated to every corpus block (it is small —
    that IS the brute-force contract), each cogroup scores one corpus
    block against all queries in one matmul and keeps its local top-k,
    and a global ranking window over the ≤ B·k survivors per query
    yields the exact answer.

    With ``exclude_label_col``, candidates sharing the query's label
    are masked out before ranking — HARD-NEGATIVE MINING for
    contrastive training (per anchor, the most similar vectors of a
    DIFFERENT class); the masking happens inside the same matmul
    kernel, so the cost is unchanged."""
    from pyspark.sql import Window

    nb = n_blocks
    lbl = [F.col(exclude_label_col).alias("lbl")] if exclude_label_col else []
    c_blocks = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(nb)).alias("blk"),
        *lbl,
    )
    q_rep = queries.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), *lbl
    ).withColumn("blk", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))

    score = _masked_topk_kernel(k, with_label=exclude_label_col is not None)

    candidates = (
        q_rep.groupBy("blk")
        .cogroup(c_blocks.groupBy("blk"))
        .applyInArrow(score, schema="query_id long, neighbor_id long, cos double")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def rademacher_signs(bits: int, dim: int, seed: int = 7) -> np.ndarray:
    """Seeded ±1 hyperplane matrix (bits × dim). Rademacher entries are
    a valid random-hyperplane family for cosine LSH (sign of a random
    ±combination of ALL dimensions) and — unlike Gaussian floats — cross
    engines as exact literals, so the DuckDB oracle reproduces buckets
    bit-for-bit."""
    rng = np.random.default_rng(seed)
    return rng.choice((1.0, -1.0), size=(bits, dim))


def sign_bucket_expr(
    vec_name: str, bits: int, dim: int, seed: int = 7, one_based: bool = False
) -> str:
    """SQL string for the random-hyperplane sign bucket of an
    array column.

    Each bit is ``sign(Σ_i ±vec[i])`` with seeded Rademacher signs —
    every dimension participates in every bit, so per-dimension sign
    correlation in real embedding corpora (which collapses an
    axis-aligned sketch into one mega-bucket → one quadratic group)
    spreads across 2^bits buckets. The emitted arithmetic is the same
    left-fold of doubles in Spark (0-based arrays) and DuckDB
    (``one_based=True``), so buckets match bit-identically across
    engines."""
    signs = rademacher_signs(bits, dim, seed)
    base = 1 if one_based else 0
    parts = []
    for b in range(bits):
        terms = "0.0" + "".join(
            f" {'+' if s > 0 else '-'} CAST({vec_name}[{i + base}] AS DOUBLE)"
            for i, s in enumerate(signs[b])
        )
        parts.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(parts) + ")"


def sign_bucket(vec_name: str, bits: int = 12, dim: int = 64, seed: int = 7) -> Column:
    """Random-hyperplane sketch of an embedding column as a bit string;
    see ``sign_bucket_expr`` for the projection family."""
    return F.expr(sign_bucket_expr(vec_name, bits, dim, seed))


# Widest sign family the adaptive sizing may pick. The seeded Rademacher
# stream fills row-major, so the b-bit family is the PREFIX of the
# 16-bit one — an engine computing only b hyperplanes and an oracle
# substring-ing the 16-bit string produce the identical bucket.
SIGN_BITS_MAX = 16


def adaptive_sign_bits(
    n_rows: int, target_bucket: int, lo: int = 1, hi: int = SIGN_BITS_MAX
) -> int:
    """Corpus-adaptive sign-LSH width: enough hyperplanes that the
    AVERAGE bucket holds ~``target_bucket`` rows. Bucket count doubles
    per bit, so within-bucket pair mass stays bounded as the corpus
    grows — a FIXED width is quadratic in disguise (the sf100 probe
    measured 76× on a 10× step for the 6-bit SemDeDup twin). The SQL
    twin ``adaptive_sign_bits_sql`` emits the same formula over
    ``count(*)``, so both engines derive the same width from the same
    table."""
    if n_rows <= 0:
        return lo
    return max(
        lo, min(hi, math.ceil(math.log2(max(1.0, n_rows / target_bucket))))
    )


def adaptive_sign_bits_sql(
    count_expr: str, target_bucket: int, lo: int = 1, hi: int = SIGN_BITS_MAX
) -> str:
    """DuckDB expression mirroring ``adaptive_sign_bits`` — pair with
    ``substring(<16-bit sign string>, 1, <this>)`` to reproduce the
    engine's adaptively-sized bucket in a static oracle query."""
    return (
        f"greatest({lo}, least({hi}, CAST(ceil(log2(greatest(1.0, "
        f"{count_expr} / {target_bucket}.0))) AS INT)))"
    )


def refined_sign_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    dim: int = 64,
    seed: int = 7,
    max_bucket_rows: int | None = 4096,
    split_bits: int = 4,
    max_split_rounds: int = 8,
) -> DataFrame:
    """``(vid, vec, bucket)`` with every bucket capped at
    ``max_bucket_rows``: buckets that exceed the cap are re-banded with
    ``split_bits`` extra hyperplanes (a fresh seed per round) until they
    fit or ``max_split_rounds`` is hit.

    This is what makes ``lsh_topk`` safe beyond test scale: a
    ``groupBy().applyInPandas`` group must fit one worker's memory, and
    a fixed ``bits`` family cannot guarantee that as the corpus grows
    (VERDICT r2 #6 — 4096 buckets over 100 TB is millions of rows per
    group). Each refinement round costs one bucket-count aggregate and
    one broadcast join against the (tiny, ≤ corpus/cap keys) oversized
    bucket list — the skew-salting recipe, but deterministic so batch
    and oracle agree. Exact-duplicate vectors can never be separated by
    hyperplanes; ``max_split_rounds`` bounds the loop and leaves such
    residual buckets to the scorer (documented approximation floor)."""
    if max_bucket_rows is not None:
        # A narrow parquet scan (a handful of large files, as local
        # fixtures and small clusters produce) would serialize every
        # per-round corpus pass below onto those few tasks. Widening is
        # one round-robin shuffle of just (id, vec) and fires only when
        # the scan is narrower than the session shuffle width — at
        # cluster scale the scan is already wide and this is a no-op.
        n_shuffle = int(
            emb.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        if emb.rdd.getNumPartitions() < n_shuffle:
            emb = emb.repartition(n_shuffle)
    bucketed = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        sign_bucket(vec_col, bits, dim, seed).alias("bucket"),
    )
    if max_bucket_rows is None:
        return bucketed
    # Materialize between rounds: each round's count would otherwise
    # re-evaluate the whole lineage — the bits·dim-term sign expression
    # over the full corpus plus every prior round's join — making R
    # rounds cost O(R²) corpus passes (the sf100 probe measured this:
    # 17.6× on a 10× step). localCheckpoint bounds each round to one
    # corpus pass; on a real cluster this is the iterative-refinement
    # checkpoint, same as the connected-components loop.
    bucketed = bucketed.localCheckpoint(eager=False)
    prev: tuple[int, int] | None = None  # (oversized rows, max bucket)
    for round_no in range(max_split_rounds):
        over_stats = (
            bucketed.groupBy("bucket")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_bucket_rows)
        )
        tot = over_stats.agg(
            F.count("*").alias("b"),
            F.coalesce(F.sum("__n"), F.lit(0)).alias("r"),
            F.coalesce(F.max("__n"), F.lit(0)).alias("mx"),
        ).collect()[0]  # bounded: single global-agg row
        if tot["b"] == 0:
            break
        if (
            prev is not None
            and tot["r"] >= prev[0]
            and tot["mx"] >= prev[1]
        ):
            # No progress on EITHER axis: total oversized rows did not
            # shrink AND the worst bucket did not shrink. (Rows alone
            # is the wrong signal — a round that splits one oversized
            # bucket into smaller still-oversized children, e.g. 8192
            # -> 2×4096+ with cap 4096, keeps the row total constant
            # while making real progress toward the cap; ADVICE r7.)
            # The survivors are (near-)duplicate clusters no hyperplane
            # family can separate — further rounds would only burn
            # corpus passes. Leave them to the scorer (the documented
            # approximation floor); max_split_rounds stays the hard
            # bound either way.
            break
        prev = (tot["r"], tot["mx"])
        extra = sign_bucket("vec", split_bits, dim, seed + 37 * (round_no + 1))
        bucketed = (
            bucketed.join(
                F.broadcast(over_stats.select("bucket").withColumn(
                    "__over", F.lit(True)
                )),
                "bucket",
                "left",
            )
            .withColumn(
                "bucket",
                F.when(
                    F.col("__over"), F.concat(F.col("bucket"), F.lit("|"), extra)
                ).otherwise(F.col("bucket")),
            )
            .drop("__over")
            .localCheckpoint(eager=False)
        )
    return bucketed


def lsh_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 12,
    dim: int = 64,
    seed: int = 7,
    max_bucket_rows: int | None = 4096,
) -> DataFrame:
    """Approximate top-k: candidates share the sign-LSH bucket (IVF-style
    coarse quantizer — widen ``bits`` as the corpus grows), scored by
    one numpy matmul per bucket. No crossJoin, no quadratic shuffle;
    random (not axis-aligned) hyperplanes keep bucket sizes balanced on
    sign-correlated corpora, and ``refined_sign_buckets`` re-bands any
    bucket over ``max_bucket_rows`` so no pandas group can exceed the
    cap (modulo exact-duplicate vectors)."""
    bucketed = refined_sign_buckets(
        emb, id_col, vec_col, bits, dim, seed, max_bucket_rows
    )

    import pyarrow as parrow

    empty = parrow.table(
        {
            "query_id": parrow.array([], parrow.int64()),
            "neighbor_id": parrow.array([], parrow.int64()),
            "cos": parrow.array([], parrow.float64()),
            "rank": parrow.array([], parrow.int32()),
        }
    )

    def score(key, t):
        # applyInArrow (r10): zero-copy vector ingest + numpy-slice
        # output. Rank semantics preserved exactly: the sort puts every
        # -inf (self-mask) after all finite scores, so the finite
        # prefix's 1-based positions are what enumerate emitted.
        if t.num_rows < 2:
            return empty
        ids = t.column("vid").to_numpy()
        u = _unit(_arrow_matrix(t.column("vec")))
        c = np.round(u @ u.T, 4)
        np.fill_diagonal(c, -np.inf)
        kk = min(k, len(ids) - 1)
        out_q, out_n, out_c, out_r = [], [], [], []
        for r in range(len(ids)):
            order = np.lexsort((ids, -c[r]))[:kk]
            sel = order[np.isfinite(c[r, order])]
            if len(sel):
                out_q.append(np.full(len(sel), ids[r], dtype=np.int64))
                out_n.append(sel_ids := ids[sel].astype(np.int64))
                out_c.append(c[r, sel])
                out_r.append(np.arange(1, len(sel_ids) + 1, dtype=np.int32))
        if not out_q:
            return empty
        return parrow.table(
            {
                "query_id": parrow.array(np.concatenate(out_q)),
                "neighbor_id": parrow.array(np.concatenate(out_n)),
                "cos": parrow.array(np.concatenate(out_c)),
                "rank": parrow.array(np.concatenate(out_r)),
            }
        )

    return bucketed.groupBy("bucket").applyInArrow(
        score, schema="query_id long, neighbor_id long, cos double, rank int"
    )


def lsh_hard_negatives(
    emb: DataFrame,
    anchor_pred: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    bits: int = 4,
    dim: int = 64,
    seed: int = 7,
    n_blocks: int = 4,
) -> DataFrame:
    """Bucketed hard-negative mining — the SCALE path of
    ``brute_force_topk(exclude_label_col=...)``: per anchor (rows
    matching ``anchor_pred``), the top-k most-similar vectors of a
    DIFFERENT label among candidates sharing the anchor's seeded
    sign-LSH bucket. Candidate mass is Σ_b anchors_b × |b| instead of
    anchors × corpus — widen ``bits`` with the corpus (the coarse-
    quantizer sizing) and the per-bucket work stays bounded; the
    Rademacher bucket is oracle-expressible (``sign_bucket_expr``), so
    unlike a k-means assignment the whole approximate answer is
    strict-certifiable.

    Within a bucket the candidates are hashed into ``n_blocks`` blocks
    and anchors replicated per block (the ``brute_force_topk`` layout),
    so one Arrow group holds a bucket-block, not a whole bucket; the
    masked matmul kernel and the exact ranking window over the ≤
    blocks·k block-local survivors are shared with the exact miner —
    swapping exact↔bucketed changes ONLY the candidate generator."""
    from pyspark.sql import Window

    b = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col(label_col).alias("lbl"),
        sign_bucket(vec_col, bits, dim, seed).alias("bucket"),
        anchor_pred.alias("is_anchor"),
    )
    cand = b.withColumn("blk", F.pmod(F.hash("vid"), F.lit(n_blocks)))
    anch = b.filter("is_anchor").withColumn(
        "blk", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
    )
    candidates = (
        anch.groupBy("bucket", "blk")
        .cogroup(cand.groupBy("bucket", "blk"))
        .applyInArrow(
            _masked_topk_kernel(k, with_label=True),
            schema="query_id long, neighbor_id long, cos double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# Invocation counter so tests can PROVE the persisted-index query path
# never retrains (VERDICT r6 task 3: "second plan must contain no
# k-means stage").
KMEANS_CALLS = {"n": 0}


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Tiny seeded k-means on a driver-side sample — coarse-quantizer
    training is a bounded-sample step even at 100 TB (the FAISS recipe:
    train on ~10⁵ vectors, assign the corpus distributedly)."""
    KMEANS_CALLS["n"] += 1
    rng = np.random.default_rng(seed)
    u = _unit(sample)
    cents = u[rng.choice(len(u), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(u @ cents.T, axis=1)
        for c in range(k):
            members = u[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n:
                    cents[c] = m / n
    return cents


def cap_ivf_cells(
    corpus: DataFrame,
    queries: DataFrame,
    cell_cap: int,
    dim: int,
    seed: int = 42,
    split_bits: int = 4,
    max_rounds: int = 8,
    record: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Quantizer-skew guard for the IVF layout: no cogroup cell may
    exceed ``cell_cap`` corpus rows. Oversized cells get a seeded
    sign-hyperplane suffix computed from the VECTOR itself (corpus rows
    from ``vec``, probe rows from ``qvec``), so both roles land in the
    same sub-cell without any coordination — the ``refined_sign_buckets``
    recipe applied to IVF cells. Each round costs one cell-size
    aggregate plus one broadcast join against the (tiny) oversized-cell
    list; ``max_rounds`` bounds the loop, with exact-duplicate /
    near-identical vectors as the documented residual floor (hyperplanes
    cannot separate them).

    ``corpus`` must have (vid, vec, cell); ``queries`` (qid, qvec, cell).
    Returns both with string-typed, capped cell keys.

    ``record`` (optional): a list that receives one ``(sfx_seed,
    [oversized cells])`` entry per split round — the split HISTORY a
    persisted index needs so later probes/appends can replay the exact
    same sub-cell keys (``ivf_build``/``ivf_query_persisted``). The
    oversized-cell list is tiny by construction (cells already over the
    cap), so the extra collect is a bounded driver action.

    Loop shape (r10, guide §8 "move heavy bytes once"): only rows whose
    CURRENT cell is oversized can change key in a round, so the loop
    carries just that shrinking "active" set — under-cap rows freeze
    into lazily-filtered "done" views of the previous round's blocks.
    The r9 form re-checkpointed the FULL corpus AND the (nprobe×
    exploded) query frame every round, materializing the vector payload
    rounds× over into deserialized block storage — at 2M×64f that cache
    churn, not the split math, was the sf100 wall (driver thread dumps:
    29/32 executor threads in MemoryStore.putIteratorAsValues). The
    query side leaves the loop entirely: its final keys are exactly a
    replay of the recorded history (``_replay_cell_splits`` — the same
    transform the persisted append/probe paths already use), so it pays
    zero checkpoints. Oversized detection over the active set is
    equivalent to detection over the full corpus: a cell's whole
    population moves between active/done together (keys extend only
    currently-oversized keys), so a frozen cell can never grow.
    Answers are bit-identical — same seeds, same per-round oversized
    lists, same suffix expression, only WHERE rows are cached changes.

    Determinism assumption (ADVICE r10): round-0 frozen rows keep their
    lineage rooted at the UNCACHED input frame, so a caller that runs
    several actions re-executes that upstream scan/assign for them —
    correctness then rests on the upstream lineage being deterministic
    across re-evaluations. That holds for every in-repo caller (the
    assign kernels are seeded, parquet scans are stable, and both
    ``ivf_build`` and ``ivf_topk`` checkpoint the assignment before
    calling in), and callers composing new pipelines must either keep
    that property or checkpoint their corpus first.
    """
    from pyspark.storagelevel import StorageLevel

    spark = corpus.sparkSession
    corpus = corpus.withColumn("cell", F.col("cell").cast("string"))
    queries = queries.withColumn("cell", F.col("cell").cast("string"))
    cols = list(corpus.columns)
    history: list[tuple[int, list[str]]] = []
    done: list[DataFrame] = []
    active = corpus
    for round_no in range(max_rounds):
        cells = sorted(
            r["cell"]
            for r in active.groupBy("cell")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > cell_cap)
            .select("cell")
            .collect()  # bounded: oversized-cell ids <= n_cells
        )
        if not cells:
            break
        sfx_seed = seed + 101 * (round_no + 1)
        history.append((sfx_seed, cells))
        ov = F.broadcast(
            spark.createDataFrame([(c,) for c in cells], "cell string")
            .withColumn("__over", F.lit(True))
        )
        joined = active.join(ov, "cell", "left")
        # Under-cap rows freeze: a lazy view over the PREVIOUS round's
        # checkpoint blocks (no new materialization, no sign_bucket).
        done.append(joined.filter(F.col("__over").isNull()).select(*cols))
        # Only the oversized remainder is re-keyed and checkpointed —
        # serialized storage: compact bytes instead of per-row objects
        # (the MemoryStore/SizeEstimator churn measured above).
        active = (
            joined.filter(F.col("__over"))
            .withColumn(
                "cell",
                F.concat(
                    F.col("cell"),
                    F.lit("|"),
                    sign_bucket("vec", split_bits, dim, sfx_seed),
                ),
            )
            .select(*cols)
            .localCheckpoint(
                # MEMORY_AND_DISK is the SERIALIZED level in the Python
                # API (MEMORY_AND_DISK_DESER is the DataFrame default).
                eager=False,
                storageLevel=StorageLevel.MEMORY_AND_DISK,
            )
        )
    if record is not None:
        record.extend(history)
    out_c = active
    for d in done:
        out_c = out_c.unionByName(d)
    out_q = _replay_cell_splits(queries, "qvec", history, split_bits, dim)
    return out_c, out_q


def _make_cell_scorer(k: int):
    """Per-cell exact cosine top-k cogroup kernel shared by the ad-hoc
    (``ivf_topk``) and persisted (``ivf_query_persisted``) IVF paths.
    Queries arrive as (qid, qvec, cell), corpus as (vid, vec, cell);
    identical ids are self-masked (the self-query convention).

    applyInArrow form (r10, VERDICT r9 task 1): the vector columns of
    BOTH cogroup sides ingest zero-copy (``_arrow_matrix``) and the
    top-k output assembles from concatenated numpy slices — the pandas
    form materialized one ndarray object per input row plus one Python
    tuple per emitted pair, which is the conversion cost that bound the
    self-query certificates' sf100 walls (SCALING.md). Ranking math is
    unchanged: same rounded float64 scores, same (cos desc, id asc)
    lexsort, same self-mask."""
    import pyarrow as pa

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def score(key, qt, ct):
        if qt.num_rows == 0 or ct.num_rows == 0:
            return empty
        qi = qt.column("qid").to_numpy()
        ci = ct.column("vid").to_numpy()
        c = np.round(
            _unit(_arrow_matrix(qt.column("qvec")))
            @ _unit(_arrow_matrix(ct.column("vec"))).T,
            4,
        )
        c[qi[:, None] == ci[None, :]] = -np.inf
        kk = min(k, c.shape[1])
        out_q, out_n, out_c = [], [], []
        for r in range(c.shape[0]):
            order = np.lexsort((ci, -c[r]))[:kk]
            sel = order[np.isfinite(c[r, order])]
            if len(sel):
                out_q.append(np.full(len(sel), qi[r], dtype=np.int64))
                out_n.append(ci[sel].astype(np.int64))
                out_c.append(c[r, sel])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )

    return score


def _rank_cell_candidates(queries: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
    """Cogroup-score probed cells and rank the survivors globally —
    block-local top-k per probed cell is a superset of the global
    top-k over the probed cells, so the window pass is exact."""
    from pyspark.sql import Window

    candidates = (
        queries.groupBy("cell")
        .cogroup(corpus.groupBy("cell"))
        .applyInArrow(
            _make_cell_scorer(k),
            schema="query_id long, neighbor_id long, cos double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        candidates.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int | None = None,
    nprobe: int = 2,
    train_sample: int = 4096,
    seed: int = 42,
    cell_cap: int | None = 4096,
) -> DataFrame:
    """IVF-style approximate top-k: k-means coarse quantizer trained on
    a bounded sample, corpus assigned to its nearest centroid
    distributedly, each query probes its ``nprobe`` nearest cells, and
    the exact cosine ranking runs only inside the probed cells — the
    classical inverted-file ANN layout. Larger ``nprobe`` trades
    latency for recall.

    Scale parameters:

    - ``n_clusters=None`` (default) derives the cell count from the
      corpus: ~√N clamped to [4, train_sample // 8] — the FAISS sizing
      rule. A FIXED cell count is a scale bug: at 1B+ vectors a
      16-cell quantizer makes every cogroup cell ~N/16 rows and the
      scorer OOMs one worker per cell.
    - ``cell_cap`` bounds the rows any single cogroup task can see even
      under quantizer skew (a dense corpus region can overload one
      centroid regardless of cell count): oversized cells are
      sub-split with seeded sign-hyperplane suffixes — applied to the
      VECTOR, so a query probe and a corpus row land in the same
      sub-cell deterministically — until every cell fits or the split
      rounds cap out (exact-duplicate vectors set the floor). Same
      recipe as ``refined_sign_buckets``.

    Self-query form (every vector is a query), matching ``lsh_topk``.
    No SQL oracle exists for k-means state, so this operator is
    certified rows-only plus a recall-vs-brute-force test."""
    from pyspark.sql import Window

    spark = emb.sparkSession
    if n_clusters is None:
        n = emb.count()  # one bounded action, metadata-cheap on parquet
        n_clusters = int(min(max(4, round(math.sqrt(n))), max(4, train_sample // 8)))
    # Unbiased bounded training sample: order by a seeded hash of the id
    # and take the first N — a deterministic uniform draw across the
    # whole corpus, planned as TakeOrderedAndProject (per-partition
    # top-N heaps, no full sort). limit() alone would take the head of
    # the first parquet file — a biased k-means sample on clustered or
    # partitioned data.
    sample_pdf = (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias(vec_col),
            F.hash(F.col(id_col), F.lit(seed)).alias("__r"),
        )
        .orderBy("__r", "__id")
        .limit(train_sample)
        .select(vec_col)
        .toPandas()  # bounded: <= train_sample rows by the limit above
    )
    cents = _kmeans(_matrix(sample_pdf[vec_col]), n_clusters, seed=seed)
    bc = spark.sparkContext.broadcast(cents)

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            vec = batch.column(1)
            u = _unit(_arrow_matrix(vec))
            sims = u @ bc.value.T
            order = np.argsort(-sims, axis=1)
            arrays = [
                batch.column(0).cast(pa.int64()),
                vec,
                pa.array(order[:, 0].astype(np.int32)),
            ]
            names = ["vid", "vec", "cell"]
            # probe list for the query role (nearest nprobe cells)
            for p in range(nprobe):
                arrays.append(pa.array(order[:, p].astype(np.int32)))
                names.append(f"probe{p}")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    probes_schema = ", ".join(f"probe{p} int" for p in range(nprobe))
    # _spread (r10): gated on the scan's partition count, so a well-
    # laid-out input skips the extra shuffle entirely. The r8 "no
    # spread here" measurement (2× slower at sf1) predates the
    # zero-copy kernel AND the single-row-group fixture finding: on an
    # under-filed input the whole assign→cap-split→checkpoint lineage
    # serializes through one task (the r9 sf100 ">40 min" bind), which
    # dwarfs the one narrow shuffle the gate might add. mapInArrow +
    # zero-copy ingest/pass-through as in _assign_with_centroids.
    assigned = _spread(emb.select(id_col, vec_col)).mapInArrow(
        assign, f"vid long, vec array<float>, cell int, {probes_schema}"
    )
    if cell_cap is not None and len(sample_pdf):
        # localCheckpoint (compute-once), not persist: a persisted
        # frame owned by nobody leaks CacheManager blocks across
        # repeated invocations in a long-lived session; checkpoint
        # blocks are context-cleaned once the result is dropped. It
        # must wrap `assigned` BEFORE corpus/queries derive from it —
        # r9 found the original rebound the name after the derivation,
        # so every cap-split round silently re-ran the assign kernel.
        assigned = assigned.localCheckpoint(eager=False)

    corpus = assigned.select("vid", "vec", "cell")
    queries = assigned.select(
        F.col("vid").alias("qid"),
        F.col("vec").alias("qvec"),
        F.explode(F.array(*[f"probe{p}" for p in range(nprobe)])).alias("cell"),
    )

    if cell_cap is not None and len(sample_pdf):
        corpus, queries = cap_ivf_cells(
            corpus, queries, cell_cap, dim=len(sample_pdf[vec_col].iloc[0]),
            seed=seed,
        )

    return _rank_cell_candidates(queries, corpus, k)


# --------------------------------------------------------------------------
# Persisted IVF index (VERDICT r6 task 3)
#
# ``ivf_topk`` retrains its coarse quantizer on every invocation — fine
# for a one-shot certificate, a scale-killer for a real corpus queried
# repeatedly. The persisted form separates the index LIFECYCLE the way
# FAISS does (train once → add → search many):
#
# - ``ivf_build``  — train the quantizer on a bounded sample, assign
#   the corpus distributedly, cap-split skewed cells, and persist
#   centroids + capped cell codes + the split HISTORY as parquet
#   snapshots in a GraphStore (same versioned layout as the graph
#   tables: time travel, O(batch) deltas, bounded compaction).
# - ``ivf_append`` — assign NEW vectors with the FROZEN quantizer
#   (no retraining — the FAISS ``add`` posture) and land them as an
#   O(batch) delta. Appended mass can re-skew a cell past the cap;
#   that is the documented rebuild trigger, exactly as a FAISS index
#   degrades until retrained.
# - ``ivf_query_persisted`` — answer top-k from the persisted index
#   with NO k-means stage anywhere: centroids are a tiny parquet read
#   broadcast to the probe assigner, the split history replays the
#   exact sub-cell keys, and the cogroup scorer reads the codes
#   snapshot. Mirrors the reference's cache-reuse posture
#   (OPTIMIZATION-CHANGELOG.md:100-113: reuse expensive state across
#   runs instead of recomputing it).
#
# At 100 TB the build is one linear assign pass + bounded driver
# actions; every query afterwards touches nprobe cells of the parquet
# codes table (partition-prunable on `cell` if written partitioned).
# --------------------------------------------------------------------------

IVF_TABLES = ("centroids", "codes", "meta", "splits")


def _assign_with_centroids(
    emb: DataFrame,
    cents: np.ndarray,
    id_col: str,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """Distributed nearest-centroid assignment against a FROZEN
    quantizer: one Arrow pass, no training. Emits (vid, vec, cell,
    probe0..probe{nprobe-1}).

    mapInArrow, not mapInPandas (r10, VERDICT r9 task 1): the vector
    column enters as a zero-copy buffer view (``_arrow_matrix``) and
    leaves by PASSING THE ORIGINAL ARROW COLUMN THROUGH — the pandas
    route paid one ndarray object per row inbound and a per-row
    list re-serialization outbound, which is what bound the 2M-vector
    certificates at scan parallelism. Only (id, vec) cross the
    boundary (guide §4: project before an opaque kernel)."""
    import pyarrow as pa

    bc = emb.sparkSession.sparkContext.broadcast(cents)

    def assign(batches):
        for batch in batches:
            vec = batch.column(1)
            u = _unit(_arrow_matrix(vec))
            sims = u @ bc.value.T
            order = np.argsort(-sims, axis=1)
            arrays = [
                batch.column(0).cast(pa.int64()),
                vec,
                pa.array(order[:, 0].astype(np.int32)),
            ]
            names = ["vid", "vec", "cell"]
            for p in range(nprobe):
                arrays.append(
                    pa.array(order[:, min(p, order.shape[1] - 1)].astype(np.int32))
                )
                names.append(f"probe{p}")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    probes_schema = ", ".join(f"probe{p} int" for p in range(nprobe))
    return _spread(emb.select(id_col, vec_col)).mapInArrow(
        assign, f"vid long, vec array<float>, cell int, {probes_schema}"
    )


# Replay rounds fused into one whole-stage-codegen span before the
# chain is cut. Each round contributes a broadcast-join probe plus a
# split_bits × dim CASE/sum suffix expression (~25 KB of generated
# bytecode at 4×64) — and the span ALSO carries whatever sits upstream
# in the same stage (measured at sf100: the nprobe explode's Generate
# doConsume inlines the first replay rounds, so even TWO rounds plus
# the explode overflowed janino's 64 KB method limit and Spark
# abandoned codegen for the whole span — the InternalCompilerException
# from the r10 probes, answers unaffected but the hottest projection
# ran unfused). One round per span is the level that compiles with
# headroom regardless of the upstream operator.
_REPLAY_CODEGEN_CHUNK = 1


def _replay_cell_splits(
    df: DataFrame,
    vcol: str,
    history: list[tuple[int, list[str]]],
    split_bits: int,
    dim: int,
) -> DataFrame:
    """Replay a recorded cap-split history on fresh rows: each round's
    oversized-cell list is broadcast and matching rows get the same
    vector-derived sign-hyperplane suffix ``cap_ivf_cells`` assigned at
    build time — so an appended vector or a probe lands in exactly the
    sub-cell the persisted codes use.

    Deep histories are cut every ``_REPLAY_CODEGEN_CHUNK`` rounds with a
    lazy SERIALIZED localCheckpoint (VERDICT r10 task 1): the suffix
    arithmetic is heavy enough that chaining 3+ rounds in one codegen
    span exceeds janino's method limit and drops the whole span out of
    codegen exactly at the scales where splitting fires. The cut is a
    storage boundary only — same joins, same suffix expressions, same
    seeds, bit-identical keys (pinned by
    tests/test_llm_ops.py::test_replay_chunked_matches_unchunked) — and
    never fires on histories ≤ chunk (every benched local scale exits
    the cap loop in ≤ 2 rounds)."""
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    df = df.withColumn("cell", F.col("cell").cast("string"))
    for round_no, (sfx_seed, cells) in enumerate(history):
        if round_no and round_no % _REPLAY_CODEGEN_CHUNK == 0:
            # Lazy + serialized: materialized by the caller's first
            # action, compact bytes (the cap_ivf_cells storage-level
            # rationale) — bounds both the codegen span and the
            # replayed lineage depth.
            df = df.localCheckpoint(
                eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        ov = F.broadcast(
            spark.createDataFrame([(c,) for c in cells], "cell string")
            .withColumn("__over", F.lit(True))
        )
        df = (
            df.join(ov, "cell", "left")
            .withColumn(
                "cell",
                F.when(
                    F.col("__over"),
                    F.concat(
                        F.col("cell"),
                        F.lit("|"),
                        sign_bucket(vcol, split_bits, dim, sfx_seed),
                    ),
                ).otherwise(F.col("cell")),
            )
            .drop("__over")
        )
    return df


def ivf_build(
    emb: DataFrame,
    store,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    train_sample: int = 4096,
    seed: int = 42,
    cell_cap: int | None = 4096,
    split_bits: int = 4,
    version: int = 0,
) -> dict:
    """Train + assign + persist an IVF index into ``store`` (a
    ``GraphStore``). Same quantizer recipe as ``ivf_topk`` (seeded
    hash-ordered bounded sample → driver k-means → distributed assign →
    cap-split), but the trained state lands as parquet snapshots so
    queries and appends never retrain. Returns the persisted params."""
    spark = emb.sparkSession
    if n_clusters is None:
        n = emb.count()
        n_clusters = int(
            min(max(4, round(math.sqrt(n))), max(4, train_sample // 8))
        )
    sample_pdf = (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias(vec_col),
            F.hash(F.col(id_col), F.lit(seed)).alias("__r"),
        )
        .orderBy("__r", "__id")
        .limit(train_sample)
        .select(vec_col)
        .toPandas()  # bounded: <= train_sample rows by the limit above
    )
    if not len(sample_pdf):
        raise ValueError("ivf_build: empty corpus")
    dim = len(sample_pdf[vec_col].iloc[0])
    cents = _kmeans(_matrix(sample_pdf[vec_col]), n_clusters, seed=seed)

    # Checkpoint the assignment: the recorded cap-split loop below runs
    # one aggregate + collect per round over this frame, and without the
    # checkpoint each round re-runs the whole assign kernel (r9).
    corpus = (
        _assign_with_centroids(emb, cents, id_col, vec_col, nprobe=1)
        .select("vid", "vec", "cell")
        .localCheckpoint(eager=False)
    )
    history: list[tuple[int, list[str]]] = []
    if cell_cap is not None:
        empty_q = spark.createDataFrame(
            [], "qid long, qvec array<float>, cell int"
        )
        corpus, _ = cap_ivf_cells(
            corpus,
            empty_q,
            cell_cap,
            dim=dim,
            seed=seed,
            split_bits=split_bits,
            record=history,
        )
    else:
        corpus = corpus.withColumn("cell", F.col("cell").cast("string"))

    # The three state tables are driver-resident metadata (centroids ≈
    # √N rows, meta 1 row, splits ≈ oversized-cell count): publish them
    # with the store's in-process Arrow path — same layout, pointer
    # flip and crash-safe rename sequence, minus three fixed-size Spark
    # write jobs per build (r10; the schema matches what createDataFrame
    # produced, pinned by the persisted-index tests).
    import pyarrow as pa

    cents_tbl = pa.table(
        {
            "cell": pa.array(range(len(cents)), pa.int32()),
            "centroid": pa.array(
                [[float(x) for x in row] for row in cents],
                pa.list_(pa.float32()),
            ),
        }
    )
    meta_tbl = pa.table(
        {
            "dim": pa.array([dim], pa.int32()),
            "n_clusters": pa.array([n_clusters], pa.int32()),
            "seed": pa.array([seed], pa.int32()),
            "split_bits": pa.array([split_bits], pa.int32()),
            "cell_cap": pa.array([int(cell_cap or 0)], pa.int32()),
        }
    )
    split_rows = [
        (r, sfx_seed, cell)
        for r, (sfx_seed, cells) in enumerate(history)
        for cell in cells
    ]
    splits_tbl = pa.table(
        {
            "round": pa.array([r for r, _, _ in split_rows], pa.int32()),
            "sfx_seed": pa.array([s for _, s, _ in split_rows], pa.int32()),
            "cell": pa.array([c for _, _, c in split_rows], pa.string()),
        }
    )
    # Hive-partition the codes by cell: a 100 TB reader that probes
    # nprobe cells scans only those partitions (the GraphStore label-
    # partitioning recipe applied to the IVF layout); locally the
    # cogroup reads the whole snapshot either way.
    store.write(corpus, "codes", version, partition_by=("cell",))
    store.write_arrow(cents_tbl, "centroids", version)
    store.write_arrow(meta_tbl, "meta", version)
    store.write_arrow(splits_tbl, "splits", version)
    return {
        "dim": dim,
        "n_clusters": n_clusters,
        "split_rounds": len(history),
    }


def _load_ivf_state(spark, store):
    """Bounded driver reads of the tiny index-state tables (centroids ≈
    √N rows, meta 1 row, splits ≈ oversized-cell count).

    Callers that query the same frozen index several times in one plan
    (the lifecycle certificates) should load once and pass the result
    through ``ivf_query_persisted(state=...)`` — each load is three
    small driver actions, pure fixed cost when the index has not
    changed between calls."""
    meta = store.read(spark, "meta").collect()[0].asDict()  # bounded: 1-row meta table
    cent_rows = store.read(spark, "centroids").collect()  # bounded: n_clusters rows (~sqrt N)
    cents = np.zeros((meta["n_clusters"], meta["dim"]), dtype=np.float64)
    for r in cent_rows:
        cents[r["cell"]] = r["centroid"]
    splits = store.read(spark, "splits").collect()  # bounded: one row per oversized-cell split
    by_round: dict[int, tuple[int, list[str]]] = {}
    for r in splits:
        seed_cells = by_round.setdefault(r["round"], (r["sfx_seed"], []))
        seed_cells[1].append(r["cell"])
    history = [by_round[k] for k in sorted(by_round)]
    return meta, cents, history


def ivf_append(
    new_emb: DataFrame,
    store,
    version: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    state: tuple | None = None,
) -> None:
    """Add new vectors to a persisted IVF index WITHOUT retraining: one
    frozen-quantizer assign pass + split-history replay, landed as an
    O(batch) GraphStore delta (``read`` unions it; ``compact`` folds it
    into the next snapshot). The FAISS ``index.add`` posture.

    ``state``: a pre-loaded ``_load_ivf_state`` result — pass it when
    appending several batches against the SAME frozen quantizer (the
    streaming-ingest cadence) so the three tiny state reads run once,
    not three driver actions per batch (r11; same contract as
    ``ivf_query_persisted(state=...)`` — appends write only the codes
    table, never the state tables, so the snapshot is immutable across
    the batch sequence)."""
    spark = new_emb.sparkSession
    meta, cents, history = (
        state if state is not None else _load_ivf_state(spark, store)
    )
    assigned = _assign_with_centroids(
        new_emb, cents, id_col, vec_col, nprobe=1
    ).select("vid", "vec", "cell")
    assigned = _replay_cell_splits(
        assigned, "vec", history, meta["split_bits"], meta["dim"]
    )
    store.append_delta(assigned, "codes", version)


def ivf_query_persisted(
    queries: DataFrame,
    store,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prune: bool = True,
    state: tuple | None = None,
) -> DataFrame:
    """Top-k from a PERSISTED IVF index: no k-means anywhere (pinned by
    tests via ``KMEANS_CALLS``) — centroids come from a tiny parquet
    read, probes replay the recorded split history, and the scorer
    cogroups against the codes snapshot. Identical semantics to
    ``ivf_topk`` when the query set is the indexed corpus itself
    (self-masking scorer), which is what ``q_ann_persist`` exploits to
    hash-match the fresh-build answer.

    ``prune=False`` skips the isin() partition-prune and scans the full
    codes snapshot — the cell cogroup still restricts candidates, so
    the answer is identical; it exists so tests can assert the prune is
    answer-neutral against a genuinely unpruned read (ADVICE r8).

    ``state``: a pre-loaded ``_load_ivf_state`` result — pass it when
    issuing several queries against the SAME frozen index so the three
    tiny state reads run once, not per call (pure fixed cost; the
    answer is identical because the state is immutable between
    queries)."""
    spark = queries.sparkSession
    meta, cents, history = state if state is not None else _load_ivf_state(spark, store)
    nprobe = min(nprobe, meta["n_clusters"])
    assigned = _assign_with_centroids(queries, cents, id_col, vec_col, nprobe)
    probe_q = assigned.select(
        F.col("vid").alias("qid"),
        F.col("vec").alias("qvec"),
        F.explode(
            F.array(*[f"probe{p}" for p in range(nprobe)])
        ).alias("cell"),
    )
    probe_q = _replay_cell_splits(
        probe_q, "qvec", history, meta["split_bits"], meta["dim"]
    )
    # Partition-prune the codes read to the PROBED cells: the snapshot
    # is hive-partitioned by cell (ivf_build / layout-preserving
    # compact), so pushing the probed set as literal isin() turns the
    # scan into PartitionFilters over only those directories — at
    # 100 TB a query batch probing nprobe·|batch| cells reads exactly
    # that fraction of the index, not the whole corpus (pinned by
    # tests/test_llm_ops.py's PartitionFilters plan test). The probed
    # set is DIMENSION-sized (≤ n_clusters + split history, no matter
    # how many queries), so the collect is bounded; probe_q is
    # checkpointed first so the assign kernel runs once, not twice.
    probe_q = probe_q.localCheckpoint(eager=True)
    probed = sorted(
        r["cell"] for r in probe_q.select("cell").distinct().collect()  # bounded: <= n_clusters + split cells
    )
    corpus = store.read(spark, "codes")
    # Partition type inference reads an all-numeric cell column back
    # as int (string once any split cell like '3|0110' exists); filter
    # on the RAW column type — a cast under the filter would defeat
    # partition pruning — then normalize to string for the cogroup.
    if prune and isinstance(corpus.schema["cell"].dataType, StringType):
        corpus = corpus.filter(F.col("cell").isin(probed))
    elif prune:
        corpus = corpus.filter(
            F.col("cell").isin(sorted({int(c) for c in probed}))
        )
    corpus = corpus.withColumn("cell", F.col("cell").cast("string"))
    return _rank_cell_candidates(probe_q, corpus, k)


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid of an embedding column, emitted exploded as
    (label, pos, centroid) so downstream consumers (and the SQL
    oracle) need no array reassembly.

    Scale posture: posexplode is linear (dim × rows) and the single
    shuffle is the keyed hash aggregation on (label, pos) with partial
    map-side combine — the canonical distributed column-mean layout.
    Rounded to 4 dp to pin float32 summation-order noise.
    """
    return (
        emb.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 4).alias("centroid"))
    )


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Plain Euclidean k-means on a driver-side sample — the codebook
    trainer for product quantization (subvectors are NOT unit vectors,
    so the spherical trainer above does not apply)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivfpq_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int | None = 16,
    nprobe: int = 2,
    m: int = 8,
    codebook_k: int = 16,
    refine: int | None = None,
    train_sample: int = 4096,
    seed: int = 42,
    cell_cap: int | None = 4096,
) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS ``IVFx,PQm`` layout): an IVF
    coarse quantizer routes queries to ``nprobe`` cells, and INSIDE each
    cell candidates are scored from ``m``-byte product-quantization
    codes via an ADC lookup-table scan — ``m`` table lookups per
    candidate instead of a ``dim``-multiply dot product, with the codes
    table dim·4/m× smaller than the raw vectors (32× at dim=64, m=8).
    The top ``refine`` ADC candidates per query are re-ranked with the
    exact cosine, so emitted scores are true cosines (4 dp).
    ``refine=None`` (the default) sizes the re-rank depth from the
    corpus count — max(32, 4·k·ceil(log10 n)) — because a FIXED depth
    is a recall cliff in disguise: the sf10 heavy-value gate measured
    recall@5 collapsing 0.75 → 0.32 at 200k vectors with refine=32
    (near-tie clusters grow with the corpus, and ADC quantization
    shuffles ranks beyond a fixed buffer), restored to 0.62 at 64.
    Widening the PQ codebooks (256 vs 16) did NOT move recall on the
    same corpus — the refine depth is the binding factor.

    Scale posture: both quantizers train on ONE bounded driver sample
    (the FAISS recipe); encoding is a linear Arrow pass; the per-cell
    scan is the same cogroup shape as ``ivf_topk`` but carries codes,
    not vectors — at 100 TB the cell working set shrinks by the PQ
    compression factor, which is the point of the operator. Self-query
    form, matching ``lsh_topk``/``ivf_topk``. k-means state has no SQL
    form, so certification is rows-only plus a recall-vs-brute-force
    test (tests/test_similarity_pq.py).

    ``cell_cap`` (round-7, found by the sf10 probe): like ``ivf_topk``,
    oversized quantizer cells are sub-split with vector-derived
    sign-hyperplane suffixes so no cogroup task sees more than
    ``cell_cap`` candidates — without it a fixed cell count turned the
    per-cell ADC scan quadratic in corpus density (probes × candidates
    inside one cell) at the 200k-vector fixture. ``n_clusters=None``
    applies the same ~√N FAISS sizing as ``ivf_topk``."""
    from pyspark.sql import Window  # noqa: F401 — used by the rank pass

    spark = emb.sparkSession
    n = emb.count() if (n_clusters is None or refine is None) else None
    if n_clusters is None:
        n_clusters = int(
            min(max(4, round(math.sqrt(n))), max(4, train_sample // 8))
        )
    if refine is None:
        # Corpus-adaptive re-rank depth (see docstring): one parquet
        # metadata count buys a depth that tracks near-tie growth.
        refine = max(32, 4 * k * math.ceil(math.log10(max(10, n))))
    sample_pdf = (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias(vec_col),
            F.hash(F.col(id_col), F.lit(seed)).alias("__r"),
        )
        .orderBy("__r", "__id")
        .limit(train_sample)
        .select(vec_col)
        .toPandas()  # bounded: <= train_sample rows by the limit above
    )
    train = _unit(_matrix(sample_pdf[vec_col]))
    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    coarse = _kmeans(train, n_clusters, seed=seed)
    # Residual-free PQ (the simpler IVFPQ variant): per-subspace
    # codebooks over the unit-normalized vectors themselves.
    books = np.stack(
        [
            _kmeans_l2(train[:, s * dsub : (s + 1) * dsub], codebook_k, seed=seed + s)
            for s in range(m)
        ]
    )  # (m, codebook_k, dsub)
    bc_coarse = spark.sparkContext.broadcast(coarse)
    bc_books = spark.sparkContext.broadcast(books)

    def encode(batches):
        import pyarrow as pa

        for batch in batches:
            vec = batch.column(1)
            u = _unit(_arrow_matrix(vec))
            sims = u @ bc_coarse.value.T
            order = np.argsort(-sims, axis=1)
            codes = np.empty((len(u), m), dtype=np.int32)
            for s in range(m):
                sub = u[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - bc_books.value[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, s] = np.argmin(d2, axis=1)
            # codes as one ListArray over the raveled matrix — no
            # per-row Python lists (r10, same recipe as _arrow_matrix
            # ingest; offsets are the trivial arange × m).
            codes_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(len(u) + 1, dtype=np.int32) * m),
                pa.array(codes.ravel()),
            )
            arrays = [
                batch.column(0).cast(pa.int64()),
                vec,
                codes_arr,
                pa.array(order[:, 0].astype(np.int32)),
            ]
            names = ["vid", "vec", "codes", "cell"]
            for p in range(nprobe):
                arrays.append(pa.array(order[:, p].astype(np.int32)))
                names.append(f"probe{p}")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    probes_schema = ", ".join(f"probe{p} int" for p in range(nprobe))
    assigned = _spread(emb.select(id_col, vec_col)).mapInArrow(
        encode,
        f"vid long, vec array<float>, codes array<int>, cell int, {probes_schema}",
    )
    if cell_cap is not None and len(sample_pdf):
        # checkpoint BEFORE corpus/queries derive from it (see ivf_topk)
        assigned = assigned.localCheckpoint(eager=False)
    corpus = assigned.select("vid", "vec", "codes", "cell")
    queries = assigned.select(
        F.col("vid").alias("qid"),
        F.col("vec").alias("qvec"),
        F.explode(F.array(*[f"probe{p}" for p in range(nprobe)])).alias("cell"),
    )

    if cell_cap is not None and len(sample_pdf):
        corpus, queries = cap_ivf_cells(
            corpus, queries, cell_cap, dim=dim, seed=seed
        )

    import pyarrow as pa

    _empty_topk = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def score(key, qt, ct):
        # applyInArrow (r10): vectors AND codes ingest zero-copy — the
        # pandas form paid one ndarray object per row for qvec/vec plus
        # np.vstack over per-row codes lists, the conversion cost that
        # bound this certificate's sf100 wall (SCALING.md). Scoring
        # math unchanged (same LUT/ADC, same rounded float64 re-rank).
        empty = _empty_topk
        if qt.num_rows == 0 or ct.num_rows == 0:
            return empty
        qi, ci = qt.column("qid").to_numpy(), ct.column("vid").to_numpy()
        qu = _unit(_arrow_matrix(qt.column("qvec")))
        codes = _arrow_matrix(ct.column("codes"), dtype=np.int64)  # (n, m)
        cu = _unit(_arrow_matrix(ct.column("vec")))
        books_ = bc_books.value
        n_q, n_c = len(qu), len(ci)
        rr = min(refine, n_c)
        # ADC for ALL queries in one shot (round-7, sf10 probe): the
        # per-query python loop made the cell scan queries × candidates
        # in interpreter time; the LUT build and the m gathers are now
        # numpy-batched — lut[r, s, c] = <q_r's subvector s, book_s[c]>,
        # adc[r, n] = Σ_s lut[r, s, codes[n, s]].
        lut = np.einsum(
            "rsd,skd->rsk", qu.reshape(n_q, m, dsub), books_
        )  # (n_q, m, codebook_k)
        adc = np.zeros((n_q, n_c))
        for s in range(m):
            adc += lut[:, s, codes[:, s]]
        adc[qi[:, None] == ci[None, :]] = -np.inf
        if rr < n_c:
            cand_all = np.argpartition(-adc, rr - 1, axis=1)[:, :rr]
        else:
            cand_all = np.broadcast_to(np.arange(n_c), (n_q, n_c))
        out_q, out_n, out_c = [], [], []
        for r in range(n_q):
            cand = cand_all[r]
            cand = cand[np.isfinite(adc[r, cand])]
            if not len(cand):
                continue
            # exact re-rank of the refine set only
            exact = np.round(cu[cand] @ qu[r], 4)
            order = np.lexsort((ci[cand], -exact))[: min(k, len(cand))]
            out_q.append(np.full(len(order), qi[r], dtype=np.int64))
            out_n.append(ci[cand[order]].astype(np.int64))
            out_c.append(exact[order])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )

    candidates = (
        queries.groupBy("cell")
        .cogroup(corpus.groupBy("cell"))
        .applyInArrow(score, schema="query_id long, neighbor_id long, cos double")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        candidates.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    ``rrf(d) = Σ_r 1/(k_const + rank_r(d))`` over the rankers that
    returned ``d``; top-``k`` by fused score, id tiebreak. The standard
    score-free hybrid-retrieval combiner (lexical BM25 + vector ANN):
    rank positions compose across incomparable score scales.

    Scale posture: each input ranking is already bounded (a top-N), so
    the union + id-keyed sum aggregate + top-k heap all run over
    O(N · rankers) rows regardless of corpus size — fusion cost is
    independent of the data the rankers searched. Double determinism:
    each group sums ≤ len(rankings) IEEE terms; for the 2-ranker hybrid
    the sum is a single commutative add, fold-order independent.
    """
    terms = [
        r.select(
            F.col(id_col).alias(id_col),
            (F.lit(1.0) / (F.lit(k_const) + F.col(rank_col))).alias("w"),
        )
        for r in rankings
    ]
    u = terms[0]
    for t in terms[1:]:
        u = u.unionByName(t)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum("w"), 6).alias("rrf"),
            F.count("*").cast("int").alias("n_rankers"),
        )
        .orderBy(F.desc("rrf"), id_col)
        .limit(k)
    )


def mmr_rerank(
    candidates: DataFrame,
    corpus_codes: DataFrame,
    k: int = 4,
    lam_num: int = 7,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking over per-query candidate
    lists (Carbonell & Goldstein 1998) — the diversity pass every
    retrieval stack runs between ANN candidates and the final context:
    greedily pick argmax λ·rel(q,d) − (1−λ)·max_{s∈picked} sim(d,s).

    Exactness: relevance and pairwise similarity are INTEGER dot
    products over int8 codes, λ = lam_num/10 folds into the integer
    objective score10 = lam_num·rel − (10−lam_num)·max_sim (pick 1 has
    no penalty term by the MMR convention), ties break on the smaller
    id — the greedy trace is fully deterministic, so a DuckDB oracle
    can replay it step by step.

    Scale shape: candidates arrive pre-bounded (the certified ANN
    top-C path); the greedy runs per query in ONE applyInPandas group
    whose cost is C²·dim — request-sized work, never corpus-sized.
    The only shuffles are the candidate join to its code vectors and
    the per-query grouping.

    ``candidates``: (query_id, neighbor_id, rel). ``corpus_codes``:
    (id_col, codes_col) int8 code arrays. Returns (query_id,
    pick_rank, vec_id, score10)."""
    lam_rem = 10 - lam_num
    cand = candidates.join(
        corpus_codes.select(
            F.col(id_col).alias("neighbor_id"), F.col(codes_col).alias("c")
        ),
        "neighbor_id",
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["rel"].to_numpy().astype(np.int64)
        mat = _matrix(pdf["c"]).astype(np.int64)
        sims = mat @ mat.T  # C×C integer similarity
        picked: list[int] = []
        scores: list[int] = []
        remaining = np.ones(len(ids), dtype=bool)
        for _ in range(min(k, len(ids))):
            if picked:
                max_sim = sims[:, picked].max(axis=1)
                obj = lam_num * rel - lam_rem * max_sim
            else:
                obj = lam_num * rel
            # Select among the REMAINING indices only (negating a
            # sentinel int64 min overflows, so masking via sentinels
            # would re-pick masked rows).
            rem_idx = np.flatnonzero(remaining)
            local = np.lexsort((ids[rem_idx], -obj[rem_idx]))[0]
            j = int(rem_idx[local])
            picked.append(j)
            scores.append(int(obj[j]))
            remaining[j] = False
        qid = int(pdf["query_id"].iloc[0])
        return pd.DataFrame(
            {
                "query_id": np.int64(qid),
                "pick_rank": np.arange(1, len(picked) + 1, dtype=np.int64),
                "vec_id": ids[picked].astype(np.int64),
                "score10": np.array(scores, dtype=np.int64),
            }
        )

    return cand.groupBy("query_id").applyInPandas(
        greedy, schema="query_id long, pick_rank long, vec_id long, score10 long"
    )
