"""Document deduplication operators for large-scale training-data
pipelines: exact hash dedup, MinHash+LSH near-dedup, SimHash, and exact
n-gram Jaccard verification.

No reference counterpart (BASELINE.json north star). Design targets the
100 TB posture:

- **Exact**: one hash-groupBy shuffle on the content digest.
- **MinHash+LSH**: shingle → per-shingle hashes → column-wise min
  (signature) → band keys → self-join on (band, band_hash). The
  quadratic all-pairs comparison is replaced by an equi-join whose key
  cardinality grows with corpus size, so candidate generation is
  shuffle + hash-join, never a crossJoin. The final exact-Jaccard
  verify touches only candidate pairs.
- **SimHash**: linear scan producing a fixed-width bit signature;
  bucket on the signature (or signature bands for hamming>0).

Everything is built-in expression API — shingling via
``split``/``sequence``/``transform``, hashing via ``md5`` — so the hot
path stays inside whole-stage codegen with zero Python.

MinHash here uses the *string-min* construction: signature element j =
``min(md5(j || ':' || shingle))`` over the shingle set. Min over hex
digests is an order statistic of a uniform permutation of the shingle
universe — the classical MinHash estimator — and has the practical
advantage of being reproducible in any engine with md5 and string
ordering (which is how the DuckDB oracle certifies it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_ODD = "13579bdf"  # hex digits with low bit set → +1 vote in simhash


def _spread(df: DataFrame) -> DataFrame:
    """Hash-repartition to full parallelism before CPU-heavy per-row
    signature work. Local test inputs are one small parquet file → one
    partition, which would serialize the hashing onto a single core; on
    a real cluster the scan already yields many splits and this round
    robin is a cheap row-level rebalance (raw text moves once, before
    the 10×-larger shingle explosion)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a lowercased text column."""
    words = F.split(F.lower(text), " ")
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content digest: one survivor (min id) per digest.

    Returns (content_hash, doc_id=survivor, dup_count)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
    )


def minhash_signature(docs: DataFrame, id_col: str, text_col: str, num_hashes: int) -> DataFrame:
    """(id, shingles, sig: array<string> of length num_hashes).

    Shaped for whole-stage codegen: explode the shingle set, compute the
    ``num_hashes`` salted digests as plain columns (flat md5 calls — no
    nested higher-order functions, which execute interpreted), and take
    each signature element as a ``min()`` in ONE hash aggregate. The
    map-side partial min means only ``num_hashes`` strings per doc per
    partition reach the shuffle."""
    exploded = _spread(
        docs.select(F.col(id_col), word_shingles(F.col(text_col)).alias("shingles"))
        .filter(F.size("shingles") > 0)
    ).select(F.col(id_col), F.explode("shingles").alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("s")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    sig_df = exploded.groupBy(id_col).agg(
        *aggs, F.collect_list("s").alias("shingles")
    )
    return sig_df.select(
        F.col(id_col),
        F.col("shingles"),
        F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding, with
    exact shingle-Jaccard verification of candidates.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold
    rounded to 4 dp. Candidate generation is an equi-join on
    (band, band_hash); only candidates pay the exact set comparison.
    """
    rows = num_hashes // bands
    signed = minhash_signature(docs, id_col, text_col, num_hashes)

    band_entries = signed.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice(F.col("sig"), b * rows + 1, rows)
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash"))

    left = band_entries.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    right = band_entries.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    candidates = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sh = signed.select(F.col(id_col), F.col("shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via an inverted-index set-similarity
    join — identical output to the naive all-pairs crossJoin, but the
    only shuffle is an equi-join on the shingle itself, so cost scales
    with the token-posting-list skew (sum of freq² per shingle), not
    with |corpus|². Pairs sharing zero shingles have jaccard 0 < τ and
    are correctly absent.

    intersection(a,b) = COUNT of shared shingles = groupBy(id_a,id_b)
    after the shingle equi-join; |a∪b| = |a| + |b| − |a∩b| from the
    per-doc shingle counts. No arrays cross the shuffle.
    """
    sh = _spread(docs).select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    # Posting list: one row per (doc, distinct shingle), plus set size.
    posts = sh.select(
        F.col(id_col), F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    a = posts.select(
        F.col("shingle"), F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    b = posts.select(
        F.col("shingle"), F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash rendered as a bit string (per-row HOF form; see
    ``simhash_groups`` for the vectorized explode/agg plan used in the
    hot path).

    Bit p is the sign of the frequency-weighted vote over all words,
    where word w votes +1 on bit p iff hex digit p of md5(w) is odd —
    a deterministic random-hyperplane family shared with the oracle.
    """
    words = F.split(F.lower(text), " ")
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda p: F.when(
            F.aggregate(
                words,
                F.lit(0),
                lambda acc, w: acc
                + F.when(
                    F.substring(F.md5(w), 1, 16).substr(p, F.lit(1)).isin(*HEX_ODD),
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def simhash_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash, n_same): per-doc signature plus its bucket size —
    hamming-0 dedup; band the signature for hamming>0 at scale.

    Same vote semantics as ``simhash16`` but planned as explode(words)
    → md5 once per word → 16 conditional sums in one hash aggregate, so
    the whole signature stays in whole-stage codegen with map-side
    partial aggregation (16 ints per doc cross the shuffle)."""
    words = _spread(docs).select(
        F.col(id_col), F.explode(F.split(F.lower(text_col), " ")).alias("w")
    )
    digest = F.md5("w")
    votes = [
        F.sum(
            F.when(F.substring(digest, p, 1).isin(*HEX_ODD), 1).otherwise(-1)
        ).alias(f"v{p}")
        for p in range(1, 17)
    ]
    sh = (
        words.groupBy(id_col)
        .agg(*votes)
        .select(
            F.col(id_col),
            F.concat(
                *[
                    F.when(F.col(f"v{p}") > 0, "1").otherwise("0")
                    for p in range(1, 17)
                ]
            ).alias("simhash"),
        )
    )
    sizes = sh.groupBy("simhash").agg(F.count("*").alias("n_same"))
    return sh.join(sizes, "simhash").select(id_col, "simhash", "n_same")
