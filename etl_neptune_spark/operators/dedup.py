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

Shingle-set and signature GENERATION runs as Arrow-batched
``mapInPandas`` (Catalyst higher-order functions execute interpreted
per element — measured ~6× slower than a Python loop over an Arrow
batch; ``hashlib.md5`` is byte-identical to SQL ``md5``, so oracle
parity holds). Everything relational — posting-list joins, band
self-joins, bucket-size aggregation, candidate verification — stays in
Spark SQL with whole-stage codegen.

MinHash here uses the *string-min* construction: signature element j =
``min(md5(j || ':' || shingle))`` over the shingle set. Min over hex
digests is an order statistic of a uniform permutation of the shingle
universe — the classical MinHash estimator — and has the practical
advantage of being reproducible in any engine with md5 and string
ordering (which is how the DuckDB oracle certifies it).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_ODD = "13579bdf"  # hex digits with low bit set → +1 vote in simhash


def _spread(df: DataFrame) -> DataFrame:
    """Hash-repartition to full parallelism before CPU-heavy per-row
    signature work. Local test inputs are one small parquet file → one
    partition, which would serialize the hashing onto a single core; on
    a real cluster the scan already yields many splits and this round
    robin is a cheap row-level rebalance (raw text moves once, before
    the 10×-larger shingle explosion). Gated on the input's current
    partition count: when the scan's natural splits already cover the
    cluster, the repartition would be a pure extra shuffle of the raw
    text and is skipped."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a lowercased text column."""
    words = F.split(F.lower(text), " ")
    count = F.size(words) - (n - 1)
    # Guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, and
    # slice(words, 0, n) then throws — a doc with < n words must map
    # to an empty shingle set, not an error.
    return F.when(
        count >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


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


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingles: array<string>) — distinct word n-grams of
    lower(text), docs with no shingle dropped.

    Arrow-batched ``mapInPandas``: Catalyst's higher-order functions
    (transform/slice) execute interpreted per element, which made
    shingling itself the dominant cost of every dedup query; a Python
    loop over an Arrow batch is ~6× faster here and byte-identical
    (str.lower/split match SQL lower/string_split on this data)."""

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                w = t.lower().split(" ")
                sh = list(
                    dict.fromkeys(
                        " ".join(w[j : j + n]) for j in range(len(w) - n + 1)
                    )
                )
                if sh:
                    ids.append(i)
                    shs.append(sh)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "shingles": shs}
            )

    return _spread(docs.select(id_col, text_col)).mapInPandas(
        gen, schema=f"{id_col} long, shingles array<string>"
    )


def minhash_band_entries(
    shingled: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, band_hash) LSH keys from the MinHash signature.

    Signature element j = min over shingles of md5("j:" + shingle) —
    an order statistic of a uniform permutation of the shingle universe
    (the classical MinHash estimator), reproducible in any engine with
    md5 and string ordering (how the DuckDB oracle certifies it).
    Computed in the same Arrow pass as the banding md5; only
    ``bands`` short rows per doc leave the Python worker.

    Kernel layout (the md5 work is the dominant cost of every MinHash
    query): digests are computed once per DISTINCT shingle per Arrow
    batch — near-dup corpora repeat shingles across documents by
    construction, so the naive per-occurrence loop re-hashes the same
    strings over and over — and the per-document column minimum is one
    vectorized numpy reduction over fixed-width ``<U32`` hex arrays
    (exact lexicographic order, identical to the string ``min``)."""
    rows = num_hashes // bands

    def gen(batches):
        md5 = hashlib.md5
        for pdf in batches:
            digs = _batch_digests(pdf["shingles"], num_hashes)
            out_id, out_band, out_hash = [], [], []
            for i, sh in zip(pdf[id_col], pdf["shingles"]):
                sig = digs.signature(sh)
                for b in range(bands):
                    out_id.append(i)
                    out_band.append(b)
                    out_hash.append(
                        md5("|".join(sig[b * rows : (b + 1) * rows]).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_id, dtype="int64"),
                    "band": pd.Series(out_band, dtype="int32"),
                    "band_hash": out_hash,
                }
            )

    return shingled.mapInPandas(gen, schema=f"{id_col} long, band int, band_hash string")


class _batch_digests:
    """Per-batch MinHash digest table: md5 digests keyed by DISTINCT
    shingle, stored as (hi, lo) uint64 pairs — a fixed-width lowercase
    hex string orders EXACTLY like its 128-bit value, so the vectorized
    numpy min over (hi, then lo among hi-ties) reproduces ``min()``
    over hex strings byte-identically (what the DuckDB oracle's
    ``min(md5(...))`` computes), while the reduction stays a native
    integer ufunc (numpy has no unicode min loop)."""

    _FULL = None  # uint64 max, set lazily to avoid import-order issues

    def __init__(self, shingle_lists, num_hashes: int) -> None:
        import numpy as np

        md5 = hashlib.md5
        uniq: dict[str, int] = {}
        for sh in shingle_lists:
            for s in sh:
                if s not in uniq:
                    uniq[s] = len(uniq)
        self.index = uniq
        self.num_hashes = num_hashes
        raw = b"".join(
            md5(f"{j}:{s}".encode()).digest()
            for s in uniq
            for j in range(num_hashes)
        )
        # big-endian split: hex(digest) == f"{hi:016x}{lo:016x}"
        self.mat = (
            np.frombuffer(raw, dtype=">u8")
            .astype(np.uint64)
            .reshape(len(uniq), num_hashes, 2)
        )
        if _batch_digests._FULL is None:
            _batch_digests._FULL = np.uint64(0xFFFFFFFFFFFFFFFF)

    def signature(self, shingles) -> list[str]:
        import numpy as np

        idx = [self.index[s] for s in shingles]
        sub = self.mat[idx]
        hi, lo = sub[..., 0], sub[..., 1]
        mh = hi.min(axis=0)
        ml = np.where(hi == mh[None, :], lo, self._FULL).min(axis=0)
        return [f"{int(h):016x}{int(l):016x}" for h, l in zip(mh, ml)]


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", num_hashes: int = 12
) -> DataFrame:
    """(id, sig: array<string>) — the full MinHash signature (same
    string-min construction as ``minhash_band_entries``), for estimator
    calibration and custom banding."""

    def gen(batches):
        for pdf in batches:
            digs = _batch_digests(pdf["shingles"], num_hashes)
            ids, sigs = [], []
            for i, sh in zip(pdf[id_col], pdf["shingles"]):
                ids.append(i)
                sigs.append(digs.signature(sh))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "sig": sigs}
            )

    return shingled.mapInPandas(gen, schema=f"{id_col} long, sig array<string>")


# A (band, band_hash) bucket counts as hot when BOTH hold — mirroring
# AQE's skew-join rule (relative skewedPartitionFactor AND absolute
# skewedPartitionThresholdInBytes; VERDICT r9 task 5: gate the salt
# fan-out on MEASURED skew):
#   1. it holds ≥ _HOT_BAND_FACTOR × the mean bucket size, and
#   2. it holds ≥ hot_band_min entries — a bucket of b entries feeds
#      ~b²/2 candidate verifications from ONE join key; below ~1k
#      entries that is sub-millisecond work no task imbalance can
#      amplify, while the 8-way replication taxes EVERY row of the
#      join shuffle.
_HOT_BAND_FACTOR = 4.0
_HOT_BAND_MIN = 1024

# Last-call probe observations (n docs, distinct shingle-set groups,
# hottest/mean band bucket, chosen salt) — a test seam like
# similarity.KMEANS_CALLS, not a result cache: it never influences a
# later call's plan or answer.
MINHASH_PROBE: dict = {}


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    min_jaccard: float = 0.5,
    hot_salt: int = 8,
    hot_band_min: int = _HOT_BAND_MIN,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding, with
    exact shingle-Jaccard verification of candidates.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    rounded to 4 dp. Candidate generation is an equi-join on
    (band, band_hash); only candidates pay the exact set comparison.

    Skew posture (VERDICT r8 task 5), both steps answer-preserving:

    1. **Identical-set collapse (adaptive).** Every MinHash signature —
       hence every band hash and every pairwise jaccard — is a function
       of the shingle SET alone, so documents with equal sets are
       interchangeable. A boilerplate-heavy corpus (30% of docs sharing
       a handful of texts) otherwise concentrates one band value and
       pays |clique|² candidate verifications for pairs whose score is
       1.0 by construction. When a one-row stats probe (which doubles as
       the action that materializes the shingle cache, so the Python
       kernel runs exactly once) finds duplicate sets, the LSH + verify
       machinery runs on ONE representative per distinct set (md5 of
       the shingle array keys the group — doc_shingles emits
       first-occurrence order, so equal texts give equal arrays) and
       member pairs come back by expansion: within a group jaccard is
       exactly 1.0, across groups it is the verified rep pair's score.
       A corpus with no duplicate sets skips the collapse entirely —
       no rep join, no expansion, no extra wall.
    2. **Salted band join (adaptive, r10).** When the band-frequency
       probe (one agg over the already-materialized band_entries) finds
       a bucket ≥ ``_HOT_BAND_FACTOR``× the mean, the self-join splits
       every (band, band_hash) key across ``hot_salt`` sub-keys — the
       left side takes a deterministic per-id salt, the right side
       replicates to all salts — so a hot bucket of NEAR-identical (not
       equal) docs spreads over hot_salt tasks. The complete candidate
       set survives (pair (a,b) meets exactly at b's replica of a's
       salt); the cost is hot_salt× rows through one shuffle of the
       tiny band-entry frame, linear and bounded. A uniform corpus
       (no hot bucket) skips the replication entirely — same candidate
       set, hot_salt× fewer rows through the join shuffle.
    """
    # The shingle pass feeds several plan branches; persist + the stats
    # probe below materializes the (Python, md5-heavy) kernel exactly
    # once — lazy caching would let concurrently-launched stages race it.
    from pyspark import StorageLevel

    shingled = (
        doc_shingles(docs, id_col, text_col)
        .withColumn("__g", F.md5(F.to_json(F.col("shingles"))))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    members = shingled.select(id_col, "__g")
    stats = members.agg(
        F.count("*").alias("n"), F.countDistinct("__g").alias("g")
    ).first()  # bounded: single global-agg row (and the cache-filling action)
    collapsed = stats["g"] < stats["n"]
    if collapsed:
        rep_ids = members.groupBy("__g").agg(F.min(id_col).alias(id_col))
        rep_sh = shingled.join(rep_ids, [id_col, "__g"], "left_semi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
    else:
        rep_sh = shingled
    # Both sides of the band self-join read this frame. The bounded
    # stats agg below materializes the banding kernel once (band_entries
    # is tiny — ``bands`` short rows per rep) AND measures band skew
    # (VERDICT r9 task 5): the salt fan-out exists to spread a HOT
    # (band, band_hash) bucket across tasks, but on a uniform corpus it
    # just pushes hot_salt× rows through the candidate-join shuffle for
    # protection nothing needs. Salting only redistributes where pairs
    # meet — pair (a, b) meets exactly at b's replica of a's salt — so
    # both branches produce the identical candidate set (pinned by the
    # answer-equality tests covering both gating branches).
    band_entries = minhash_band_entries(
        rep_sh.select(id_col, "shingles"), id_col, num_hashes, bands
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bstats = (
        band_entries.groupBy("band", "band_hash")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .first()  # bounded: single stats row (and the cache-filling action)
    )
    hottest = int(bstats["mx"] or 0)
    mean_bucket = float(bstats["mean"] or 0.0)
    eff_salt = (
        hot_salt
        if (
            hottest >= _HOT_BAND_FACTOR * max(mean_bucket, 1.0)
            and hottest >= hot_band_min
        )
        else 1
    )
    MINHASH_PROBE.clear()
    MINHASH_PROBE.update(
        {
            "n": int(stats["n"]),
            "groups": int(stats["g"]),
            "collapsed": collapsed,
            "max_band": hottest,
            "mean_band": round(mean_bucket, 3),
            "eff_salt": eff_salt,
        }
    )

    if eff_salt <= 1:
        left = band_entries.select(
            "band", "band_hash", F.col(id_col).alias("id_a")
        )
        right = band_entries.select(
            "band", "band_hash", F.col(id_col).alias("id_b")
        )
        join_keys = ["band", "band_hash"]
    else:
        salts = F.array(*[F.lit(s) for s in range(eff_salt)])
        left = band_entries.select(
            "band",
            "band_hash",
            F.col(id_col).alias("id_a"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(eff_salt)).alias("__s"),
        )
        right = band_entries.select(
            "band",
            "band_hash",
            F.col(id_col).alias("id_b"),
            F.explode(salts).alias("__s"),
        )
        join_keys = ["band", "band_hash", "__s"]
    candidates = (
        left.join(right, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    a = rep_sh.select(
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("__g").alias("__ga"),
    )
    b = rep_sh.select(
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("__g").alias("__gb"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    rep_pairs = (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= min_jaccard)
    )
    if not collapsed:
        return rep_pairs.select("id_a", "id_b", "jaccard")

    # Expansion back to member pairs. Within a group every pair scores
    # exactly 1.0 and always collides (equal signatures => equal band
    # hashes); across groups candidate status and score are properties
    # of the rep pair, shared by every member pair.
    within = (
        members.select("__g", F.col(id_col).alias("id_a"))
        .join(members.select("__g", F.col(id_col).alias("id_b")), "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(F.lit(1.0), 4).alias("jaccard"))
    )
    cross = (
        rep_pairs.select("__ga", "__gb", "jaccard")
        .join(
            members.select(F.col("__g").alias("__ga"), F.col(id_col).alias("ma")),
            "__ga",
        )
        .join(
            members.select(F.col("__g").alias("__gb"), F.col(id_col).alias("mb")),
            "__gb",
        )
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard",
        )
    )
    return within.unionByName(cross)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    df_cap: int = 1000,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via a frequency-partitioned
    inverted-index join.

    A plain posting self-join costs Σ_s df(s)² — quadratic in the
    hottest shingle's document frequency, so one corpus-wide
    stop-phrase blows up at 100 TB. The index is split at ``df_cap``:

    - LIGHT shingles (df ≤ cap) self-join and count per-pair shared
      shingles exactly as the naive plan — but the cost is now bounded
      by cap · |postings|, linear in the corpus for fixed cap.
    - HEAVY shingles (df > cap) are few DISTINCT strings (corpus-wide
      boilerplate); each doc carries its small sorted set of them, and
      every candidate pair adds |heavy_a ∩ heavy_b| via an
      array_intersect of those bounded sets — never a posting join, so
      no df² term survives anywhere in the plan.

    Exactness: for every pair sharing at least one sub-cap shingle the
    jaccard is exact (light count + heavy intersect = true overlap).
    The one documented approximation: pairs whose overlap consists
    EXCLUSIVELY of above-cap shingles are dropped — at a sane cap that
    is two documents agreeing only on boilerplate, which is noise for
    dedup purposes. On any corpus whose hottest shingle stays under
    the cap (this fixture: max df 25) the output is identical to the
    naive plan, oracle-certified.
    """
    full = _ngram_overlap_pairs(docs, id_col, text_col, df_cap)
    return (
        full.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_containment: float = 0.8,
    df_cap: int = 1000,
) -> DataFrame:
    """EXACT asymmetric n-gram containment pairs — the quote/subset
    detector a dedup pass runs alongside Jaccard: containment
    ``|S(A)∩S(B)| / min(|S(A)|, |S(B)|)`` flags a short document whose
    shingles are (mostly) a subset of a longer one even when the
    symmetric Jaccard is far below any dedup threshold, which is how
    wholesale quoting / boilerplate-wrapped reposts hide from
    Jaccard-only dedup.

    Same frequency-partitioned inverted-index core as
    ``ngram_jaccard_pairs`` (one shingle-keyed exchange, df-capped
    light self-join + bounded heavy-set intersect — no df² term), so
    the 100 TB posture is identical; only the final measure differs.
    """
    full = _ngram_overlap_pairs(docs, id_col, text_col, df_cap)
    return (
        full.withColumn(
            "containment",
            F.round(F.col("n_inter") / F.least("n_a", "n_b"), 4),
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "n_a", "n_b", "containment")
    )


def _ngram_overlap_pairs(
    docs: DataFrame, id_col: str, text_col: str, df_cap: int
) -> DataFrame:
    """Shared core of the exact n-gram pair measures: candidate pairs
    with exact overlap counts ``(id_a, id_b, n_a, n_b, n_inter)`` via
    the frequency-partitioned inverted index (see
    ``ngram_jaccard_pairs`` for the full scale argument)."""
    from pyspark.sql import Window

    sh = doc_shingles(docs, id_col, text_col)
    # The posting list feeds three branches: both sides of the light
    # self-join and the heavy-set rollup. Document frequency comes from
    # a count window over the shingle partitioning — NOT a separate
    # groupBy + join — so all three branches sit on ONE exchange
    # (hashpartitioning(shingle)) that Spark reuses, and the self-join
    # below needs no further shuffle of the postings.
    from pyspark import StorageLevel

    # The Arrow shingle kernel and the df-tag window feed FIVE plan
    # branches (both sides of the light self-join, the heavy rollup —
    # and the callers may join the shingle frame again for verify).
    # Without eager materialization every concurrently-launched scan
    # stage re-runs the kernel + window before a lazy cache could fill
    # (the minhash_lsh_pairs materialization argument). ``tagged`` is
    # the inverted index itself — exactly the intermediate you'd keep
    # resident at scale; the bounded count that fills the cache costs
    # one pass and saves up to three.
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    posts = sh.select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    tagged = posts.withColumn(
        "df", F.count("*").over(Window.partitionBy("shingle"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tagged.count()

    lite = tagged.filter(F.col("df") <= df_cap)
    a = lite.select(
        "shingle", F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    b = lite.select(
        "shingle", F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("c_light"))
    )

    hot_sets = (
        tagged.filter(F.col("df") > df_cap)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("shingle")).alias("hot"))
    )
    pa = hot_sets.select(F.col(id_col).alias("id_a"), F.col("hot").alias("hot_a"))
    pb = hot_sets.select(F.col(id_col).alias("id_b"), F.col("hot").alias("hot_b"))
    full = (
        pairs.join(pa, "id_a", "left")
        .join(pb, "id_b", "left")
        .withColumn(
            "c_heavy",
            F.when(
                F.col("hot_a").isNull() | F.col("hot_b").isNull(), F.lit(0)
            ).otherwise(F.size(F.array_intersect("hot_a", "hot_b"))),
        )
        .withColumn("n_inter", F.col("c_light") + F.col("c_heavy"))
    )
    try:
        # The candidate-pair frame is bounded by true near-dup density —
        # tiny next to the postings. Materialize it so the big cached
        # intermediates can be dropped NOW instead of leaking blocks
        # into a long-lived session. localCheckpoint, not persist: a
        # returned persisted frame pins CacheManager blocks forever,
        # while checkpoint blocks are context-cleaned once the caller
        # drops the DataFrame (repeat invocations don't accumulate).
        full = full.localCheckpoint(eager=True)
        return full
    finally:
        sh.unpersist()
        tagged.unpersist()


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


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash): per-doc 16-bit signature as a bit string.

    Same vote semantics as ``simhash16``, computed per Arrow batch in
    Python (one md5 per word, 16 hex-digit votes); only the 16-char
    signature leaves the worker."""

    def gen(batches):
        import numpy as np
        from collections import Counter

        md5 = hashlib.md5
        odd = set(HEX_ODD)
        # Word → ±1 vote vector memo: corpus vocabulary is tiny next to
        # total word count, so this drops md5 work by orders of
        # magnitude; Counter folds repeated words into one scaled add.
        memo: dict = {}
        for pdf in batches:
            ids, sigs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                votes = np.zeros(16, dtype=np.int64)
                for w, n in Counter(t.lower().split(" ")).items():
                    v = memo.get(w)
                    if v is None:
                        h = md5(w.encode()).hexdigest()
                        v = np.array(
                            [1 if h[p] in odd else -1 for p in range(16)],
                            dtype=np.int64,
                        )
                        if len(memo) < 2_000_000:  # bound worker memory
                            memo[w] = v
                    votes += n * v
                ids.append(i)
                sigs.append("".join("1" if v > 0 else "0" for v in votes))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "simhash": sigs}
            )

    return _spread(docs.select(id_col, text_col)).mapInPandas(
        gen, schema=f"{id_col} long, simhash string"
    )


def simhash_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash, n_same): per-doc signature plus its bucket size —
    hamming-0 dedup (``simhash_band_pairs`` is the hamming>0 path).

    The bucket-size join stays in Spark (one shuffle on the signature)."""
    sh = simhash_signatures(docs, id_col, text_col)
    sizes = sh.groupBy("simhash").agg(F.count("*").alias("n_same"))
    return sh.join(sizes, "simhash").select(id_col, "simhash", "n_same")


def hamming_bits(a: Column | str, b: Column | str, width: int = 16) -> Column:
    """Hamming distance between two ``width``-char bit strings as a flat
    per-position sum — portable to the DuckDB oracle verbatim, no bit
    twiddling on string-encoded signatures."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    terms = [
        F.when(a.substr(p, 1) != b.substr(p, 1), F.lit(1)).otherwise(F.lit(0))
        for p in range(1, width + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming16(a: Column | str, b: Column | str) -> Column:
    """16-bit form of ``hamming_bits`` (kept for the signature tests)."""
    return hamming_bits(a, b, 16)


def simhash64_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash64): 64-bit SimHash as a bit string — the
    production-width signature (16 bits saturates: on a 5k-doc corpus a
    16-bit space already collapses distinct content into shared
    signatures; 64 bits keeps hamming distance meaningful at corpus
    scale). Bit p votes by bit ``p%4`` of hex digit ``p//4`` of
    md5(word) — derived from the HEX STRING exactly as the DuckDB
    oracle derives it, so signatures match bit-for-bit."""

    def gen(batches):
        import numpy as np
        from collections import Counter

        md5 = hashlib.md5
        memo: dict = {}
        for pdf in batches:
            ids, sigs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                votes = np.zeros(64, dtype=np.int64)
                for w, n in Counter(t.lower().split(" ")).items():
                    v = memo.get(w)
                    if v is None:
                        h = md5(w.encode()).hexdigest()
                        v = np.array(
                            [
                                1
                                if (int(h[p // 4], 16) >> (3 - p % 4)) & 1
                                else -1
                                for p in range(64)
                            ],
                            dtype=np.int64,
                        )
                        if len(memo) < 2_000_000:
                            memo[w] = v
                    votes += n * v
                ids.append(i)
                sigs.append("".join("1" if v > 0 else "0" for v in votes))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "simhash64": sigs}
            )

    return _spread(docs.select(id_col, text_col)).mapInPandas(
        gen, schema=f"{id_col} long, simhash64 string"
    )


def simhash64_band_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, hamming): EXACT near-duplicate pairs with 64-bit
    SimHash hamming ≤ ``max_hamming`` via banded candidates — the true
    100 TB design. At 64-bit width mask enumeration explodes (C(64,3)
    ≈ 42k masks) but banding actually prunes: a 16-bit band match has
    probability ~2^-16 for unrelated docs, so the candidate join is
    output-sized. Pigeonhole keeps it exact for ``max_hamming`` <
    ``bands``; verification is the flat per-position hamming sum. All
    quadratic-ish work runs on DISTINCT signatures; doc fan-out is two
    signature equi-joins at the end, same-signature pairs emitted
    directly at hamming 0."""
    if max_hamming >= bands:
        raise ValueError(
            f"banded candidates are exact only for max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    width = 64 // bands
    # Eagerly materialize the signature cache: five downstream branches
    # (distinct sigs, both fan-out sides, both same-sig sides) read it
    # inside ONE action, and a lazily-persisted frame gets recomputed by
    # each concurrently-launched stage before the cache fills — that
    # races the (Python) signature kernel 4-5×. One bounded count fills
    # the cache first.
    sh = simhash64_signatures(docs, id_col, text_col).persist()
    sh.count()

    # Candidate generation runs on INTEGER band words, not bit strings:
    # each distinct signature parses once into ``bands`` longs, the
    # band join keys on (band, long) instead of a 16-char string, and
    # hamming is Σ bit_count(wᵢ_a XOR wᵢ_b) — a handful of codegen'd
    # integer ops per candidate instead of 64 substring compares. On a
    # correlated corpus (skewed band buckets → large candidate
    # multiset) this is what keeps the verify step cheap; the dedupe
    # runs after the hamming filter, on the tiny survivor set.
    wcols = [
        F.conv(F.expr(f"substring(simhash64, {i * width + 1}, {width})"), 2, 10)
        .cast("long")
        .alias(f"w{i}")
        for i in range(bands)
    ]
    usig = sh.select("simhash64").distinct().select("simhash64", *wcols).persist()
    usig.count()
    warr = F.array(*[f"w{i}" for i in range(bands)])
    ent = usig.withColumn(
        "band", F.explode(F.array(*[F.lit(i) for i in range(bands)]))
    ).withColumn("bv", F.element_at(warr, F.col("band") + 1))
    a = ent.select(
        F.col("simhash64").alias("sig_a"),
        *[F.col(f"w{i}").alias(f"wa{i}") for i in range(bands)],
        "band",
        "bv",
    )
    b = ent.select(
        F.col("simhash64").alias("sig_b"),
        *[F.col(f"w{i}").alias(f"wb{i}") for i in range(bands)],
        "band",
        "bv",
    )
    ham = None
    for i in range(bands):
        t = F.bit_count(F.col(f"wa{i}").bitwiseXOR(F.col(f"wb{i}")))
        ham = t if ham is None else ham + t
    sig_pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("sig_a") < F.col("sig_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("sig_a", "sig_b", "hamming")
        .distinct()
    )
    ma = sh.select(F.col("simhash64").alias("sig_a"), F.col(id_col).alias("ida"))
    mb = sh.select(F.col("simhash64").alias("sig_b"), F.col(id_col).alias("idb"))
    cross = (
        sig_pairs.join(ma, "sig_a")
        .join(mb, "sig_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "hamming",
        )
    )
    same = (
        sh.select("simhash64", F.col(id_col).alias("ida"))
        .join(sh.select("simhash64", F.col(id_col).alias("idb")), "simhash64")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.col("ida").alias("id_a"),
            F.col("idb").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    return cross.unionByName(same)


def simhash_band_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
    bands: int = 4,  # retained for API compat; enumeration needs no bands
) -> DataFrame:
    """(id_a, id_b, hamming): EXACT near-duplicate pairs with signature
    hamming distance ≤ ``max_hamming`` — the hamming>0 scale path
    ``simhash_groups`` points to. Candidate generation is mask
    enumeration over DISTINCT signatures (see inline comment); at a
    64-bit signature width banding would return as the pruning step,
    which is why the banded name stays.

    DOCUMENTED BOUND (VERDICT r7): a 16-bit signature is a TEST-WIDTH
    sketch — its 65,536-value space saturates once the corpus passes
    ~10⁵ docs, after which the TRUE hamming≤2 pair set (this
    operator's defined output) grows ~n²/2^16; sf100 measured the wall
    tracking that output (594 s / 11.1× on a 10× step, plan clean, no
    anti-pattern — any correct plan must emit those pairs). Past that
    corpus size use ``simhash64_band_pairs``: identical banding
    machinery at production width, certified ≤10×/decade through sf100
    (SCALING.md bound row).
    """
    if max_hamming > 3:
        raise ValueError(
            f"mask enumeration is bounded only for max_hamming <= 3 "
            f"(C(16,h) masks per signature; got max_hamming={max_hamming})"
        )
    # Eager materialization: see simhash64_band_pairs — concurrent
    # stages would otherwise race the signature kernel.
    sh = simhash_signatures(docs, id_col, text_col).persist()
    sh.count()

    # All hamming work runs on DISTINCT signatures — bounded by 2^16
    # corpus-wide, so the candidate step has a CONSTANT ceiling no
    # matter the corpus size; doc-level fan-out happens only at the
    # end, via two equi-joins on the signature.
    #
    # Candidates come from exact MASK ENUMERATION, not banding: each
    # distinct signature emits every signature within ``max_hamming``
    # bit flips (Σ C(16,h) ≤ 697 masks), and a plain identity
    # equi-join against the signature list finds exactly the true
    # pairs — each once, since the flip mask IS the pair's XOR — with
    # the hamming distance known at generation. Banding on 4-bit bands
    # prunes almost nothing at this signature width (40% of all
    # signature pairs share a band at sf0.1); enumeration replaces a
    # near-quadratic candidate set + verify with output-sized work.
    usig = sh.select("simhash").distinct()

    def enumerate_flips(batches):
        def flip(s: str, i: int) -> str:
            return s[:i] + ("1" if s[i] == "0" else "0") + s[i + 1 :]

        for pdf in batches:
            sig, flipped, ham = [], [], []
            for s in pdf["simhash"] if max_hamming >= 1 else ():
                for i in range(16):
                    f1 = flip(s, i)
                    sig.append(s)
                    flipped.append(f1)
                    ham.append(1)
                    if max_hamming >= 2:
                        for j in range(i + 1, 16):
                            f2 = flip(f1, j)
                            sig.append(s)
                            flipped.append(f2)
                            ham.append(2)
                            if max_hamming >= 3:
                                for k in range(j + 1, 16):
                                    sig.append(s)
                                    flipped.append(flip(f2, k))
                                    ham.append(3)
            yield pd.DataFrame(
                {"sig_a": sig, "sig_b": flipped, "hamming": ham}
            )

    flips = usig.mapInPandas(
        enumerate_flips, schema="sig_a string, sig_b string, hamming int"
    )
    # sig_a < sig_b keeps each unordered pair once (every true pair is
    # generated from both endpoints' mask sets).
    sig_pairs = flips.join(
        usig.select(F.col("simhash").alias("sig_b")), "sig_b"
    ).filter(F.col("sig_a") < F.col("sig_b"))

    # Cross-signature doc pairs: each qualifying signature pair fans
    # out to its member docs (a doc has exactly one signature, so no
    # pair is emitted twice); normalize id order after the fan-out.
    ma = sh.select(F.col("simhash").alias("sig_a"), F.col(id_col).alias("ida"))
    mb = sh.select(F.col("simhash").alias("sig_b"), F.col(id_col).alias("idb"))
    cross = (
        sig_pairs.join(ma, "sig_a")
        .join(mb, "sig_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "hamming",
        )
    )
    # Same-signature doc pairs are hamming 0 by construction.
    same = (
        sh.select("simhash", F.col(id_col).alias("ida"))
        .join(sh.select("simhash", F.col(id_col).alias("idb")), "simhash")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.col("ida").alias("id_a"),
            F.col("idb").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    return cross.unionByName(same)


def cross_minhash_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Batch-vs-corpus near-dup: which incoming docs near-duplicate an
    EXISTING doc. The batch analog of ``streaming.dedup`` (same LSH
    collision semantics), and the admission gate a crawl refresh runs
    before appending to a 100 TB corpus.

    Returns (corpus_id, batch_id, jaccard ≥ threshold, 4 dp). Candidates
    come only from cross-side band collisions — the big corpus side is
    never self-joined, so cost is |batch-collisions|, not |corpus|²;
    at scale the corpus band entries are a precomputed table (see
    ``streaming/store.py``) and only the batch side pays signature work
    per run."""
    from pyspark import StorageLevel

    sh_c = doc_shingles(corpus, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    sh_b = doc_shingles(batch, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    bands_c = minhash_band_entries(sh_c, id_col, num_hashes, bands)
    bands_b = minhash_band_entries(sh_b, id_col, num_hashes, bands)
    candidates = (
        bands_c.select("band", "band_hash", F.col(id_col).alias("corpus_id"))
        .join(
            bands_b.select("band", "band_hash", F.col(id_col).alias("batch_id")),
            ["band", "band_hash"],
        )
        .select("corpus_id", "batch_id")
        .distinct()
    )
    a = sh_c.select(F.col(id_col).alias("corpus_id"), F.col("shingles").alias("sh_a"))
    b = sh_b.select(F.col(id_col).alias("batch_id"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(a, "corpus_id")
        .join(b, "batch_id")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("corpus_id", "batch_id", "jaccard")
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via PREFIX FILTERING (the
    PPJoin/AllPairs candidate bound, Xiao et al. 2008 / Bayardo et al.
    2007) — no df-cap caveat: unlike ``ngram_jaccard_pairs`` this path
    drops NOTHING, whatever the corpus's hot-shingle profile.

    The bound: order every document's shingles rarest-first (global
    document frequency, shingle tiebreak) and index only the first
    ``|A| - ceil(tau*|A|) + 1`` of them. If J(A,B) >= tau then
    |A∩B| >= tau*|A∪B| >= tau*|A|; a pair sharing NO prefix shingle of
    A can only intersect inside A's suffix of length ceil(tau*|A|)-1 —
    contradiction. So joining prefixes against prefixes generates a
    candidate SUPERSET, and one exact verify on the full shingle sets
    (array_intersect) finishes the job.

    Scale posture: the posting self-join runs only over PREFIX
    postings, which by construction prefer the rarest shingles — the
    df² blow-up of hot shingles never enters the join because hot
    shingles land in suffixes (a doc carries one in its prefix only if
    rarer shingles ran out, i.e. the doc is nearly all boilerplate).
    Shuffles: the posting exchanges carry an 8-byte xxhash64 DIGEST of
    each shingle, not the ~40-byte string — the sf100 probe's third
    decade exhausted local shuffle disk on the string-keyed exchanges.
    The PPJoin bound only needs A consistent global shingle order, so
    (df, digest) works as well as (df, string); a digest collision can
    only merge two shingles' df counts and ADD candidates — the exact
    verify on the true string sets kills them, so emitted pairs are
    unchanged. The verify join fetches shingle arrays ONLY for docs
    that appear in some candidate (broadcast semi-join on the small
    candidate-id set) instead of shuffling every doc's array into the
    SMJ. Verify cost is O(candidates · avg set size).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # The shingle frame feeds three consumers (postings + both sides of
    # the verify join) and the Arrow shingle kernel is the dominant
    # per-row cost — same materialization argument as the MinHash path
    # above.
    sh = doc_shingles(docs, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    posts = sh.select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    ).select(
        id_col, "n_sh", F.xxhash64("shingle").alias("dig")
    )
    tagged = posts.withColumn(
        "df", F.count("*").over(Window.partitionBy("dig"))
    )
    # Float guard for every tau-derived integer bound below: binary
    # floats round thresholds like 0.8 UP (5*0.8 -> 4.000000000000001),
    # so a raw F.ceil lands one above the exact bound and silently
    # prunes exact-boundary true pairs (|A|=5, |B|=4 at J=0.8). The
    # epsilon is subtracted in the SAFE direction everywhere — a
    # too-long prefix / too-low overlap bound only admits extra
    # candidates, and the exact verify kills those for free. 1e-9
    # exceeds the float64 rounding error of tau*n for any corpus-sized
    # n while staying far below 1/q for any plausible rational tau.
    _EPS = 1e-9
    tau = float(min_jaccard)
    # Rarest-first rank inside each document; keep the prefix only.
    rk = Window.partitionBy(id_col).orderBy("df", "dig")
    prefix = (
        tagged.withColumn("rk", F.row_number().over(rk))
        .filter(
            F.col("rk")
            <= F.col("n_sh")
            - F.ceil(F.lit(tau) * F.col("n_sh") - F.lit(_EPS))
            + 1
        )
        .select(id_col, "dig", "n_sh", "rk")
    )
    # Both sides of the candidate self-join scan the prefix postings;
    # eager materialization stops the two concurrent scan stages from
    # each re-running the df-tag + rank windows (two shuffles) before a
    # lazy cache could fill. The prefix is small by construction
    # (|A| - ceil(tau*|A|) + 1 entries per doc).
    prefix = prefix.persist(StorageLevel.MEMORY_AND_DISK)
    prefix.count()
    # PPJoin's LENGTH and POSITIONAL filters as residual join
    # predicates — both exact. Length: J>=tau forces
    # min(|A|,|B|) >= tau*max(|A|,|B|). Positional: per-doc ranks
    # preserve ONE consistent global order, so for the globally
    # smallest shared shingle (which the prefix theorem puts inside
    # both prefixes) every other shared shingle ranks later in BOTH
    # docs — overlap <= 1 + min(suffix lengths), which must reach
    # ceil(tau/(1+tau)*(|A|+|B|)). Without these, corpora whose
    # rare-shingle profile degrades (the sf100 fixture's salt
    # collisions raised prefix df from 1.2 to 7.1) blow the candidate
    # pair mass quadratically — measured 3.8M -> 477M on a 10x step.
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.dig") == F.col("b.dig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.n_sh") * tau - _EPS <= F.col("b.n_sh"))
            & (F.col("b.n_sh") * tau - _EPS <= F.col("a.n_sh"))
            & (
                F.least(
                    F.col("a.n_sh") - F.col("a.rk"),
                    F.col("b.n_sh") - F.col("b.rk"),
                )
                + 1
                >= F.ceil(
                    F.lit(tau / (1.0 + tau))
                    * (F.col("a.n_sh") + F.col("b.n_sh"))
                    - F.lit(_EPS)
                )
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.rk").alias("rk_a"),
            F.col("b.rk").alias("rk_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
    )
    # PPJoin+'s GROUPED positional filter — the distinct() step carries
    # the same shuffle anyway, so aggregate instead and prune before
    # the (array-weighted) verify join. For a pair, the c counted
    # shared-prefix shingles all precede every uncounted shared
    # shingle in the one consistent global order (an uncounted one
    # escaped a prefix, so its rank — hence its global position —
    # exceeds every counted one's), so
    # overlap <= c + min(n_a - max rk_a, n_b - max rk_b): exact. On
    # the sf100 fixture this is what kills the salt-collision
    # candidates (similar doc lengths neutralize the length filter;
    # a handful of mid-prefix shared shingles plus a short suffix
    # cannot reach the ceil(tau/(1+tau)(|A|+|B|)) overlap a true
    # near-dup needs) — 477M candidates, ~200k true pairs.
    cand = (
        cand.groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("c"),
            F.max("rk_a").alias("mra"),
            F.max("rk_b").alias("mrb"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .filter(
            F.col("c")
            + F.least(F.col("na") - F.col("mra"), F.col("nb") - F.col("mrb"))
            >= F.ceil(
                F.lit(tau / (1.0 + tau)) * (F.col("na") + F.col("nb"))
                - F.lit(_EPS)
            )
        )
        .select("id_a", "id_b")
    )
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    # Only docs that appear in some candidate pair need their shingle
    # array in the verify join — a broadcast semi-join (ids are 8 bytes
    # × ≤ 2·candidates, and candidates are bounded by true near-dup
    # density plus prefix noise) keeps the big array table OUT of the
    # shuffle entirely.
    need = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # The broadcast hint is GUARDED, not unconditional: on corpora
    # where the positional filters degrade (the sf100 fixture produced
    # 477M raw candidates before the grouped filter), the distinct id
    # set can outgrow driver/broadcast memory and an unguarded hint
    # fails the job instead of degrading to a shuffle. cand is already
    # persisted, so the count is one cheap cached pass; past the bound
    # the semi-join falls back to a shuffle join that AQE is free to
    # re-plan.
    n_need_pairs = cand.count()
    if n_need_pairs <= 2_000_000:  # ids ≤ 2·pairs, ~8 B each → ≤32 MB
        need = F.broadcast(need)
    sh_need = sh.join(need, id_col, "leftsemi")
    sa = sh_need.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh_need.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    try:
        out = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= min_jaccard)
            .select("id_a", "id_b", "jaccard")
        )
        # The verified pair list is tiny (bounded by true near-dup
        # density); materialize it so the big intermediates can be
        # dropped NOW instead of leaking cached blocks into a
        # long-lived session. localCheckpoint, not persist: checkpoint
        # blocks are context-cleaned once the caller drops the frame,
        # so repeat invocations don't accumulate cached blocks.
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        sh.unpersist()
        prefix.unpersist()
        cand.unpersist()
