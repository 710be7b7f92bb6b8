"""Certified queries for corpus-assembly operators (no reference
counterpart — BASELINE.json north star): repetition-based quality
filters, benchmark decontamination, deterministic train/val/test
split, concat-and-chunk sequence packing, PII redaction, and per-label
embedding centroids. Operators live in ``operators.text`` /
``operators.packing`` / ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import assign_split, pack_sequences, split_expr
from ..operators.similarity import label_centroids
from ..operators.text import decontaminate, redact_pii, repetition_features
from ..sources import load_table
from .registry import register

# DuckDB fragment: distinct word n-gram shingles of lower(text) —
# mirrors operators.dedup.word_shingles (n = 3).
_SH3_SQL = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(lower(text), ' ')) - 2, 0) + 1),
        i -> array_to_string((string_split(lower(text), ' '))[i:i+2], ' ')))
"""


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features + keep/drop verdict, computed
    as shuffle-free per-row sort+fold expressions."""
    return repetition_features(load_table(spark, sf_dir, "documents"))


register(
    "q_repetition_filter",
    q_repetition_filter,
    """
    WITH w AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS word,
               generate_subscripts(string_split(lower(text), ' '), 1) AS i
        FROM documents
    ),
    uni AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
    top1 AS (
        SELECT doc_id, max(c) AS top_c, sum(c) AS n, count(*) AS n_distinct
        FROM uni GROUP BY doc_id
    ),
    bg AS (
        SELECT a.doc_id, a.word || ' ' || b.word AS bigram
        FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
    top2 AS (SELECT doc_id, max(c) AS top_bc FROM bgc GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(t.n AS INTEGER) AS n_words,
           round(t.top_c * 1.0 / greatest(t.n, 1), 4) AS top_word_frac,
           round(coalesce(b.top_bc, 0) * 2.0 / greatest(t.n, 1), 4)
               AS top_bigram_frac,
           round(t.n_distinct * 1.0 / greatest(t.n, 1), 4) AS distinct_ratio,
           (round(t.top_c * 1.0 / greatest(t.n, 1), 4) <= 0.2
            AND round(coalesce(b.top_bc, 0) * 2.0 / greatest(t.n, 1), 4) <= 0.2
            AND round(t.n_distinct * 1.0 / greatest(t.n, 1), 4) >= 0.3) AS keep
    FROM top1 t LEFT JOIN top2 b ON t.doc_id = b.doc_id
    """,
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 3-gram
    with the held-out eval slice (doc_id % 97 == 0), via a broadcast
    of the eval shingle set — never corpus-to-corpus."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return decontaminate(docs.filter(~is_eval), docs.filter(is_eval), n=3)


register(
    "q_decontaminate",
    q_decontaminate,
    f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SH3_SQL}) AS shingle FROM documents
    ),
    bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    )
    SELECT sh.doc_id, count(DISTINCT sh.shingle) AS n_hit_shingles
    FROM sh JOIN bench USING (shingle)
    WHERE sh.doc_id % 97 != 0
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
)


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket train/val/test assignment (75/12.5/
    12.5) — stable under corpus growth, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_split(docs)


register(
    "q_split_assign",
    q_split_assign,
    """
    SELECT doc_id, source,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 2048-token windows: global token
    offsets via the two-phase (per-block + broadcast offsets) prefix
    sum — no single-partition window over the corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return pack_sequences(docs, token_col="n_tokens", capacity=2048)


register(
    "q_pack_sequences",
    q_pack_sequences,
    """
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id,
           (cum - n_tokens) // 2048 != (cum - 1) // 2048 AS crosses_boundary
    FROM c
    """,
)


def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub certification. The fixture corpus is digit-free word
    soup, so a deterministic contact line (email + phone derived from
    doc_id) is appended first — then both engines must agree on the
    match counts and the md5 of the redacted text."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail-"),
            F.col("source"),
            F.lit(".com or 555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    return redact_pii(docs)


register(
    "q_redact",
    q_redact,
    """
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail-' || source || '.com or 555-'
                    || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
        FROM documents
    ),
    e AS (
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]+')) AS n_emails,
               regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]+',
                              '<EMAIL>', 'g') AS no_email
        FROM aug
    )
    SELECT doc_id,
           CAST(n_emails AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(no_email, '[0-9]{3}-[0-9]{3,}'))
                AS INTEGER) AS n_phones,
           md5(regexp_replace(no_email, '[0-9]{3}-[0-9]{3,}', '<PHONE>', 'g'))
               AS clean_hash
    FROM e
    """,
)


def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, exploded (label, pos, centroid) —
    the keyed (label, pos) hash aggregation with map-side combine."""
    return label_centroids(load_table(spark, sf_dir, "embeddings"))


register(
    "q_centroids",
    q_centroids,
    """
    SELECT label, CAST(t.range AS INTEGER) AS pos,
           -- + 0.0 normalizes -0.0 (DuckDB renders signed zero at
           -- larger SF; Spark's round() does not — caught at sf0.1)
           round(avg(CAST(embedding[t.range + 1] AS DOUBLE)), 4) + 0.0
               AS centroid
    FROM embeddings, range(0, 64) t
    GROUP BY label, t.range
    """,
)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style fluency gate: mean log-probability of each document's
    words under the corpus's own unigram distribution
    (operators.text.unigram_logprob)."""
    from ..operators.text import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents"))


register(
    "q_unigram_logprob",
    q_unigram_logprob,
    """
    WITH w AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
    ),
    w2 AS (SELECT * FROM w WHERE word <> ''),
    tot AS (SELECT count(*) AS n FROM w2),
    freq AS (SELECT word, count(*) AS c FROM w2 GROUP BY word)
    SELECT w2.doc_id, count(*) AS n_words,
           round(avg(ln(CAST(freq.c AS DOUBLE) / tot.n)), 4) AS avg_logprob
    FROM w2 JOIN freq USING (word), tot
    GROUP BY w2.doc_id
    """,
)


SAMPLE_WEIGHTED_K = 100


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sampling without replacement
    (Efraimidis–Spirakis A-Res): each doc draws u from md5(doc_id) (a
    seedless uniform both engines reproduce bit-for-bit) and keeps key
    u^(1/w) with w = text length; the k largest keys are the sample —
    longer docs proportionally likelier, exactly the quality- or
    length-weighted subsampling a training-data mix needs. The top-k is
    orderBy+limit, so Spark plans TakeOrderedAndProject (distributed
    partial top-k, no single-partition window); keys are rounded to
    10 dp so libm pow ulp differences can't flip the ranking across
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = F.length("text").cast("double")
    key = F.round(F.pow((h + F.lit(1)) / F.lit(4294967297.0), F.lit(1.0) / w), 10)
    return (
        docs.select(
            "doc_id", w.alias("weight"), key.alias("skey")
        )
        .orderBy(F.desc("skey"), "doc_id")
        .limit(SAMPLE_WEIGHTED_K)
    )


register(
    "q_sample_weighted",
    q_sample_weighted,
    f"""
    WITH s AS (
        SELECT doc_id, CAST(length(text) AS DOUBLE) AS weight,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS UBIGINT) + 1) / 4294967297.0 AS u
        FROM documents
    )
    SELECT doc_id, weight, round(pow(u, 1.0 / weight), 10) AS skey
    FROM s
    ORDER BY skey DESC, doc_id
    LIMIT {SAMPLE_WEIGHTED_K}
    """,
)


DRIFT_TOP = 50
PPM = 1_000_000


def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val token-distribution drift monitor: per token, its
    occurrence rate in each md5-split as EXACT integer parts-per-million
    (count·10⁶ div split-total — integer division, so the statistic is
    bit-identical across engines and fold orders), top-50 by absolute
    rate difference. The split totals are one bounded driver action
    (two longs) turned into literals, the same corpus-totals posture as
    TF-IDF; everything else is one token explode + one keyed hash agg +
    a distributed top-k — no full sort, no float anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        split_expr("doc_id").alias("split"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("split") != "test")
    counts = tok.groupBy("token").agg(
        F.count_if(F.col("split") == "train").alias("c_train"),
        F.count_if(F.col("split") == "val").alias("c_val"),
    )
    tot = counts.agg(
        F.sum("c_train").alias("nt"), F.sum("c_val").alias("nv")
    ).first()
    ppm_t = F.expr(f"c_train * {PPM} div {int(tot['nt'])}")
    ppm_v = F.expr(f"c_val * {PPM} div {int(tot['nv'])}")
    return (
        counts.select(
            "token",
            "c_train",
            "c_val",
            ppm_t.alias("ppm_train"),
            ppm_v.alias("ppm_val"),
            F.abs(ppm_t - ppm_v).alias("ppm_diff"),
        )
        .orderBy(F.desc("ppm_diff"), "token")
        .limit(DRIFT_TOP)
    )


_SPLIT_SQL = """
    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
         ELSE 'test' END
"""

register(
    "q_token_drift",
    q_token_drift,
    f"""
    WITH tok AS (
        SELECT {_SPLIT_SQL} AS split,
               unnest(string_split(lower(text), ' ')) AS token
        FROM documents
        WHERE {_SPLIT_SQL} <> 'test'
    ),
    counts AS (
        SELECT token,
               count(*) FILTER (WHERE split = 'train') AS c_train,
               count(*) FILTER (WHERE split = 'val') AS c_val
        FROM tok GROUP BY token
    ),
    tot AS (SELECT sum(c_train) AS nt, sum(c_val) AS nv FROM counts)
    SELECT token, c_train, c_val,
           CAST(c_train * {PPM} // nt AS BIGINT) AS ppm_train,
           CAST(c_val * {PPM} // nv AS BIGINT) AS ppm_val,
           CAST(abs(c_train * {PPM} // nt - c_val * {PPM} // nv) AS BIGINT)
               AS ppm_diff
    FROM counts, tot
    ORDER BY ppm_diff DESC, token
    LIMIT {DRIFT_TOP}
    """,
)


CHUNK_WORDS = 64
CHUNK_STRIDE = 48  # 16-word overlap between consecutive chunks


def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking with overlap — the embedding/RAG preprocessing
    step: fixed word windows (64 words, stride 48) per document, final
    partial window kept. Pure narrow per-row explode (fan-out =
    ceil(words/stride), data-independent per row) — zero shuffle, so it
    composes with any downstream embed/dedup stage for free."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = docs.select(
        "doc_id", words.alias("w"), F.posexplode(starts).alias("chunk_idx", "start_word")
    )
    chunk = F.slice(F.col("w"), F.col("start_word"), CHUNK_WORDS)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "start_word",
        F.size(chunk).alias("n_words"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


register(
    "q_chunking",
    q_chunking,
    f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words
        FROM documents WHERE text IS NOT NULL
    ),
    starts AS (
        SELECT doc_id, words,
               unnest(range(1, greatest(len(words), 1) + 1, {CHUNK_STRIDE}))
                   AS start_word
        FROM w
    )
    SELECT doc_id,
           CAST((start_word - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(start_word AS INTEGER) AS start_word,
           len(words[start_word : start_word + {CHUNK_WORDS} - 1]) AS n_words,
           array_to_string(words[start_word : start_word + {CHUNK_WORDS} - 1], ' ')
               AS chunk_text
    FROM starts
    """,
)


VOCAB_MIN_COUNT = 5
VOCAB_TOP = 200


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary builder: corpus-wide term and document
    frequencies, a min-count floor (hapax/noise cut), top-``VOCAB_TOP``
    by frequency. One explode feeding ONE composite hash agg keyed on
    the term — ``count(*)`` and ``count(distinct doc_id)`` share the
    exchange — then a distributed top-k (TakeOrderedAndProject). At
    100 TB this is the canonical two-phase vocab count: partial maps
    combine per executor before the single term-keyed shuffle; the
    min-count floor drops the long tail BEFORE the top-k heap."""
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(
            F.count("*").alias("term_count"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("term_count") >= VOCAB_MIN_COUNT)
        .orderBy(F.desc("term_count"), "word")
        .limit(VOCAB_TOP)
    )


register(
    "q_vocab",
    q_vocab,
    f"""
    WITH words AS (
        SELECT doc_id, w AS word
        FROM documents, unnest(string_split(lower(text), ' ')) AS t(w)
        WHERE w != ''
    )
    SELECT word, count(*) AS term_count,
           count(DISTINCT doc_id) AS doc_freq
    FROM words
    GROUP BY word
    HAVING count(*) >= {VOCAB_MIN_COUNT}
    ORDER BY term_count DESC, word
    LIMIT {VOCAB_TOP}
    """,
)


def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weighting: per-source whitespace-token totals
    and the up/down-sampling weight that equalizes each source's share
    of the token budget — weight = total / (n_sources · src_tokens),
    division-free until one final double op over exact BIGINT counts.
    The fact side collapses in ONE source-keyed agg; the global totals
    ride an unpartitioned window over the agg output, which is
    dimension-sized (one row per source), so the SinglePartition
    exchange moves a handful of rows, never the corpus."""
    toks = F.size(F.split(F.col("text"), " "))
    per_source = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(toks.cast("bigint")).alias("src_tokens"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    return per_source.select(
        "source",
        "src_tokens",
        (
            F.col("src_tokens").cast("double")
            / F.sum("src_tokens").over(w).cast("double")
        ).alias("tok_share"),
        (
            F.sum("src_tokens").over(w).cast("double")
            / (F.count("*").over(w) * F.col("src_tokens")).cast("double")
        ).alias("mix_weight"),
    ).orderBy("source")


register(
    "q_mixture",
    q_mixture,
    """
    WITH per_source AS (
        SELECT source,
               CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
                   AS src_tokens
        FROM documents GROUP BY source
    )
    SELECT source, src_tokens,
           CAST(src_tokens AS DOUBLE)
               / CAST(sum(src_tokens) OVER () AS DOUBLE) AS tok_share,
           CAST(sum(src_tokens) OVER () AS DOUBLE)
               / CAST(count(*) OVER () * src_tokens AS DOUBLE) AS mix_weight
    FROM per_source
    ORDER BY source
    """,
)


def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations: PMI of adjacent word pairs seen ≥ 10 times
    (operators.text.collocation_pmi) — the phrase-mining signal a
    tokenizer/vocab pipeline uses to promote multi-word units."""
    from ..operators.text import collocation_pmi

    return collocation_pmi(load_table(spark, sf_dir, "documents"), min_count=10)


register(
    "q_pmi",
    q_pmi,
    """
    WITH w AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS word,
               generate_subscripts(string_split(lower(text), ' '), 1) AS i
        FROM documents
    ),
    bg AS (
        SELECT a.word AS w1, b.word AS w2
        FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE a.word != '' AND b.word != ''
    ),
    uni AS (SELECT word, count(*) AS c FROM w WHERE word != '' GROUP BY word),
    pair AS (SELECT w1, w2, count(*) AS pair_count FROM bg GROUP BY w1, w2),
    tot AS (
        SELECT (SELECT count(*) FROM w WHERE word != '') AS n_words,
               (SELECT count(*) FROM bg) AS n_bigrams
    )
    SELECT p.w1, p.w2, p.pair_count, u1.c AS c1, u2.c AS c2,
           round(ln((p.pair_count / CAST(t.n_bigrams AS DOUBLE))
                    / ((u1.c / CAST(t.n_words AS DOUBLE))
                       * (u2.c / CAST(t.n_words AS DOUBLE)))), 4) + 0.0 AS pmi
    FROM pair p
    JOIN uni u1 ON u1.word = p.w1
    JOIN uni u2 ON u2.word = p.w2
    CROSS JOIN tot t
    WHERE p.pair_count >= 10
    """,
)


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-tokenizer token counts: BPE merges trained on a bounded
    deterministic sample (driver-side, the IVF-k-means posture), then
    applied corpus-wide by an Arrow kernel (operators.bpe). Rows-only
    by design — iterative BPE training is not SQL-expressible; the
    encode invariants (concat restores the word, determinism across
    partitionings, compression vs character count) are pinned by
    tests/test_bpe.py."""
    from ..operators.bpe import bpe_encode, train_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, num_merges=100, sample_docs=1000)
    return bpe_encode(docs, merges).select(
        "doc_id", "n_words", "n_tokens"
    )


register("q_bpe_tokens", q_bpe_tokens)  # rows-only: iterative training


# Distinct name: this module previously REBOUND VOCAB_TOP here, which
# silently changed q_vocab's call-time .limit() to 1000 while its
# oracle SQL had frozen 200 at registration — invisible until the sf1
# fixture's vocabulary outgrew both limits (sf1 strict sweep catch).
COVERAGE_VOCAB_TOP = 1000


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit — the tokenizer-sizing readout: with
    the corpus top-{COVERAGE_VOCAB_TOP} word vocabulary (count desc, word asc —
    deterministic), each SOURCE's covered vs out-of-vocabulary token
    occurrences and the exact coverage ratio. A source with high OOV
    under the shared vocab needs byte-fallback or its own merges. One
    token explode feeds both the vocab ranking (corpus-keyed agg +
    top-V) and the per-source rollup (broadcast semi-join against the
    V-sized vocab) — never a corpus×vocab product."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = (
        tok.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(COVERAGE_VOCAB_TOP)
        .select("word")
    )
    flagged = tok.join(
        F.broadcast(vocab.withColumn("__in", F.lit(True))), "word", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("__in").isNotNull()).alias("n_covered"),
        )
        .select(
            "source",
            "n_tokens",
            "n_covered",
            (F.col("n_tokens") - F.col("n_covered")).alias("n_oov"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_tokens").cast("double"),
                4,
            ).alias("coverage"),
        )
    )


register(
    "q_vocab_coverage",
    q_vocab_coverage,
    f"""
    WITH tok AS (
        SELECT source, w AS word
        FROM documents, unnest(string_split(lower(text), ' ')) AS t(w)
        WHERE w != ''
    ),
    vocab AS (
        SELECT word FROM (
            SELECT word, count(*) AS n FROM tok GROUP BY word
            ORDER BY n DESC, word LIMIT {COVERAGE_VOCAB_TOP}
        )
    )
    SELECT source,
           count(*) AS n_tokens,
           CAST(count(*) FILTER (WHERE word IN (SELECT word FROM vocab))
                AS BIGINT) AS n_covered,
           CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM vocab))
                AS BIGINT) AS n_oov,
           round(CAST(count(*) FILTER (WHERE word IN (SELECT word FROM vocab))
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS coverage
    FROM tok
    GROUP BY source
    """,
)
