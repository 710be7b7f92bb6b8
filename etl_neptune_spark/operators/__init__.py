from .components import (
    bfs_hops,
    connected_components,
    kcore,
    pagerank,
    temporal_reach,
    triangle_counts,
)
from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64_band_pairs,
    simhash_band_pairs,
    simhash_groups,
)
from .degrees import degree_metrics
from .gc import gc_stale
from .merge import merge_keyed
from .packing import assign_split, pack_sequences
from .incremental import merge_states, partial_state
from .similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
)
from .text import (
    curate_corpus,
    decontaminate,
    lang_id,
    quality_score,
    redact_pii,
    tfidf_top_terms,
    unigram_logprob,
)
from .timeseries import asof_join, bucketed_range_join, scd2_compact, sessionize

__all__ = [
    "asof_join",
    "assign_split",
    "bfs_hops",
    "brute_force_topk",
    "bucketed_range_join",
    "connected_components",
    "cosine_neardup_pairs",
    "curate_corpus",
    "decontaminate",
    "degree_metrics",
    "exact_dedup",
    "gc_stale",
    "ivf_topk",
    "ivfpq_topk",
    "kcore",
    "lang_id",
    "lsh_topk",
    "merge_keyed",
    "merge_states",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "pagerank",
    "partial_state",
    "quality_score",
    "redact_pii",
    "scd2_compact",
    "sessionize",
    "simhash64_band_pairs",
    "simhash_band_pairs",
    "simhash_groups",
    "temporal_reach",
    "tfidf_top_terms",
    "triangle_counts",
    "unigram_logprob",
]
