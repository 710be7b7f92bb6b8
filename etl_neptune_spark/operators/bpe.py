"""Byte-pair-encoding tokenizer: bounded driver-side training,
distributed Arrow-kernel application.

No reference counterpart (BASELINE.json north-star territory): a
training-data pipeline reports token counts under the TARGET MODEL'S
tokenizer, not whitespace counts. The deployment shape mirrors how
production pipelines (and this repo's IVF k-means,
operators/similarity.py) handle learned state at 100 TB: the model is
TRAINED on a bounded sample driver-side — tokenizer training corpora
are capped in practice too — then the learned merge table (a few
thousand short string pairs) broadcasts to every executor and the
corpus-wide APPLY is embarrassingly parallel, one Arrow batch at a
time, with a per-worker word→tokens memo (natural-language word
frequency follows Zipf, so the memo hit rate is high and its size is
bounded by distinct words seen per worker).

Determinism: greedy standard BPE with lexicographic pair tie-breaks —
same sample → same merges, any partitioning → same encoding. BPE
invariant: token concatenation restores the word (property-tested).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, standard BPE


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    sample_docs: int = 2000,
) -> list[tuple[str, str]]:
    """Learn a merge table from a bounded, deterministic corpus sample.

    ``limit(sample_docs)`` after an id-ordered select keeps the sample
    stable across partitionings; the training loop is the classic
    word-frequency BPE (Sennrich et al. 2016) and runs driver-side on
    the bounded sample only — the same posture as the IVF k-means
    training step (operators/similarity.py)."""
    sample = (
        docs.select(text_col)
        .filter(F.col(text_col).isNotNull())
        .limit(int(sample_docs))
        .collect()  # bounded: <= sample_docs rows by the limit above
    )
    word_freq: Counter[tuple[str, ...]] = Counter()
    for row in sample:
        for w in row[0].lower().split():
            if w:
                word_freq[(*w, END)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq: Counter[tuple[str, str]] = Counter()
        for sym, f in word_freq.items():
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        # Max frequency, lexicographic tie-break — fully deterministic.
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        nxt: Counter[tuple[str, ...]] = Counter()
        for sym, f in word_freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] += f
        word_freq = nxt
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = [*word, END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with a trained merge table.

    Returns (id, n_words, n_tokens, tokens array<string>). The merge
    table rides the closure (broadcast by Spark's task serialization —
    a few KB); each Arrow batch encodes with a per-worker word memo."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_words, n_tokens, toks = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                words = [w for w in t.lower().split() if w]
                out: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        if len(memo) > 2_000_000:  # bound the memo
                            memo.clear()
                        enc = memo[w] = _encode_word(w, ranks)
                    out.extend(enc)
                ids.append(i)
                n_words.append(len(words))
                n_tokens.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "tokens": pd.Series(toks, dtype="object"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen,
        schema=f"{id_col} long, n_words long, n_tokens long, tokens array<string>",
    )
