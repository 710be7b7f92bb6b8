"""BPE tokenizer: training determinism, encode invariants."""

from __future__ import annotations

from etl_neptune_spark.operators.bpe import (
    END,
    _encode_word,
    bpe_encode,
    train_bpe_merges,
)


def test_train_learns_frequent_pairs(spark):
    docs = spark.createDataFrame(
        [(i, "low low low lower lowest") for i in range(5)],
        "doc_id long, text string",
    )
    merges = train_bpe_merges(docs, num_merges=10, sample_docs=100)
    assert merges, "frequent pairs must produce merges"
    # 'l o' (or 'lo w') is the dominant pair family in this corpus.
    assert ("l", "o") in merges
    # Determinism: retraining on the same sample gives the same table.
    assert merges == train_bpe_merges(docs, num_merges=10, sample_docs=100)


def test_encode_concat_restores_word():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", END): 2}
    for w in ("low", "lower", "lowest", "slow", "x"):
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + END
    # Fully merged frequent word collapses to one token.
    assert _encode_word("low", ranks) == ["low" + END]


def test_bpe_encode_counts_and_compression(spark, sf_dir):
    from etl_neptune_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe_merges(docs, num_merges=50, sample_docs=50)
    out = bpe_encode(docs, merges)
    rows = out.collect()
    assert len(rows) == 50
    texts = {
        r.doc_id: r.text for r in docs.select("doc_id", "text").collect()
    }
    for r in rows:
        # At least one token per word, and concatenating the tokens
        # (dropping END markers) restores the exact document text.
        assert r.n_tokens >= r.n_words
        restored = "".join(t for t in r.tokens).replace(END, " ").rstrip()
        assert restored == " ".join(texts[r.doc_id].lower().split())
    # Determinism across partitionings.
    again = {
        r.doc_id: r.n_tokens
        for r in bpe_encode(docs.repartition(7), merges).collect()
    }
    assert {r.doc_id: r.n_tokens for r in rows} == again
