"""sf1 VALUE oracles for the quadratic-oracle registry subset
(VERDICT r5 task 1).

These ~24 queries could not join the sf1 strict sweep because their
DuckDB oracles are intentionally quadratic (all-pairs ground truths,
recursive closures) or rows-only (k-means / BPE state). Two-run
determinism proved them STABLE at 10× — but determinism cannot catch a
deterministic wrong answer. This tool gives each one independent VALUE
evidence at sf1, by class:

1. **direct** — oracles that turn out to be DuckDB-feasible at sf1
   given patience (sketch contracts, probe-bounded scans): run the
   registered oracle verbatim through the strict comparator.

   Probing showed MOST of the set lands here — the sketch contracts,
   probe-bounded ANN scans, simhash+edit cascade, blocked entity
   resolution and within-label SemDeDup all complete in DuckDB at sf1
   (quadratic only within bounded blocks); only the four truly
   all-pairs ground truths below need sampling.

2. **pairwise sampled-subgraph** — for pure-pairwise outputs (a row's
   presence/values depend only on its two endpoint entities: n-gram
   Jaccard / containment / prefix-filter pairs, cosine near-dup):
   restrict the
   DuckDB VIEW of the base table to a deterministic md5-selected key
   set S (endpoints of sampled engine-output pairs ∪ random keys, so S
   contains both candidate and non-candidate pairs), then run the
   REGISTERED oracle verbatim — brute force over the induced subgraph —
   and strict-compare against the engine output restricted to pairs
   with both endpoints in S. Because the predicate is pairwise,
   restriction commutes exactly: no re-implementation of the oracle
   semantics, no tolerance.

3. **closure** (q_dup_clusters / q_cluster_survivors /
   q_leakage_split) — connected components are not restrictable
   (paths may cross unsampled vertices). Instead the closure step is
   verified EXACTLY and in full by an independent algorithm: Python
   union-find over the engine's certified pair relation (itself
   class-2-verified here, LSH-cross-checked, and sf0.1-strict), then
   survivors / md5 split buckets recomputed in pandas.

5. **contract** (rows-only q_ann_ivf / q_ann_pq / q_bpe_tokens) —
   k-means/BPE state has no SQL twin at any scale; at sf1 the shipped
   contracts are re-proven: IVF/PQ recall@5 vs an INDEPENDENT numpy
   exact ground truth plus per-probe shape, BPE concat-restores-text
   on sampled docs plus count consistency.

Cross-checks (free, full-registry-exact): q_jaccard_prefix ==
q_ngram_jaccard (same advertised relation via a different plan), and
the jaccard>=0.5 pair set == q_dedup_minhash's banded-LSH pair set
projection (different algorithm, same ground truth).

Usage: python tools/sf1_value_check.py [sf1_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

from tools.check_oracle import compare

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

N_PAIR_SAMPLE = 150
N_RANDOM_KEYS = 400

# class 1: run the registered oracle verbatim at sf1 (feasible, just slow)
DIRECT = [
    "q_approx_distinct",
    "q_approx_quantile",
    "q_heavy_hitters",
    "q_group_heavy_hitters",
    "q_source_overlap",
    "q_ndcg",
    "q_ann_topk",
    "q_recall_at_k",
    "q_rrf",
    "q_hard_negatives",
    "q_mmr_rerank",
    "q_edit_verify",
    "q_entity_match",
    "q_semdedup",
]

# class 2: (table, key column, [engine id columns], key is string?)
PAIRWISE = {
    "q_ngram_jaccard": ("documents", "doc_id", ["id_a", "id_b"], False),
    "q_containment": ("documents", "doc_id", ["id_a", "id_b"], False),
    "q_jaccard_prefix": ("documents", "doc_id", ["id_a", "id_b"], False),
    "q_embed_neardup": ("embeddings", "vec_id", ["id_a", "id_b"], False),
}


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


def _conn(sf_dir: str, restrict: tuple[str, str, set] | None = None):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        base = f"SELECT * FROM read_parquet('{path}')"
        if restrict is not None and restrict[0] == t:
            _, key, keys = restrict
            vals = ", ".join(
                "'" + str(k).replace("'", "''") + "'"
                if isinstance(k, str)
                else str(k)
                for k in sorted(keys)
            )
            base += f" WHERE {key} IN ({vals})"
        con.execute(f"CREATE VIEW {t} AS {base}")
    return con


def _report(name: str, problems: list[str], detail: str = "") -> bool:
    if problems:
        print(f"FAIL {name}: {'; '.join(problems)}")
        return False
    print(f"PASS {name}{': ' + detail if detail else ''}")
    return True


def check_direct(name, spark, sf_dir, queries, oracles) -> bool:
    pdf = queries[name](spark, sf_dir).toPandas()
    duck = _conn(sf_dir).execute(oracles[name]).fetchdf()
    return _report(
        name, compare(name, pdf, duck, strict=True), f"{len(pdf)} rows direct"
    )


# Pairwise checks whose ENGINE plan is itself all-pairs-exact (the
# brute-force baseline q_embed_neardup) cannot run in full past ~1e5
# base rows. The pairwise property cuts both ways: restricting the
# INPUT to a key set S and running the same operator gives exactly the
# induced-subgraph output, so at scale the check runs engine AND
# oracle on the same S (families of amplifier replicas are seeded into
# S so true near-dup pairs exist — the check stays non-vacuous).
ENGINE_RESTRICT_ROWS = 100_000
N_FAMILY_SEEDS = 150
# Only queries whose FULL engine plan is all-pairs-exact need (and
# have) a restricted builder; the document-based pairwise engines are
# candidate-pruned and run in full at every probed scale — full mode
# is the stronger check (full engine output restricted to S), so they
# keep it.
ENGINE_RESTRICTED = {"q_embed_neardup"}


def _restricted_engine(name, spark, sf_dir, S):
    from pyspark.sql import functions as F

    from etl_neptune_spark.sources import load_table

    if name == "q_embed_neardup":
        from etl_neptune_spark.operators.similarity import (
            cosine_neardup_pairs,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        keys = [int(k) for k in S]
        return cosine_neardup_pairs(
            emb.filter(F.col("vec_id").isin(keys)), dim=64
        )
    raise KeyError(name)


def check_pairwise(name, spark, sf_dir, queries, oracles) -> bool:
    table, key, id_cols, _is_str = PAIRWISE[name]
    a, b = id_cols
    all_keys_s = (
        _conn(sf_dir)
        .execute(f"SELECT DISTINCT {key} AS k FROM {table}")
        .fetchdf()["k"]
    )
    if name in ENGINE_RESTRICTED and len(all_keys_s) > ENGINE_RESTRICT_ROWS:
        key_set = set(int(k) for k in all_keys_s)
        ranked_all = sorted(key_set, key=_md5)
        S = set(ranked_all[:N_RANDOM_KEYS])
        # Seed amplifier FAMILIES (parent = k // 10; replicas r=0/r=1
        # of a parent with parent%5==0 are exact duplicates) so the
        # induced subgraph contains planted true pairs.
        for k in ranked_all[:N_FAMILY_SEEDS]:
            parent = k // 10
            S |= {parent * 10 + r for r in range(10)} & key_set
        duck = (
            _conn(sf_dir, restrict=(table, key, S))
            .execute(oracles[name])
            .fetchdf()
        )
        sub = _restricted_engine(name, spark, sf_dir, S).toPandas()
        problems = compare(name, sub, duck, strict=True)
        if len(sub) == 0:
            problems = list(problems) + ["vacuous: no in-sample pairs"]
        return _report(
            name,
            problems,
            f"RESTRICTED-ENGINE mode: |S|={len(S)} keys, {len(sub)} "
            f"subgraph pairs, engine-on-S == brute-force-on-S",
        )
    pdf = queries[name](spark, sf_dir).toPandas()
    # deterministic sample: endpoints of the md5-smallest engine pairs
    # + md5-smallest random base keys (non-candidates dominate these)
    pair_rank = pdf.apply(lambda r: _md5(f"{r[a]}|{r[b]}"), axis=1) if len(pdf) else None
    S: set = set()
    if len(pdf):
        picked = (
            pdf.assign(_h=pair_rank)
            .sort_values("_h")
            .head(N_PAIR_SAMPLE)
        )
        S |= set(picked[a]) | set(picked[b])
    ranked = sorted(all_keys_s, key=_md5)[:N_RANDOM_KEYS]
    S |= set(ranked)
    duck = (
        _conn(sf_dir, restrict=(table, key, S))
        .execute(oracles[name])
        .fetchdf()
    )
    sub = pdf[pdf[a].isin(S) & pdf[b].isin(S)].reset_index(drop=True)
    n_cand = len(sub)
    problems = compare(name, sub, duck, strict=True)
    return _report(
        name,
        problems,
        f"|S|={len(S)} keys, {n_cand} in-sample pairs "
        f"(of {len(pdf)} engine pairs), subgraph brute force matches",
    )


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = x
        while p.get(r, r) != r:
            r = p[r]
        while p.get(x, x) != x:
            p[x], x = r, p[x]
        return r

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            # component id = MIN member (the engine contract)
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            self.p[hi] = lo


def _components(pairs: pd.DataFrame) -> dict:
    uf = _UF()
    for x, y in zip(pairs["id_a"], pairs["id_b"]):
        uf.union(int(x), int(y))
    verts = set(pairs["id_a"]) | set(pairs["id_b"])
    return {int(v): uf.find(int(v)) for v in verts}


def check_closures(spark, sf_dir, queries) -> bool:
    ok = True
    pairs = queries["q_ngram_jaccard"](spark, sf_dir).toPandas()
    comp = _components(pairs)

    eng = queries["q_dup_clusters"](spark, sf_dir).toPandas()
    got = {int(r.vertex): int(r.component) for r in eng.itertuples()}
    ok &= _report(
        "q_dup_clusters",
        [] if got == comp else [
            f"union-find disagrees on "
            f"{sum(1 for v in comp if got.get(v) != comp[v])} of {len(comp)} vertices"
        ],
        f"{len(comp)} vertices, {len(set(comp.values()))} components == union-find",
    )

    docs = (
        _conn(sf_dir)
        .execute("SELECT doc_id, n_chars FROM documents")
        .fetchdf()
    )
    nchars = dict(zip(docs["doc_id"].astype(int), docs["n_chars"].astype(int)))
    best: dict = {}
    size: dict = {}
    for v, c in comp.items():
        size[c] = size.get(c, 0) + 1
        cand = (nchars[v], -v)
        if c not in best or cand > best[c]:
            best[c] = cand
    expected = {
        c: (-nid, size[c], nc) for c, (nc, nid) in best.items()
    }  # survivor_id, cluster_size, survivor_chars
    surv = queries["q_cluster_survivors"](spark, sf_dir).toPandas()
    got_s = {
        int(r.component): (int(r.survivor_id), int(r.cluster_size), int(r.survivor_chars))
        for r in surv.itertuples()
    }
    ok &= _report(
        "q_cluster_survivors",
        [] if got_s == expected else [
            f"{sum(1 for c in expected if got_s.get(c) != expected[c])} "
            f"of {len(expected)} clusters disagree"
        ],
        f"{len(expected)} clusters: survivors == pandas argmax over union-find",
    )

    split_of = lambda gid: (  # noqa: E731 — the registered oracle's md5 rule
        "train"
        if _md5(gid)[0] < "c"
        else ("val" if _md5(gid)[0] < "e" else "test")
    )
    exp_rows = {
        int(d): (comp.get(int(d), int(d)), split_of(comp.get(int(d), int(d))))
        for d in docs["doc_id"]
    }
    ls = queries["q_leakage_split"](spark, sf_dir).toPandas()
    got_l = {
        int(r.doc_id): (int(r.group_id), str(r.split)) for r in ls.itertuples()
    }
    ok &= _report(
        "q_leakage_split",
        [] if got_l == exp_rows else [
            f"{sum(1 for d in exp_rows if got_l.get(d) != exp_rows[d])} "
            f"of {len(exp_rows)} docs disagree"
        ],
        f"{len(exp_rows)} docs: group + md5 split == python recompute",
    )
    return ok


def check_pair_crosschecks(spark, sf_dir, queries) -> bool:
    ok = True
    ng = queries["q_ngram_jaccard"](spark, sf_dir).toPandas()
    jp = queries["q_jaccard_prefix"](spark, sf_dir).toPandas()
    s_ng = set(zip(ng["id_a"].astype(int), ng["id_b"].astype(int)))
    s_jp = set(zip(jp["id_a"].astype(int), jp["id_b"].astype(int)))
    ok &= _report(
        "xcheck:prefix==bruteforce",
        [] if s_ng == s_jp else [
            f"pair sets differ: {len(s_ng - s_jp)} only-ngram, "
            f"{len(s_jp - s_ng)} only-prefix"
        ],
        f"{len(s_ng)} pairs identical via two independent plans",
    )
    mh = queries["q_dedup_minhash"](spark, sf_dir).toPandas()
    s_mh = set(zip(mh["id_a"].astype(int), mh["id_b"].astype(int)))
    # banded LSH (12 hashes / 6 bands) is a candidate filter: it may
    # MISS true pairs (sketch recall < 1) but every emitted pair passed
    # the exact jaccard>=0.5 verify — so LSH pairs ⊆ exact pairs, and
    # at this banding the recall on the planted clusters is high.
    extra = s_mh - s_ng
    missed = len(s_ng - s_mh)
    recall = 1 - missed / len(s_ng) if s_ng else 1.0
    ok &= _report(
        "xcheck:lsh_subset_of_exact",
        [] if not extra else [f"{len(extra)} LSH pairs not in exact set"],
        f"LSH ⊆ exact holds; sketch recall {recall:.3f} "
        f"({missed} of {len(s_ng)} true pairs below band threshold)",
    )
    return ok


def _embeddings_numpy(sf_dir: str):
    pdf = (
        _conn(sf_dir)
        .execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id")
        .fetchdf()
    )
    ids = pdf["vec_id"].astype(int).to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return ids, mat


def _exact_topk_numpy(ids, mat, k=5):
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    exact = {}
    B = 2048
    n = len(ids)
    # Candidate buffer: a full-row lexsort per query is O(n log n) per
    # row — 200k rows at sf10 made it hours. argpartition takes the
    # top CAND in O(n) vectorized per block, then the exact
    # (cos desc, id asc) lexsort runs only inside the buffer. CAND=64
    # covers any realistic boundary-tie cluster (exact-duplicate
    # clones); k-th-place ties beyond 64 identical float64 cosines do
    # not occur on this data.
    CAND = max(64, k)
    for s in range(0, n, B):
        block = unit[s : s + B] @ unit.T  # cosine matrix block
        for r in range(block.shape[0]):
            block[r, s + r] = -np.inf  # self excluded
        top = np.argpartition(block, -CAND, axis=1)[:, -CAND:]
        for r in range(block.shape[0]):
            qi = s + r
            cand = top[r]
            order = np.lexsort((ids[cand], -block[r, cand]))[:k]
            exact[int(ids[qi])] = {int(ids[cand[j]]) for j in order}
    return exact


def check_ann_contracts(spark, sf_dir, queries) -> bool:
    ok = True
    ids, mat = _embeddings_numpy(sf_dir)
    exact = _exact_topk_numpy(ids, mat, k=5)
    n_exact = sum(len(v) for v in exact.values())
    for name, floor in (("q_ann_ivf", 0.6), ("q_ann_pq", 0.5)):
        pdf = queries[name](spark, sf_dir).toPandas()
        probs = []
        per_q = pdf.groupby("query_id").size()
        if not (per_q <= 5).all():
            probs.append("a probe returned more than k rows")
        if len(per_q) != len(exact):
            probs.append(
                f"probe count {len(per_q)} != corpus {len(exact)}"
            )
        hit = sum(
            1
            for r in pdf.itertuples()
            if int(r.neighbor_id) in exact[int(r.query_id)]
        )
        recall = hit / n_exact
        if recall < floor:
            probs.append(f"recall@5 {recall:.3f} < {floor} vs numpy exact")
        ok &= _report(
            name, probs, f"recall@5 {recall:.3f} vs independent numpy ground truth"
        )
    return ok


def check_bpe(spark, sf_dir, queries) -> bool:
    from etl_neptune_spark.operators.bpe import bpe_encode, train_bpe_merges
    from etl_neptune_spark.sources import load_table

    name = "q_bpe_tokens"
    pdf = queries[name](spark, sf_dir).toPandas()
    probs = []
    docs = load_table(spark, sf_dir, "documents")
    sample_ids = sorted(pdf["doc_id"].astype(int), key=_md5)[:200]
    merges = train_bpe_merges(docs, num_merges=100, sample_docs=1000)
    enc = (
        bpe_encode(docs.filter(F_col_isin("doc_id", sample_ids)), merges)
        .toPandas()
    )
    counts = {int(r.doc_id): (int(r.n_words), int(r.n_tokens)) for r in pdf.itertuples()}
    texts = dict(
        (int(r.doc_id), str(r.text))
        for r in docs.filter(F_col_isin("doc_id", sample_ids))
        .select("doc_id", "text")
        .toPandas()
        .itertuples()
    )
    from etl_neptune_spark.operators.bpe import END

    for r in enc.itertuples():
        did = int(r.doc_id)
        toks = list(r.tokens)
        # the shipped invariant (tests/test_bpe.py): concatenating
        # tokens and mapping END markers back to spaces restores the
        # whitespace-normalized lowercase text
        restored = "".join(toks).replace(END, " ").rstrip()
        if restored != " ".join(texts[did].lower().split()):
            probs.append(f"doc {did}: token concat does not restore text")
            break
        if counts.get(did) != (int(r.n_words), int(r.n_tokens)):
            probs.append(f"doc {did}: counts drift vs full-corpus run")
            break
        if not (int(r.n_tokens) >= int(r.n_words)):
            probs.append(f"doc {did}: fewer tokens than words")
            break
    return _report(
        name,
        probs,
        f"{len(enc)} sampled docs: concat restores text, counts match "
        f"full run ({len(pdf)} rows)",
    )


def F_col_isin(col, vals):
    from pyspark.sql import functions as F

    return F.col(col).isin(*[int(v) for v in vals])


def main() -> int:
    import __spark_entry__ as e
    from etl_neptune_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and ("/" in args[0]) else "spark-warehouse/sf1"
    only = set(a for a in args if "/" not in a)
    sf_dir = os.path.abspath(sf_dir)
    spark = get_spark("sf1_value_check")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = e.queries(), e.oracle_sql()

    results = []

    def want(*names):
        return not only or any(n in only for n in names)

    for name in DIRECT:
        if want(name):
            results.append(check_direct(name, spark, sf_dir, queries, oracles))
    for name in PAIRWISE:
        if want(name):
            results.append(check_pairwise(name, spark, sf_dir, queries, oracles))
    if want("q_dup_clusters", "q_cluster_survivors", "q_leakage_split"):
        results.append(check_closures(spark, sf_dir, queries))
    if want("q_ngram_jaccard", "q_jaccard_prefix", "q_dedup_minhash"):
        results.append(check_pair_crosschecks(spark, sf_dir, queries))
    if want("q_ann_ivf", "q_ann_pq"):
        results.append(check_ann_contracts(spark, sf_dir, queries))
    if want("q_bpe_tokens"):
        results.append(check_bpe(spark, sf_dir, queries))

    failed = results.count(False)
    print(f"\n{failed} failed / {len(results)} check groups (sf1 value evidence)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
