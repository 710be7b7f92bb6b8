#!/bin/bash
# Round-9 close gates — run sequentially on final code, logging to /tmp.
# Order: cheapest-signal-first so a breakage surfaces early. The two
# invariance gates (7-partition, no-broadcast) run on the queries whose
# PLANS changed this round (minhash collapse/salt, ivf prune flag,
# streaming state capture) plus their downstream consumers — the full-
# registry invariance ran at r8 close on plans that are otherwise
# unchanged.
set -u
cd /root/repo
R=/tmp/r9_gates
mkdir -p $R

CHANGED="q_dedup_minhash q_corpus_curation q_llm_pipeline q_cross_dedup \
q_dup_clusters q_cluster_survivors q_leakage_split q_ann_persist \
q_jaccard_prefix q_boilerplate"

echo "=== 1. full strict + heavy-value at sf0.01 ==="
timeout 4000 python tools/check_oracle.py --strict --heavy-value /root/testdata/sf0.01 > $R/strict_sf001.log 2>&1
echo "strict sf0.01: $(tail -2 $R/strict_sf001.log | head -1)"

echo "=== 2. full pytest ==="
timeout 4000 python -m pytest tests/ -q > $R/pytest.log 2>&1
echo "pytest: $(tail -2 $R/pytest.log | head -1)"

echo "=== 3. pinned strict at sf0.1 (123 q-ids: every §2 + LLM headline) ==="
timeout 6000 python tools/check_oracle.py --strict --heavy-value /root/testdata/sf0.1 $(grep -v '^#' tools/pinned_strict.txt | tr '\n' ' ') > $R/pinned_sf01.log 2>&1
echo "pinned sf0.1: $(tail -2 $R/pinned_sf01.log | head -1)"

echo "=== 4. plan audit --exec (regenerate budgets over changed plans) ==="
timeout 4000 python tools/audit_plans.py --exec > $R/audit.log 2>&1
echo "audit: $(tail -2 $R/audit.log | head -2)"

echo "=== 5. bench at sf0.1 ==="
timeout 4000 python bench.py > $R/bench.log 2>&1
echo "bench: $(tail -1 $R/bench.log | head -c 400)"

echo "=== 6. heavy-value at sf10 (fixture v2 re-proof) ==="
timeout 5000 python tools/check_oracle.py --heavy-value spark-warehouse/sf10 \
  q_ngram_jaccard q_containment q_jaccard_prefix q_embed_neardup \
  q_dup_clusters q_cluster_survivors q_leakage_split \
  q_ann_ivf q_ann_pq q_bpe_tokens > $R/heavy_sf10.log 2>&1
echo "heavy sf10: $(tail -2 $R/heavy_sf10.log | head -1)"

echo "=== 7. bare smoke (full registry, bare local[8], sf0.001) ==="
timeout 4000 python tools/bare_smoke.py > $R/bare.log 2>&1
echo "bare: $(tail -2 $R/bare.log | head -1)"

echo "=== 8. 7-partition invariance (changed plans) ==="
SPARK_GRAFT_CPUS=7 timeout 4000 python tools/check_oracle.py --strict /root/testdata/sf0.01 $CHANGED > $R/strict_7part.log 2>&1
echo "7-part: $(tail -2 $R/strict_7part.log | head -1)"

echo "=== 9. no-broadcast invariance (changed plans) ==="
timeout 4000 python tools/check_oracle.py --strict --no-broadcast /root/testdata/sf0.01 $CHANGED > $R/nobcast.log 2>&1
echo "no-broadcast: $(tail -2 $R/nobcast.log | head -1)"

echo "ALL GATES DONE"
