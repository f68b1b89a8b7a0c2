#!/bin/bash
# re-run the OOM-poisoned sf1.0 oracles one fresh process each, then merge
set -x
for q in q92_bigram_lm q99_incremental_near_dup q91_pq_rerank q90_ivf_pq q89_pq_topk q97_semdedup; do
  d=/tmp/redo_$q
  mkdir -p $d
  ln -sfn /tmp/verify_sf1/$q $d/$q
  ln -sfn /tmp/verify_sf1/oracle_sql.json $d/oracle_sql.json
  python3 /root/repo/tools/check_oracle.py /root/repo/target/sf1.0 $d /tmp/redo_times_$q.json --timeout 2400 2>&1 | tail -3
done
echo REDO_DONE
