#!/bin/bash
# r13 sf1.0 evidence campaign: regenerate the 10x corpus, hash-check the
# queries touched this round plus the two new ones (q197/q198), run TWO
# back-to-back full-registry bench sweeps (the two-sweep protocol the r12
# verdict asked for: single-run 10x sweeps can't separate regression from
# box noise), back-fill oracle times for the touched/new queries, and run
# the mechanical >2x ratio gate against ADJUDICATIONS.json.
set -x
cd /root/repo
sbt -batch "runMain graft.tools.GenScale 10 target/sf1.0" 2>&1 | tail -2
echo PHASE_GENSCALE_DONE
rm -rf /tmp/verify_sf1_r13
SPARK_GRAFT_ONLY=q114,q169,q170,q177,q191,q196,q197,q198 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify target/sf1.0 /tmp/verify_sf1_r13" 2>&1 \
  | grep -E "\[verify\]" | tail -10
python3 tools/check_oracle.py target/sf1.0 /tmp/verify_sf1_r13 \
  /tmp/oracle_times_sf1_r13_subset.json --timeout 2400 2>&1 | tail -12
echo PHASE_SUBSET_ORACLE_DONE
SPARK_GRAFT_SF_DIR=target/sf1.0 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E "BENCHQ|\"metric\"|REFUSED|failed" | tail -16
cp target/bench.json target/bench_sf1_r13_sweep1.json
echo PHASE_BENCH1_DONE
SPARK_GRAFT_SF_DIR=target/sf1.0 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E "BENCHQ|\"metric\"|REFUSED|failed" | tail -16
cp target/bench.json target/bench_sf1_r13_sweep2.json
echo PHASE_BENCH2_DONE
python3 tools/merge_oracle_times.py ORACLE_TIMES_sf1.0.json \
  /tmp/oracle_times_sf1_r13_subset.json
python3 tools/ratio_gate.py target/bench_sf1_r13_sweep1.json \
  ORACLE_TIMES_sf1.0.json ADJUDICATIONS.json --out RATIOS_sf1.0_r13.json \
  | tail -14
echo PHASE_DONE
