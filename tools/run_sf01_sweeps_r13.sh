#!/bin/bash
# r13 canonical sf0.1 protocol: back-fill oracle times for the new/changed
# queries, run TWO back-to-back full-registry sweeps, compare vs r12, and
# run the mechanical >2x ratio gate against ADJUDICATIONS.json.
set -x
cd /root/repo
rm -rf /tmp/verify_sf01_r13
SPARK_GRAFT_ONLY=q114,q169,q170,q177,q191,q196,q197,q198 SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01_r13" 2>&1 \
  | grep -E "\[verify\]" | tail -5
python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/verify_sf01_r13 \
  /tmp/oracle_times_sf01_r13_subset.json 2>&1 | tail -12
python3 tools/merge_oracle_times.py ORACLE_TIMES_sf0.1.json \
  /tmp/oracle_times_sf01_r13_subset.json
echo PHASE_BACKFILL_DONE
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E "BENCHQ|\"metric\"|REFUSED|failed" | tail -16
cp target/bench.json target/bench_r13_sweep1.json
echo PHASE_SWEEP1_DONE
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E "BENCHQ|\"metric\"|REFUSED|failed" | tail -16
cp target/bench.json target/bench_r13_sweep2.json
echo PHASE_SWEEP2_DONE
python3 tools/bench_compare.py target/bench_r13_sweep1.json \
  BENCH_r12_builder.json 1.5 2>&1 | head -25
python3 tools/ratio_gate.py target/bench_r13_sweep1.json \
  ORACLE_TIMES_sf0.1.json ADJUDICATIONS.json --out RATIOS_sf0.1_r13.json \
  | tail -12
echo PHASE_DONE
