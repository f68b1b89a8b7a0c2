#!/bin/bash
# r12 sf1.0 evidence campaign over the FULL registry: GenScale now writes
# every table (relational included), Verify runs all queries, the bench
# sweep covers the whole registry, and the mechanical DuckDB oracle sweep
# rewrites ORACLE_TIMES_sf1.0.json with a status for every query.
set -x
cd /root/repo
sbt -batch "runMain graft.tools.GenScale 10 target/sf1.0" 2>&1 | tail -2
echo PHASE_GENSCALE_DONE
SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify target/sf1.0 /tmp/verify_sf1" 2>&1 | grep -E "\[verify\]|success|error\] \(run" | tail -20
echo PHASE_VERIFY_DONE
SPARK_GRAFT_SF_DIR=target/sf1.0 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E "BENCHQ|\"metric\"|BENCHCAL|TOTAL|REFUSED|failed" | tail -20
cp target/bench.json target/bench_sf1_full.json || true
echo PHASE_BENCH_DONE
python3 tools/check_oracle.py target/sf1.0 /tmp/verify_sf1 ORACLE_TIMES_sf1.0.json \
  --timeout 2400 --declare tools/oracle_sf1_declared.json 2>&1 | tail -40
echo PHASE_ORACLE_DONE
