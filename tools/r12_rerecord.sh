#!/bin/sh
# Round-12 close: re-record ALL scale evidence from the final tree
# (the round-close invariant from the r11 verdict). Runs the sf0.1
# gate + full bench, then the sf1 gate + bench via sf1_gate.sh.
set -e
cd /root/repo
rm -rf tmp/verify_sf01
sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /root/repo/tmp/verify_sf01' \
  2>/tmp/r12b_gate01.stderr >/tmp/r12b_gate01.stdout
python3 tools/check.py /root/testdata/sf0.1 /root/repo/tmp/verify_sf01 \
  > evidence/GATE_sf0.1_r12.log 2>&1
tail -1 evidence/GATE_sf0.1_r12.log
sleep 90
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=evidence/BENCH_sf0.1_r12.json \
  sbt -batch 'runMain graft.Bench' 2>/tmp/r12b_bench01.stderr \
  | grep '"metric"' > /tmp/r12b_bench01.summary
cat /tmp/r12b_bench01.summary
sleep 90
ROUND=r12 sh tools/sf1_gate.sh
echo R12B_RERECORD_DONE
