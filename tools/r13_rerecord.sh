#!/bin/sh
# Round-13 close: re-record ALL scale evidence from the final tree
# (the round-close invariant). sf0.1 gate + grouped bench, then the
# sf1 gate + grouped bench via sf1_gate.sh. Benches run through
# tools/bench_grouped.sh (fresh JVM per ~15-query group — the
# settled-by-construction methodology, r13 verdict item 1).
set -e
cd /root/repo
rm -rf tmp/verify_sf01
sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /root/repo/tmp/verify_sf01' \
  2>/tmp/r13_gate01.stderr >/tmp/r13_gate01.stdout
python3 tools/check.py /root/testdata/sf0.1 /root/repo/tmp/verify_sf01 \
  > evidence/GATE_sf0.1_r13.log 2>&1
tail -1 evidence/GATE_sf0.1_r13.log
sleep 60
python3 - <<'EOF'
import json
ks = sorted(set(k.removesuffix('.parquet')
                for k in json.load(open('tmp/verify_sf01/oracle_sql.json'))))
open('/tmp/bench_sf01_r13.names', 'w').write('\n'.join(ks) + '\n')
EOF
sh tools/bench_grouped.sh /root/testdata/sf0.1 \
  evidence/BENCH_sf0.1_r13.json /tmp/bench_sf01_r13.names 15 \
  2>evidence/BENCH_sf0.1_r13.log | tee /tmp/r13_bench01.summary
sleep 60
ROUND=r13 sh tools/sf1_gate.sh
echo R13_RERECORD_DONE
