#!/bin/sh
# SCALEPROBE at sf10 (r13 verdict item 6): turn the sf0.1→sf1 growth
# extrapolation for the flagship scale paths into a MEASUREMENT at
# another 10x. Generates tmp/sf10 (GenData at 100 replicas of sf0.1 —
# same per-replica key-offset/vocab-remap model the sf1 fixture uses,
# so every in-query require keeps its per-replica structure), then
# benches the four rows the verdict named — BM25, PageRank, SemDeDup
# SRP, routed ADC — in one fresh JVM (min-of-3, the settled shape:
# 4 queries ≪ one bench group), and records per-row growth factors
# vs the same rows' settled sf1 bench.
#
# Usage: sf10_probe.sh [SF1_BENCH_JSON] (default evidence/BENCH_sf1_r13.json)
set -e
cd "$(dirname "$0")/.."
SF1JSON="${1:-evidence/BENCH_sf1_r13.json}"
ROWS="q104_bm25_search q109_pagerank q143_semdedup_srp q147_ivf_adc"

if ! test -d tmp/sf10/documents.parquet; then
  sbt -batch "runMain graft.GenData /root/testdata/sf0.1 /root/repo/tmp/sf10 100" \
    2>/tmp/sf10_gendata.stderr
fi

SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf10 \
  SPARK_GRAFT_BENCH_OUT=/tmp/sf10_bench.json \
  sbt -batch "runMain graft.Bench $ROWS" 2>/tmp/sf10_bench.stderr \
  | grep '"metric"' || true
test -s /tmp/sf10_bench.json || {
  echo "sf10 bench produced no detail; stderr tail:" >&2
  tail -n 40 /tmp/sf10_bench.stderr >&2; exit 1; }

python3 - "$SF1JSON" <<'EOF'
import json, sys
sf10 = json.load(open('/tmp/sf10_bench.json'))
sf1 = json.load(open(sys.argv[1]))
out = {
    "metric": "scaleprobe_sf10", "unit": "sec",
    "sf10_dir": sf10.get("sf"),
    "sf1_bench": sys.argv[1],
    "errors": sf10.get("errors", []),
    "rows": {},
    "note": ("per-row growth factor at another 10x of data (sf1->sf10); "
             "linear-path rows should sit near 10, super-linear growth "
             "flags a scale break the sf0.1->sf1 trend missed"),
}
for name, sec in sf10.get("queries", {}).items():
    base = sf1.get("queries", {}).get(name)
    out["rows"][name] = {
        "sf10_sec": sec,
        "sf10_reps": sf10.get("detail", {}).get(name, {}).get("reps"),
        "sf1_sec": base,
        "growth_x": round(sec / base, 2) if base else None,
    }
with open('evidence/SCALEPROBE_sf10_r13.json', 'w') as f:
    json.dump(out, f, indent=1)
    f.write('\n')
print(json.dumps(out))
EOF
echo SF10_PROBE_DONE
