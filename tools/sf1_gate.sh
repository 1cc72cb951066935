#!/bin/sh
# Full scale-evidence run: generate the 10x fixture, run every query
# through Spark at sf1, compare each against its DuckDB oracle, and bench
# a headline subset. Produces/refreshes the committed artifacts in
# evidence/. Takes ~30 min end to end; q60's DuckDB-side oracle is the
# single-threaded tail (the Spark side is the part we grade).
#
# q33_simhash_near_dup is excluded BY DESIGN: its 16-bit oracle
# construction degenerates at 50k docs (69M collision pairs — the
# measured §4 bucket collapse); q76 gates the scale-shaped wide form
# instead.
set -e
cd "$(dirname "$0")/.."
ROUND=${ROUND:-r07}

# GenData/Verify stderr is a Spark-warning stream (too big to commit),
# but an ERRORED run must leave a durable artifact (ADVICE r11 follow-up
# to the r10 item): capture each step's stderr to /tmp and, on failure,
# promote its tail into evidence/ before aborting.
step() {
  name="$1"; shift
  errf="/tmp/sf1gate_${ROUND}_${name}.stderr"
  if ! "$@" 2>"$errf"; then
    status=$?
    tail -n 120 "$errf" > "evidence/SF1GATE_${ROUND}_${name}_failure.log"
    echo "sf1 gate step '$name' FAILED (exit $status); stderr tail in evidence/SF1GATE_${ROUND}_${name}_failure.log" >&2
    exit "$status"
  fi
}
step gendata sbt -batch "runMain graft.GenData"
step verify sbt -batch "runMain graft.Verify /root/repo/tmp/sf1 /root/repo/tmp/verify_sf1"

NAMES=$(python3 - <<'EOF'
import json
ks = sorted(set(k.removesuffix('.parquet')
                for k in json.load(open('tmp/verify_sf1/oracle_sql.json'))))
print(' '.join(k for k in ks if k != 'q33_simhash_near_dup'))
EOF
)
# POSIX sh has no pipefail: `check.py | tee` would mask a gate failure or
# crash (tee's exit status wins) while still refreshing the committed
# artifact. Capture to a temp file, test check.py's own exit status, and
# only then promote the log into evidence/.
GATE_TMP=$(mktemp)
if python3 tools/check.py /root/repo/tmp/sf1 /root/repo/tmp/verify_sf1 $NAMES \
    > "$GATE_TMP" 2>&1; then
  cat "$GATE_TMP"
  mv "$GATE_TMP" "evidence/GATE_sf1_${ROUND}.log"
  # mktemp files are 0600; normalize so the committed artifact doesn't
  # carry a spurious restrictive mode
  chmod 644 "evidence/GATE_sf1_${ROUND}.log"
else
  status=$?
  cat "$GATE_TMP"
  rm -f "$GATE_TMP"
  echo "sf1 gate FAILED (check.py exit $status); evidence NOT refreshed" >&2
  exit "$status"
fi

# Bench the FULL surface at sf1 (same q33 exclusion as the gate) —
# settled-by-construction since r13 (verdict item 1): bench_grouped.sh
# runs Bench in FRESH JVMs over ~15-query groups (each with its own
# warmup + bounded settle + min-of-N reps) and merges the group detail
# JSONs, so the committed artifact carries the RECHECK-methodology
# numbers directly instead of needing a side-channel smear recheck.
# Remove any same-ROUND artifact first: a crashed bench must leave the
# file MISSING (caught below), not silently pass `test -s` on a stale
# file from a previous run.
rm -f "evidence/BENCH_sf1_${ROUND}.json"
BENCH_LOG="evidence/BENCH_sf1_${ROUND}.log"
NAMES_FILE="/tmp/bench_sf1_${ROUND}.names"
printf '%s\n' $NAMES > "$NAMES_FILE"
sh tools/bench_grouped.sh /root/repo/tmp/sf1 \
  "evidence/BENCH_sf1_${ROUND}.json" "$NAMES_FILE" 15 \
  2>"$BENCH_LOG" | tee "/tmp/bench_sf1_${ROUND}.summary"
test -s "evidence/BENCH_sf1_${ROUND}.json" || {
  echo "sf1 bench detail missing; see $BENCH_LOG" >&2; exit 1; }
echo "sf1 gate + bench complete; artifacts refreshed under evidence/"
