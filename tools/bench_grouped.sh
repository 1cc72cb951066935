#!/bin/sh
# Settled-by-construction bench (r13 verdict item 1): run graft.Bench in
# FRESH JVMs over small query groups and merge the artifacts.
#
# Why: for three rounds the committed single-JVM sf1 bench misstated a
# hot query ~2x (r12: q104 67.0 s in-bench vs 33.3 s min-of-3 in a fresh
# JVM) — a long-lived bench JVM accumulates state that min-of-3 WITHIN
# the polluted window cannot undo. A fresh JVM per ~15-query group
# reproduces the RECHECK methodology across the whole surface: each
# group pays its own warmup, settles to a bounded loadavg target, then
# times min-of-N reps.
#
# Usage: bench_grouped.sh SFDIR OUT_JSON NAMES_FILE [GROUP_SIZE]
#   SFDIR      - fixture dir (SPARK_GRAFT_SF_DIR)
#   OUT_JSON   - merged artifact path
#   NAMES_FILE - one query name per line (the bench surface)
#   GROUP_SIZE - queries per JVM (default 15)
set -e
cd "$(dirname "$0")/.."
SFDIR="$1"; OUT="$2"; NAMES_FILE="$3"; GROUP_SIZE="${4:-15}"
test -n "$SFDIR" && test -n "$OUT" && test -s "$NAMES_FILE" || {
  echo "usage: bench_grouped.sh SFDIR OUT_JSON NAMES_FILE [GROUP_SIZE]" >&2
  exit 2
}

# Split batch vs harness-bound using Bench.scala's OWN literal set (the
# single source of truth): harness groups run LAST so their streaming
# storms never precede a batch group, mirroring the in-JVM sectioning.
# The parse is screened: every extracted name must be a known query.
GROUPS_DIR=$(mktemp -d)
python3 - "$NAMES_FILE" "$GROUP_SIZE" "$GROUPS_DIR" <<'EOF'
import re, sys
names_file, size, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
names = sorted(set(l.strip() for l in open(names_file) if l.strip()))
src = open('src/main/scala/graft/Bench.scala').read()
m = re.search(r'harnessBound: Set\[String\] = Set\((.*?)\)\n', src, re.S)
assert m, 'harnessBound set not found in Bench.scala'
harness_all = set(re.findall(r'"(q[0-9]+_[a-z0-9_]+)"', m.group(1)))
assert harness_all, 'harnessBound parse yielded no names'
batch = [n for n in names if n not in harness_all]
harness = [n for n in names if n in harness_all]
assert batch, 'no batch queries parsed'
groups = []
for lst in (batch, harness):
    for i in range(0, len(lst), size):
        groups.append(lst[i:i + size])
for i, g in enumerate(groups):
    with open(f'{outdir}/group{i:02d}.names', 'w') as f:
        f.write('\n'.join(g) + '\n')
print(f'{len(groups)} groups ({len(batch)} batch + {len(harness)} harness queries)')
EOF

MERGE_ARGS=""
for gf in "$GROUPS_DIR"/group*.names; do
  gid=$(basename "$gf" .names)
  GNAMES=$(tr '\n' ' ' < "$gf")
  GOUT="$GROUPS_DIR/$gid.json"
  echo "[bench_grouped] $gid: $GNAMES" >&2
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_BENCH_OUT="$GOUT" \
    sbt -batch "runMain graft.Bench $GNAMES" \
    2>"$GROUPS_DIR/$gid.stderr" | grep '"metric"' || true
  # promote the durable [bench] markers (start order, FAILED messages,
  # write-failure fallback dumps) from the group's stderr into ours, so
  # the caller's log keeps them after the mktemp dir is cleaned
  grep -E '^\[bench\]|^\{' "$GROUPS_DIR/$gid.stderr" >&2 || true
  test -s "$GOUT" || {
    echo "[bench_grouped] $gid produced no detail JSON; stderr tail:" >&2
    tail -n 40 "$GROUPS_DIR/$gid.stderr" >&2
    exit 1
  }
  MERGE_ARGS="$MERGE_ARGS $GOUT"
done

python3 tools/bench_merge.py "$OUT" $MERGE_ARGS
echo "[bench_grouped] merged -> $OUT (group files under $GROUPS_DIR)" >&2
