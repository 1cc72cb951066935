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
ROUND=${ROUND:-r06}

sbt -batch "runMain graft.GenData" 2>/dev/null
sbt -batch "runMain graft.Verify /root/repo/tmp/sf1 /root/repo/tmp/verify_sf1" 2>/dev/null

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

SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf1 sbt -batch "runMain graft.Bench \
  q01_ingest_clean q05_enriched_lineitems q06_floor_price q09_trading_roi \
  q12_daily_action_rollup q19_sessionize q20_dedup_exact q21_minhash_pairs \
  q23_ngram_jaccard q24_ann_cosine q29_embedding_near_dup q41_ivf_topk \
  q42_dedup_clusters q46_incremental_neardup q47_corpus_pipeline \
  q50_distinct_users q51_decontaminate q56_vocab_topk q60_fuzzy_match \
  q62_salted_join q67_sketch_accuracy q69_exclude_flagged q70_shard_assign \
  q71_sequence_pack q72_pack_write q74_stream_neardup q75_ivf_recall \
  q76_simhash_wide q77_dup_spans q78_stream_upsert q79_stream_funnel \
  q80_stream_sessionize q81_stream_rollup q82_stream_dedup q83_stream_enrich \
  q84_stream_interval_join q85_doc_chunking q86_daily_update \
  q87_stream_late_data q88_bucketed_join q89_stream_recovery q90_backfill q91_formats_roundtrip" \
  2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' \
  > "evidence/BENCH_sf1_${ROUND}.json"
echo "sf1 gate + bench complete; artifacts refreshed under evidence/"
