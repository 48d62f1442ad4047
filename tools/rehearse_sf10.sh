#!/bin/bash
# Round-13 directive-3 rehearsal: flagship families at sf1 and sf10 in
# the SAME measurement window (the committed BENCH_SF1_r13.json was
# taken under load_max 25.8 — re-timing the subset fresh keeps the
# sf1→sf10 ratios honest).  Usage: tools/rehearse_sf10.sh [step]
set -euo pipefail
cd /root/repo

SUBSET="q1_agg,q_groupby_accs,q_topk_group,q_heavy_hitters,q_histogram,q_distinct_keys,\
q_join_inner,q_join_left,q_join_salted,q_join_range,q_join_nearest,q_asof_join,q_lookup,q_match,q_semi,\
q_zorder,q_partitioned_prune,q_skipping_read,q_compact_read,\
q_dedup_exact,q_dedup_lines,q_dedup_spans,q_minhash_pairs,q_minhash_append,q_dedup_incremental,\
q_dedup_ingest,q_dedup_stream_batch,q_canonical,q_simhash_pairs,q_ssjoin_exact,\
q_containment,q_containment_join,q_containment_dedup,q_edit_pairs,q_edit_join,q_semdedup,\
q_embedding_pairs,q_components,q_components_dist,q_dedup_corpus,q_ngram_pairs,q_pair_budget,\
q_ann_gate,q_ann_ivf,q_ann_pq,q_ann_append,q_ann_ivfsq,q_ann_compact,q_knn,q_kmeans,\
q_upsert_stream,q_phash_stream_batch,q_ann_enrich_batch,q_sessionize,q_events_window,q_rolling_stream,\
io_parquet_save,io_parquet_load,io_csv_write,io_csv_read_typed,io_jsonl_write,io_jsonl_read"

step="${1:-all}"

gen() {
  local src="$1" dst="$2" factor="$3"
  SPARK_DRIVER_MEM=32g sbt -batch "Test/runMain graft.ScaleTestData $src $dst $factor"
}

bench() {
  # ${5-...} (no colon): an explicitly-passed EMPTY 5th arg means "no
  # filter — run every row" (Bench treats empty BENCH_ONLY as no filter);
  # only an ABSENT 5th arg falls back to the flagship subset.
  local dir="$1" out="$2" reps="$3" mem="$4" only="${5-$SUBSET}"
  # sbt prefixes runMain stdout with "[info] " — strip it before the match
  SPARK_DRIVER_MEM="$mem" SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_REPS="$reps" \
    SPARK_GRAFT_BENCH_ONLY="$only" \
    sbt -batch "runMain graft.Bench" 2>"$out.err" | sed 's/^\[info\] //' | grep '^{"metric"' > "$out"
  echo "== wrote $out"
}

case "$step" in
  gen1)  gen /root/testdata/sf0.1 /tmp/graft_sf1 10 ;;
  gen10) gen /root/testdata/sf0.1 /tmp/graft_sf10 100 ;;
  sf1)   bench /tmp/graft_sf1  /root/repo/BENCH_SF1B_r14.json 2 32g ;;
  # r14 directive 3: the FULL row set at sf1 in one quiet window (the
  # committed r13 full record predates the containment restructure)
  sf1full) bench /tmp/graft_sf1 /root/repo/BENCH_SF1_r14.json 2 48g "" ;;
  sf10)  bench /tmp/graft_sf10 /root/repo/BENCH_SF10_r14.json 2 96g ;;
  all)   "$0" gen1; "$0" gen10; "$0" sf1; "$0" sf10 ;;
esac
