#!/bin/bash
# The canonical one-HEAD scale soak (SCALE_SOAK.md discipline, r13):
# sf1 3-pass / sf4 2-pass GC-on / sf10 1-pass with the fenced-quadratic
# grading companions excluded, writing BENCH_sf{1,4,10}.json — then the
# top-N most expensive sf10 queries re-measured as fresh-JVM isolated
# 3-pass medians (tools/bench_isolated.sh) into BENCH_sf10_isolated.json.
#
# The isolated stage is what retires the single-pass variance dispute
# class (r11 j1, r12 simhash/_hi/tfidf — every one adjudicated as
# variance): the committed per-query numbers are medians with recorded
# spreads, so the next round reads regressions off directly instead of
# relitigating draws.
#
# Run from the repo root on a QUIET host (no concurrent sbt/tests —
# bench-methodology rule), after `sbt compile`. Scale data at
# target/testdata/sf{1,4,10} (graft.tools.ScaleDataGen).
set -eu
cd "$(dirname "$0")/.."
EXCL3=sim_cosine_topk,sim_cosine_neardup,sim_ann_recall
EXCL5=$EXCL3,sim_ann_lsh_cand,sim_ann_ivf_cand
# sf10 additionally excludes the ADVERSARIAL embed point (cos 0.45,
# rho~0.62) from the wall-clock tier BY THE ENGINE'S OWN CONTRACT
# (r14, closing the r13 verdict's embed-endgame ask on its option-b
# branch): spark.graft.embed.regime=enforce REFUSES this regime, the
# r11/r12 probes pinned its cost as admitted-mass physics no plan
# change removes, and it was 32% of the r13 sf10 wall for a regime the
# library advises against running. The witness stays HONEST: its
# oracle row stays hash-graded (sf0.01 CORRECTNESS + the sf0.1 bench
# keep it), and the soak still measures it — isolated, 1-pass, into
# BENCH_sf10_refused.json below, diffed against the committed band.
# The PRODUCTION point (dd_embed_neardup_hi, cos 0.8) stays in-suite.
EXCL10=$EXCL5,dd_embed_neardup

echo "[soak] sf1 (3-pass)" >&2
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=target/testdata/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_PASSES=3 SPARK_GRAFT_BENCH_EXCLUDE=$EXCL3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench"

echo "[soak] sf4 (2-pass, GC on)" >&2
SPARK_DRIVER_MEM=24g SPARK_GRAFT_SF_DIR=target/testdata/sf4 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_PASSES=2 SPARK_GRAFT_BENCH_GC=on SPARK_GRAFT_BENCH_EXCLUDE=$EXCL5 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf4.json \
  sbt -batch "runMain graft.Bench"

echo "[soak] sf10 (1-pass, supported-regime envelope)" >&2
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/testdata/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_EXCLUDE=$EXCL10 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  sbt -batch "runMain graft.Bench"

# snapshot the COMMITTED isolated baseline before this soak overwrites
# it — both stages below must diff against last round's bands, and the
# refused witness runs after the isolated stage would have replaced
# them (the r14 soak caught a 424 s hot-host draw only on re-check
# because of exactly this ordering)
PREV_BASELINE=$(mktemp)
cp BENCH_sf10_isolated.json "$PREV_BASELINE" 2>/dev/null || PREV_BASELINE=/dev/null
# SOAK_ISOLATED_BASELINE: override which committed artifact the isolated
# stage diffs against — used when the last committed artifact is known-
# contaminated (r17: degraded-host draws; the r18 re-baseline diffs
# against the preserved r16 quiet bands instead)
PREV_BASELINE="${SOAK_ISOLATED_BASELINE:-$PREV_BASELINE}"

echo "[soak] sf10 isolated top-10 medians" >&2
SPARK_DRIVER_MEM=48g BASELINE_ARTIFACT="$PREV_BASELINE" \
  tools/bench_isolated.sh target/testdata/sf10 BENCH_sf10_isolated.json 3

# the witness diffs against its OWN committed artifact — it left the
# isolated top-10 when the wall-clock tier stopped running it, so the
# isolated baseline no longer carries its band
PREV_REFUSED=$(mktemp)
cp BENCH_sf10_refused.json "$PREV_REFUSED" 2>/dev/null || PREV_REFUSED="$PREV_BASELINE"
echo "[soak] sf10 contract-refused regime witness (isolated, 1-pass)" >&2
SPARK_DRIVER_MEM=48g BASELINE_ARTIFACT="$PREV_REFUSED" \
  tools/bench_isolated.sh target/testdata/sf10 BENCH_sf10_refused.json 1 \
  dd_embed_neardup
rm -f "$PREV_BASELINE" "$PREV_REFUSED" 2>/dev/null || true
echo "[soak] done: BENCH_sf{1,4,10}.json + BENCH_sf10_isolated.json + BENCH_sf10_refused.json" >&2
