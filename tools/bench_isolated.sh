#!/bin/bash
# Isolated per-query bench medians — the j1-closure adjudication
# procedure, automated (r13 verdict ask #2).
#
# Every round since r10 burned a verdict cycle on "is this single-pass
# sf10 mover real?" (r11: j1_anti_join; r12: dd_simhash / _hi /
# tx_tfidf — all adjudicated as variance). This script makes isolated
# medians a committed artifact instead of an ad-hoc dispute procedure:
# each query runs in its OWN fresh JVM (java -cp directly — no sbt
# startup, no shared session aging, no neighbor teardown backlog), for
# PASSES passes, and the merged artifact records median + min/max
# spread per query so the next verdict reads regressions off directly.
#
# Usage:
#   tools/bench_isolated.sh <sfDir> <out.json> [passes] [query ...]
# With no query args, runs the TOP_N (default 10) most expensive
# queries of the committed BENCH_sf10.json (the canonical soak's
# single-pass record) minus grading companions.
#
# Prereqs: target/scala-2.13/classes compiled (sbt compile) and the
# Spark jars at /opt/spark/jars. Driver memory via SPARK_DRIVER_MEM
# (default 48g — sized for sf10). Run on a quiet host, never
# concurrently with sbt or another soak (bench-methodology rule).
set -u
SFDIR="${1:?sfDir}"; OUT="${2:?out.json}"; PASSES="${3:-3}"
# shift past however many positionals were actually given (a plain
# `shift 3` on a 2-arg call fails WITHOUT shifting, leaving sfDir/out
# in $@ to be misread as query names)
if [ $# -ge 3 ]; then shift 3; else shift $#; fi
QUERIES=("$@")
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MEM="${SPARK_DRIVER_MEM:-48g}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
TOP_N="${SPARK_GRAFT_ISOLATE_TOP:-10}"

if [ ${#QUERIES[@]} -eq 0 ]; then
  mapfile -t QUERIES < <(python3 - "$REPO/BENCH_sf10.json" "$TOP_N" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
comp = set(d.get("grading_companions", []))
qs = [(v, k) for k, v in d["queries"].items() if k not in comp and v >= 0]
for _, k in sorted(qs, reverse=True)[: int(sys.argv[2])]:
    print(k)
EOF
)
fi
if [ ${#QUERIES[@]} -eq 0 ]; then
  echo "[isolated] ERROR: no queries (missing/unreadable BENCH_sf10.json and none given)" >&2
  exit 2
fi
echo "[isolated] ${#QUERIES[@]} queries x $PASSES passes at $SFDIR" >&2

# the same JDK17 module opens + session pins build.sbt applies to
# forked runs (GraftSession creates the session outside spark-submit)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
# SPARK_BENCH_PRETOUCH=on: pre-fault the whole heap at JVM startup
# (-Xms=$MEM -XX:+AlwaysPreTouch) so a memory-degraded hypervisor's
# page-supply cost lands in untimed startup instead of pass 1 (r17:
# ~12 MB/s host page-zeroing measured — 66 min of sys time for 48 GB,
# so only enable with a smaller SPARK_DRIVER_MEM or on a healthy host).
PRETOUCH=""
[ "${SPARK_BENCH_PRETOUCH:-off}" = "on" ] && PRETOUCH="-Xms$MEM -XX:+AlwaysPreTouch"

TMP=$(mktemp -d)
FAILED=0
# temp dir is kept on failure so the per-query .err files survive for
# diagnosis; removed only on a fully green run
trap '[ "$FAILED" -eq 0 ] && rm -rf "$TMP"' EXIT
for q in "${QUERIES[@]}"; do
  echo "[isolated] $q ..." >&2
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_PASSES="$PASSES" SPARK_GRAFT_BENCH_GC=on \
  SPARK_GRAFT_BENCH_OUT="$TMP/$q.json" \
    java -Xmx"$MEM" $PRETOUCH $OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench "$q" > /dev/null 2> "$TMP/$q.err" \
    || { echo "[isolated] FAIL $q (errors kept at $TMP/$q.err)" >&2
         tail -5 "$TMP/$q.err" >&2; FAILED=1; }
done

# label-warm second leg (r13 verdict ask #7): any query Bench flagged
# label_cold gets re-run with SPARK_GRAFT_BENCH_LABELS=warm (untimed
# pre-warm per pass — the full-run semantics), so the artifact carries
# BOTH numbers: production+marginal (cold) and the post-label marginal
# comparable to in-suite medians (warm).
for q in "${QUERIES[@]}"; do
  if [ -f "$TMP/$q.json" ] && python3 -c "
import json, sys
sys.exit(0 if '$q' in json.load(open('$TMP/$q.json')).get('label_cold', []) else 1)
" 2>/dev/null; then
    echo "[isolated] $q (label-warm leg) ..." >&2
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_BENCH_PASSES="$PASSES" SPARK_GRAFT_BENCH_GC=on \
    SPARK_GRAFT_BENCH_LABELS=warm \
    SPARK_GRAFT_BENCH_OUT="$TMP/warm__$q.json" \
      java -Xmx"$MEM" $PRETOUCH $OPENS \
        -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
        -cp "$CP" graft.Bench "$q" > /dev/null 2> "$TMP/warm__$q.err" \
      || { echo "[isolated] FAIL $q warm leg (errors kept at $TMP/warm__$q.err)" >&2
           tail -5 "$TMP/warm__$q.err" >&2; FAILED=1; }
  fi
done

if [ "$FAILED" -ne 0 ]; then
  # never clobber a committed artifact with a silently-partial one —
  # the partial lands next to it, clearly named
  OUT="$OUT.partial"
  echo "[isolated] failures occurred: writing PARTIAL artifact to $OUT" >&2
fi

# BASELINE_ARTIFACT: the committed band to diff against (r13 verdict
# ask #5 — self-adjudicating variance budgets). Default: the committed
# sf10 artifact when measuring an sf10 dir; set explicitly otherwise,
# or to /dev/null to skip.
BASELINE="${BASELINE_ARTIFACT:-}"
if [ -z "$BASELINE" ] && [[ "$SFDIR" == *sf10* ]]; then
  BASELINE="$REPO/BENCH_sf10_isolated.json"
fi

python3 - "$TMP" "$OUT" "$SFDIR" "$PASSES" "$BASELINE" <<'EOF'
import json, glob, os, sys, statistics
tmp, out, sfdir, passes, baseline = sys.argv[1:6]
queries, spread, passes_by_query = {}, {}, {}
warm_queries, warm_passes = {}, {}
for f in sorted(glob.glob(os.path.join(tmp, "*.json"))):
    d = json.load(open(f))
    warm = os.path.basename(f).startswith("warm__")
    for k, v in d["queries"].items():
        ps = d.get("passes_by_query", {}).get(k, [])
        if warm:
            warm_queries[k] = v
            warm_passes[k] = ps
            continue
        queries[k] = v
        passes_by_query[k] = ps
        if ps:
            spread[k] = {"min": min(ps), "max": max(ps),
                         "rel_spread": round((max(ps) - min(ps)) / statistics.median(ps), 3)
                         if statistics.median(ps) > 0 else None}
# arg-filtered Bench runs charge cluster-label production to the
# consumer ON EVERY PASS (Bench clears the label cache so the one
# number asked for includes the dominant cost) — so for these queries
# the isolated median is label-production + marginal query, NOT the
# in-suite post-label marginal. Bench names them in its own artifact
# ("label_cold" — single source, Bench.LabelConsumers); flagged here,
# and each such query ALSO carries a label-warm median (post-label
# marginal, the in-suite-comparable number) in queries_label_warm.
label_cold = set()
for f in sorted(glob.glob(os.path.join(tmp, "*.json"))):
    label_cold.update(json.load(open(f)).get("label_cold", []))
# variance budget: a regression is a new median above the committed
# band's max by >15% (beyond the recorded per-pass spread, with margin
# for host window) — the field a verdict reads instead of adjudicating
# single draws by hand. Empty on a healthy round.
regressions = []
baseline_used = None
if baseline and os.path.exists(baseline):
    try:
        b = json.load(open(baseline))
        baseline_used = baseline
        for k, v in queries.items():
            if k not in b.get("queries", {}):
                continue
            bmed = b["queries"][k]
            bmax = b.get("spread", {}).get(k, {}).get("max", bmed)
            # label-cold medians only compare against label-cold baselines
            if (k in label_cold) != (k in set(b.get("includes_label_production", []))):
                continue
            if v > max(bmed, bmax) * 1.15:
                regressions.append({"query": k, "median": v,
                                    "baseline_median": bmed, "baseline_max": bmax})
    except Exception as e:
        print(f"[isolated] baseline diff skipped: {e}", file=sys.stderr)
# bank-build vs steady-state split (r14 verdict ask #4): scan-tier
# queries memoize a broadcast bank across passes within the JVM, so
# pass 1 bundles the one-time bank build with the query while warm
# passes are the production steady state. first_pass/warm_median are
# emitted for every query; bank_build_sec (their difference, floored
# at 0) is named only for the bank families so a future-round reader
# doesn't misread a first-pass draw as a steady-state regression.
BANK_QUERIES = {"dd_simhash", "dd_winnow_overlap", "sim_ann_lsh",
                "sim_ann_ivf", "sim_ann_lsh_cand", "sim_ann_ivf_cand",
                "dd_semdedup", "cu_dedup_semantic",
                "dd_embed_neardup", "dd_embed_neardup_hi"}
first_pass = {k: ps[0] for k, ps in passes_by_query.items() if ps}
warm_median = {k: round(statistics.median(ps[1:]), 3)
               for k, ps in passes_by_query.items() if len(ps) >= 2}
bank_build_sec = {k: round(max(0.0, first_pass[k] - warm_median[k]), 3)
                  for k in sorted(BANK_QUERIES & set(warm_median))}
artifact = {"metric": "isolated_medians", "unit": "sec", "stat": "median",
            "passes": int(passes), "sf": sfdir, "isolation": "fresh JVM per query",
            "queries": queries, "passes_by_query": passes_by_query, "spread": spread,
            "first_pass": first_pass, "warm_median": warm_median,
            "bank_build_sec": bank_build_sec,
            "includes_label_production": sorted(label_cold),
            "queries_label_warm": warm_queries,
            "passes_by_query_label_warm": warm_passes,
            "baseline": baseline_used, "regressions": regressions,
            "total_of_medians": round(sum(queries.values()), 3)}
json.dump(artifact, open(out, "w"), indent=1)
print(json.dumps({"isolated_total": artifact["total_of_medians"],
                  "n": len(queries), "regressions": len(regressions)}))
EOF
exit $FAILED
