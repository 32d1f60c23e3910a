#!/usr/bin/env python3
"""Plan-shape audit over graft.Explain output (r21 optimization round).

Parses the concatenated `graft.Explain <all queries>` output and flags,
per query, the smells the optimization guide names (§2.4, §3.1, §6):
  - CartesianProduct / BroadcastNestedLoopJoin (outside the fenced
    quadratic grading oracles)
  - SortMergeJoin count (candidates for broadcast/shuffled-hash review)
  - Exchange count (shuffle boundaries)
  - parquet scans with an empty PushedFilters next to a Filter above
    the scan (pushdown misses)
  - ReadSchema column counts per scan (projection width at the source)

Usage: tools/plan_audit.py <explain_output.txt> [fenced_csv]
"""
import re
import sys

FENCED_DEFAULT = {
    "sim_cosine_topk", "sim_cosine_neardup", "sim_ann_recall",
    "sim_ann_lsh_cand", "sim_ann_ivf_cand", "dd_semdedup",
    "cu_dedup_semantic", "cu_decontaminate_sem", "dd_source_overlap",
}

def main():
    txt = open(sys.argv[1]).read()
    fenced = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else FENCED_DEFAULT
    parts = re.split(r"=+ (\w+) =+", txt)
    rows = []
    for i in range(1, len(parts), 2):
        name, body = parts[i], parts[i + 1]
        cart = len(re.findall(r"CartesianProduct", body))
        bnl = len(re.findall(r"BroadcastNestedLoopJoin", body))
        smj = len(re.findall(r"SortMergeJoin", body))
        shj = len(re.findall(r"ShuffledHashJoin", body))
        bhj = len(re.findall(r"BroadcastHashJoin", body))
        exch = len(re.findall(r"\bExchange\b", body))
        scans = len(re.findall(r"Scan parquet", body))
        empty_pf = len(re.findall(r"PushedFilters: \[\]", body))
        pf = len(re.findall(r"PushedFilters: \[[^\]]", body))
        rows.append((name, cart, bnl, smj, shj, bhj, exch, scans, pf, empty_pf))
    print(f"{'query':34s} cart bnlj smj shj bhj exch scans pf pf0 flags")
    for r in sorted(rows):
        name = r[0]
        flags = []
        if (r[1] or r[2]) and name not in fenced:
            flags.append("QUADRATIC?")
        if r[3] >= 3:
            flags.append("SMJ-heavy")
        if r[6] >= 12:
            flags.append("scan-heavy")
        print(f"{name:34s} {r[1]:4d} {r[2]:4d} {r[3]:3d} {r[4]:3d} {r[5]:3d} "
              f"{r[6]:4d} {r[7]:5d} {r[8]:2d} {r[9]:3d} {' '.join(flags)}")

if __name__ == "__main__":
    main()
