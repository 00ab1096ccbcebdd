#!/usr/bin/env python3
"""Adjudicate cross-SF plan-fingerprint changes (round-17 verdict task 3).

Inputs: two FpCensus output dirs (e.g. sf0.1 and sf1 runs over the same
query subset). For each query present in both census.json files, compares
the canonical node multisets (the <query>.<fp>.nodes dumps) and classifies
the delta:

  - identical         : same fingerprint at both SFs
  - broadcast_to_merge: BroadcastHashJoin count fell, SortMergeJoin rose —
                        AQE re-costing a grown side out of broadcast range,
                        the scale-RIGHT direction
  - merge_to_broadcast: the reverse — a DEMOTION at bigger data, flagged
  - other             : any other node delta, listed for manual read
  - unstable          : >1 fingerprint within a single SF's census (a
                        run-to-run flip, not a scale effect)

Usage: fp_adjudicate.py <censusDirSmall> <censusDirBig> [out.json]
"""
import json, os, sys
from collections import Counter


def load(census_dir):
    with open(os.path.join(census_dir, "census.json")) as f:
        c = json.load(f)
    out = {}
    for q, fps in c["queries"].items():
        nodes = {}
        for fp in fps:
            p = os.path.join(census_dir, f"{q}.{fp}.nodes")
            if os.path.exists(p):
                nodes[fp] = Counter(
                    l.strip() for l in open(p) if l.strip())
        out[q] = (fps, nodes)
    return out


def main():
    small_dir, big_dir = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    small, big = load(small_dir), load(big_dir)
    rows = {}
    for q in sorted(set(small) & set(big)):
        sfps, snodes = small[q]
        bfps, bnodes = big[q]
        if len(sfps) > 1 or len(bfps) > 1:
            rows[q] = {"verdict": "unstable",
                       "small_fps": list(sfps), "big_fps": list(bfps)}
            continue
        sfp, bfp = next(iter(sfps)), next(iter(bfps))
        if sfp == bfp:
            rows[q] = {"verdict": "identical", "fp": sfp}
            continue
        sc, bc = snodes.get(sfp, Counter()), bnodes.get(bfp, Counter())
        gained = {k: v for k, v in (bc - sc).items()}
        lost = {k: v for k, v in (sc - bc).items()}
        bhj_down = lost.get("BroadcastHashJoin", 0) \
            + lost.get("BroadcastNestedLoopJoin", 0) \
            + lost.get("BroadcastExchange", 0)
        smj_up = gained.get("SortMergeJoin", 0) \
            + gained.get("ShuffledHashJoin", 0)
        bhj_up = gained.get("BroadcastHashJoin", 0) \
            + gained.get("BroadcastNestedLoopJoin", 0)
        smj_down = lost.get("SortMergeJoin", 0) \
            + lost.get("ShuffledHashJoin", 0)
        joinish = {"BroadcastHashJoin", "BroadcastNestedLoopJoin",
                   "BroadcastExchange", "SortMergeJoin", "ShuffledHashJoin",
                   "Sort", "Exchange", "ExchangeReuse", "ShuffleExchange"}
        non_join = {k for k in list(gained) + list(lost)
                    if k.split("(")[0] not in joinish
                    and not k.startswith("Sort")
                    and not k.startswith("Exchange")
                    and not k.startswith("ShuffleExchange")
                    and not k.startswith("AQEShuffleRead")}
        if bhj_down and smj_up and not bhj_up and not non_join:
            verdict = "broadcast_to_merge"
        elif bhj_up and smj_down and not bhj_down and not non_join:
            verdict = "merge_to_broadcast"
        else:
            verdict = "other"
        rows[q] = {"verdict": verdict, "small_fp": sfp, "big_fp": bfp,
                   "gained": gained, "lost": lost}
    counts = Counter(r["verdict"] for r in rows.values())
    result = {"metric": "fp_adjudication", "small": small_dir,
              "big": big_dir, "n": len(rows), "verdicts": dict(counts),
              "queries": rows}
    js = json.dumps(result, indent=1, sort_keys=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(js + "\n")
    print(js)


if __name__ == "__main__":
    main()
