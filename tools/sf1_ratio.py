#!/usr/bin/env python3
"""Full-surface sf1/sf0.1 timing ratios (round-16 verdict task 3).

Reads two Bench full artifacts (the kill-safe JSON the bench rewrites on
every emit) — one measured at sf0.1, one at testdata-sf1 — and emits a
per-query ratio table sorted worst-first, plus the >threshold flag list
the round must fix or explain. Ratios are TOTAL-time (sf1_sec /
sf01_sec, the bench_sf1_extra convention): 10x data, so ~1.0 means
overhead-floored, ~10 means perfectly data-proportional, >threshold
(default 3.0) means either real data-proportional work (fine if the
operator's output grows with data — document it) or a plan that changed
shape across the decade (fix it).

Usage:
    python3 tools/sf1_ratio.py <bench_full_sf01.json> <bench_full_sf1.json>
        <out.json> [--threshold 3.0]
"""
import json, sys


def main(argv):
    a01, a1, out = argv[0], argv[1], argv[2]
    thr = 3.0
    if len(argv) > 4 and argv[3] == "--threshold":
        thr = float(argv[4])
    d01 = json.load(open(a01))
    d1 = json.load(open(a1))
    q01, q1 = d01["queries"], d1["queries"]
    fp01 = d01.get("plan_fp", {})
    fp1 = d1.get("plan_fp", {})
    rows = {}
    for name in sorted(set(q01) & set(q1)):
        t0, t1 = q01[name], q1[name]
        if t0 <= 0 or t1 <= 0:
            rows[name] = {"sf01_sec": t0, "sf1_sec": t1, "ratio": -1.0,
                          "note": "failed measurement"}
            continue
        r = {"sf01_sec": round(t0, 3), "sf1_sec": round(t1, 3),
             "ratio": round(t1 / t0, 2)}
        # a cross-SF fingerprint CHANGE is expected for data-dependent
        # strategies (AQE re-costs at 10x data) but is exactly where a
        # wrong-at-scale plan would hide — surface it for the flag audit
        if fp01.get(name) and fp1.get(name) and fp01[name] != fp1[name]:
            r["fp_changed"] = 1
        rows[name] = r
    flagged = sorted((n for n, r in rows.items() if r["ratio"] > thr),
                     key=lambda n: -rows[n]["ratio"])
    missing = sorted(set(q01) ^ set(q1))
    ordered = dict(sorted(rows.items(), key=lambda kv: -kv[1]["ratio"]))
    art = {"metric": "sf1_ratio", "threshold": thr,
           "n_queries": len(rows), "flagged": flagged,
           "n_fp_changed": sum(1 for r in rows.values()
                               if r.get("fp_changed")),
           "only_in_one": missing, "queries": ordered}
    json.dump(art, open(out, "w"), indent=1)
    print(f"{len(rows)} queries, {len(flagged)} over {thr}x: {flagged}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
