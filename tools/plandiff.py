#!/usr/bin/env python3
"""Diff two Bench full artifacts' physical-plan fingerprints and timings.

Round-11 verdict task 2: the bench emits a per-query plan fingerprint
(md5 over the sorted multiset of executed-plan node names) precisely so
that round-over-round time movement can be attributed mechanically —
"the plan changed" vs "the data or the box re-costed" — instead of by
hand-run Explains. This tool consumes two `bench_full.json` files
(committed per round as docs/bench_full_r{N}.json) and prints, per
query: old/new fingerprint, whether it changed, old/new seconds, and
delta — sorted by |delta| descending so the movers lead.

Caveat (measured in round 11's calibration): ~5/197 fingerprints flip
between same-code runs from AQE broadcast decisions re-costing at
runtime; a fp change on a ±0.1 s query is noise, a fp change on a mover
is the lead to chase.

Usage: python3 tools/plandiff.py OLD_full.json NEW_full.json [--all]
  --all  print every query, not just movers (|delta| >= 0.25 s) and
         fp changes
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    o_fp, n_fp = old.get("plan_fp", {}), new.get("plan_fp", {})
    o_t, n_t = old.get("queries", {}), new.get("queries", {})
    names = sorted(set(o_t) | set(n_t))
    rows = []
    for q in names:
        ot, nt = o_t.get(q), n_t.get(q)
        of, nf = o_fp.get(q, "-"), n_fp.get(q, "-")
        delta = (nt - ot) if (ot is not None and nt is not None
                              and ot >= 0 and nt >= 0) else None
        rows.append((q, of, nf, ot, nt, delta))

    changed = [r for r in rows if r[1] != r[2] and "-" not in (r[1], r[2])]
    movers = [r for r in rows if r[5] is not None and abs(r[5]) >= 0.25]
    added = [r for r in rows if r[3] is None and r[4] is not None]
    removed = [r for r in rows if r[4] is None and r[3] is not None]

    def tot(d):
        return sum(v for v in d.get("queries", {}).values() if v >= 0)

    print(f"old: {args[0]}  total={tot(old):.1f}s  "
          f"sweeps={old.get('sweeps_completed')}")
    print(f"new: {args[1]}  total={tot(new):.1f}s  "
          f"sweeps={new.get('sweeps_completed')}")
    print(f"queries: {len(names)}  fp-changed: {len(changed)}  "
          f"movers(|dt|>=0.25s): {len(movers)}  added: {len(added)}  "
          f"removed: {len(removed)}")
    print()
    hdr = f"{'query':<8} {'fp_old':<14} {'fp_new':<14} {'chg':<4} " \
          f"{'t_old':>7} {'t_new':>7} {'delta':>7}"
    print(hdr)
    print("-" * len(hdr))
    shown = rows if show_all else sorted(
        {r[0] for r in changed} | {r[0] for r in movers}
        | {r[0] for r in added} | {r[0] for r in removed})
    if not show_all:
        by_name = {r[0]: r for r in rows}
        shown = [by_name[q] for q in shown]
    shown = sorted(shown, key=lambda r: -(abs(r[5]) if r[5] is not None
                                          else float("inf")))
    for q, of, nf, ot, nt, delta in shown:
        chg = "FP*" if (of != nf and "-" not in (of, nf)) else ""
        ots = f"{ot:.2f}" if ot is not None else "-"
        nts = f"{nt:.2f}" if nt is not None else "-"
        ds = f"{delta:+.2f}" if delta is not None else "-"
        print(f"{q:<8} {of:<14} {nf:<14} {chg:<4} {ots:>7} {nts:>7} {ds:>7}")


if __name__ == "__main__":
    main()
