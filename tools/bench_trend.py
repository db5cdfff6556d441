#!/usr/bin/env python3
"""Compare two graft.Bench JSON artifacts query by query.

Usage: python3 tools/bench_trend.py OLD.json NEW.json [--noise 0.2]

Prints per-query median deltas (sorted worst-first), new/removed
queries, and the canary health of both runs. A query is flagged only
when its delta exceeds the noise band AND the two runs' per-rep ranges
do not overlap — medians of overlapping spreads are indistinguishable,
which is exactly the trap a raw median diff falls into (environment
drift between runs reads as a regression; see the canary line first).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise = 0.2
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1])
    old, new = load(args[0]), load(args[1])
    # prefer the drift-corrected per-query estimator when both artifacts
    # carry it (r11+): raw medians inherit environment noise the
    # canary-rebased trimmed min removes
    key = "queries_adj" if ("queries_adj" in old and "queries_adj" in new) \
        else "queries"
    qo, qn = old[key], new[key]
    ro, rn = old.get("reps", {}), new.get("reps", {})

    for tag, j in (("old", old), ("new", new)):
        c = j.get("canary_sec", {})
        print(f"{tag}: total {j['value']:.2f}s over {len(j['queries'])} "
              f"queries, canary {c.get('before')} -> {c.get('after')}")

    shared = sorted(set(qo) & set(qn),
                    key=lambda q: qn[q] / max(qo[q], 1e-9), reverse=True)
    flagged = 0
    for q in shared:
        a, b = qo[q], qn[q]
        ratio = b / max(a, 1e-9)
        # ranges overlap => the medians are not distinguishable
        overlap = (ro.get(q) and rn.get(q) and
                   min(rn[q]) <= max(ro[q]) and min(ro[q]) <= max(rn[q]))
        mark = ""
        if abs(ratio - 1) > noise and not overlap:
            mark = "  <-- REGRESSED" if ratio > 1 else "  <-- improved"
            flagged += 1
        if mark or abs(ratio - 1) > noise:
            print(f"  {q:38s} {a:7.3f} -> {b:7.3f}  ({ratio:5.2f}x){mark}")
    print(f"{flagged} distinguishable changes beyond ±{noise:.0%} "
          f"(of {len(shared)} shared queries)")
    for q in sorted(set(qn) - set(qo)):
        print(f"  NEW     {q:38s} {qn[q]:7.3f}")
    for q in sorted(set(qo) - set(qn)):
        print(f"  REMOVED {q:38s} {qo[q]:7.3f}")


if __name__ == "__main__":
    main()
