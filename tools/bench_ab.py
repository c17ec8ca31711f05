#!/usr/bin/env python3
"""Three-way bench A/B table (round-11): compare two HEAD records and
one previous-round record taken in the same host session, on their
common query subset, per-query minima. Usage:

  python3 tools/bench_ab.py headA.json headB.json prev.json [label_prev]

Prints a markdown table: common-subset sums, per-record sentinels, and
the queries whose HEAD-min vs prev time differ most (both directions).
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    qs = {k: v for k, v in d["queries"].items() if v >= 0}
    return d, qs


def main():
    a_path, b_path, p_path = sys.argv[1:4]
    label = sys.argv[4] if len(sys.argv) > 4 else "prev"
    da, qa = load(a_path)
    db, qb = load(b_path)
    dp, qp = load(p_path)
    head = {k: min(qa[k], qb[k]) for k in qa.keys() & qb.keys()}
    common = sorted(head.keys() & qp.keys())
    sh = sum(head[k] for k in common)
    sp = sum(qp[k] for k in common)
    print(f"| record | queries | total (s) | common-{len(common)} sum (s) | sentinels |")
    print("|---|---|---|---|---|")
    for name, d, qs in (("HEAD run A", da, qa), ("HEAD run B", db, qb),
                        (label, dp, qp)):
        c = sum(qs[k] for k in common if k in qs)
        print(f"| {name} | {len(qs)} | {d['value']:.1f} | {c:.1f} | "
              f"{'/'.join(f'{s:.2f}' for s in d['sentinels_s'])} |")
    print(f"| HEAD min-of-2 |  |  | {sh:.1f} | |")
    print()
    print(f"HEAD(min) vs {label} on common-{len(common)}: "
          f"{sh:.1f} vs {sp:.1f} = {sh / sp:.3f}x")
    deltas = sorted(common, key=lambda k: head[k] - qp[k])
    rows = [k for k in deltas if abs(head[k] - qp[k]) > 0.3]
    slower = [k for k in reversed(deltas) if head[k] - qp[k] > 0.3][:8]
    faster = [k for k in deltas if qp[k] - head[k] > 0.3][:8]
    if slower:
        print("\nslower at HEAD (>0.3 s):")
        for k in slower:
            print(f"  {k}: {qp[k]:.2f} -> {head[k]:.2f}")
    if faster:
        print("\nfaster at HEAD (>0.3 s):")
        for k in faster:
            print(f"  {k}: {qp[k]:.2f} -> {head[k]:.2f}")


if __name__ == "__main__":
    main()
