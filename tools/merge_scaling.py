#!/usr/bin/env python3
"""Merge SCALING.partial.json probe rows into SCALING.json.

A ScaleStress subset run (probe re-measurement after a fix, or a
protocol run at a non-default heap) writes SCALING.partial.json so it
can never clobber the full board; this script folds the chosen probes
into the committed record. Usage:

  python3 tools/merge_scaling.py [probe ...]   # default: every probe
                                               # in the partial file
"""
import json
import sys

def main():
    full = json.load(open("SCALING.json"))
    part = json.load(open("SCALING.partial.json"))
    names = sys.argv[1:] or sorted(part["queries"])
    for n in names:
        if n not in part["queries"]:
            raise SystemExit(f"{n} not in SCALING.partial.json")
        full["queries"][n] = part["queries"][n]
        print(f"merged {n}: {part['queries'][n]}")
    scales = sorted({s for q in full["queries"].values() for s in q["t"]},
                    key=int)
    full["scales"] = [int(s) for s in scales]
    with open("SCALING.json", "w") as f:
        json.dump(full, f, separators=(",", ":"))
    print(f"SCALING.json now has {len(full['queries'])} probes")

if __name__ == "__main__":
    main()
