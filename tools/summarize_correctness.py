#!/usr/bin/env python3
"""Compute the gate summary FROM THE DRIVER ARTIFACT, not local claims.

Round-9 lesson (VERDICT r9 #3): ROUND_NOTES counted queries as
"full-oracle" that the driver's CORRECTNESS file marked hash-fail.
Any claimed count in README/ROUND_NOTES must come from this script
run against the newest CORRECTNESS_r*.json.

Usage: python3 tools/summarize_correctness.py [CORRECTNESS_rNN.json]
       (defaults to the lexically-latest CORRECTNESS_r*.json in repo root)
"""
import glob
import json
import os
import sys


def main() -> int:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
        if not files:
            print("no CORRECTNESS_r*.json found", file=sys.stderr)
            return 2
        path = files[-1]
    data = json.load(open(path))
    green, red, no_oracle = [], [], []
    for name, row in sorted(data.items()):
        if row.get("err") == "no_oracle":
            no_oracle.append(name)
        elif row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
            green.append(name)
        else:
            red.append(name)
    print(f"artifact:     {os.path.basename(path)}")
    print(f"queries:      {len(data)}")
    print(f"full-oracle:  {len(green)} green")
    print(f"rows-only:    {len(no_oracle)} ({', '.join(no_oracle) or '-'})")
    print(f"RED:          {len(red)} ({', '.join(red) or '-'})")
    return 1 if red else 0


if __name__ == "__main__":
    sys.exit(main())
