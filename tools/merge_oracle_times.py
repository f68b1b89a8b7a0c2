#!/usr/bin/env python3
"""Merge a subset check_oracle.py times file into a committed
ORACLE_TIMES_*.json: entries present in the subset overwrite (fresh
re-measurements and newly added queries), everything else is preserved.
Usage: merge_oracle_times.py COMMITTED_TIMES SUBSET_TIMES
"""
import json
import sys


def main():
    committed_path, subset_path = sys.argv[1], sys.argv[2]
    with open(committed_path) as f:
        committed = json.load(f)
    with open(subset_path) as f:
        subset = json.load(f)
    for name, entry in subset["times"].items():
        old = committed["times"].get(name)
        committed["times"][name] = entry
        print(f"  {name}: {old and old.get('oracle_s')} -> {entry.get('oracle_s')}"
              f" ({entry.get('status')})")
    with open(committed_path, "w") as f:
        json.dump(committed, f, indent=1, sort_keys=True)
    print(f"{len(subset['times'])} entries merged into {committed_path} "
          f"({len(committed['times'])} total)")


if __name__ == "__main__":
    main()
