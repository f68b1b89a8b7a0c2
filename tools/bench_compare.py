#!/usr/bin/env python3
"""Compare a fresh target/bench.json against a prior round's BENCH_rNN.json.

Prior rounds may only carry a truncated stdout tail ("parsed": null), so
per-query numbers are regex-scraped from whatever survives of the tail.
Usage: bench_compare.py NEW_BENCH_JSON OLD_BENCH_ARTIFACT [ratio_threshold]
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:  # a Bench-written file
        return d["queries"]
    # scrape "name":sec pairs out of the tail fragment (BENCHQ lines carry
    # the FULL per-query map in 20-query chunks; the compact stdout JSON
    # only keeps the 20 slowest). Anchor the scrape to BENCHQ lines when any
    # survive, so a stray "qNN":number from an unrelated log fragment can't
    # leak into the comparison; fall back to the whole tail otherwise.
    tail = d.get("tail", "")
    benchq_lines = "\n".join(l for l in tail.splitlines() if l.startswith("BENCHQ"))
    scraped = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q[^"]+|x_[^"]+)":(-?\d+\.?\d*)',
                             benchq_lines or tail)
    }
    if d.get("parsed"):
        parsed = d["parsed"].get("queries", d["parsed"])
        if isinstance(parsed, dict):
            # the compact line is truncated by design; merge the scraped
            # BENCHQ pairs so cross-round comparisons keep every query —
            # structured compact-JSON values win on key collision
            if d["parsed"].get("n_queries", 0) > len(parsed):
                return {**scraped, **parsed}
            return parsed
    return scraped


def main():
    new = load_queries(sys.argv[1])
    old = load_queries(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    rows = []
    for name, nv in sorted(new.items()):
        ov = old.get(name)
        if ov is None or ov <= 0 or nv <= 0:
            continue
        rows.append((nv / ov, name, ov, nv))
    rows.sort(reverse=True)
    regressed = [r for r in rows if r[0] > thresh]
    print(f"{len(rows)} comparable queries; {len(regressed)} over {thresh}x")
    for ratio, name, ov, nv in rows[:20]:
        flag = " <-- " if ratio > thresh else ""
        print(f"  {name:36s} {ov:7.2f}s -> {nv:7.2f}s  ({ratio:4.2f}x){flag}")
    failed = sorted(n for n, v in new.items() if v < 0)
    if failed:
        print(f"FAILED in new run: {failed}")


if __name__ == "__main__":
    main()
