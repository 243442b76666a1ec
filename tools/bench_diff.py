#!/usr/bin/env python3
"""Per-query bench regression report from bench_history.jsonl.

Compares the two most recent entries for a scale-factor dir (default
sf0.1) and prints the biggest per-query deltas. Dev tool only.

Usage: python3 tools/bench_diff.py [sf0.1|sf0.01] [topN]
"""
import json
import sys


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    entries = [json.loads(l) for l in open("bench_history.jsonl")]
    # skip focused runs (SPARK_GRAFT_BENCH_ONLY) — they are not rounds
    matching = [e for e in entries
                if e.get("sf", "").endswith(sf) and e.get("n_queries", 0) >= 10]
    if len(matching) < 2:
        sys.exit(f"need >= 2 entries for {sf}, have {len(matching)}")
    prev, last = matching[-2], matching[-1]
    qp, ql = prev["queries"], last["queries"]
    common = sorted(set(qp) & set(ql), key=lambda k: ql[k] - qp[k])
    print(f"{sf}: {prev['value']:.1f}s/{prev['n_queries']}q -> "
          f"{last['value']:.1f}s/{last['n_queries']}q "
          f"({prev['sec_per_query']:.3f} -> {last['sec_per_query']:.3f} s/q)")
    print(f"\nnew queries: {sorted(set(ql) - set(qp)) or 'none'}")
    print(f"\ntop {top} regressions (delta s):")
    for k in reversed(common[-top:]):
        print(f"  {ql[k] - qp[k]:+7.2f}  {k}  ({qp[k]:.2f} -> {ql[k]:.2f})")
    print(f"\ntop {top} improvements (delta s):")
    for k in common[:top]:
        print(f"  {ql[k] - qp[k]:+7.2f}  {k}  ({qp[k]:.2f} -> {ql[k]:.2f})")


if __name__ == "__main__":
    main()
