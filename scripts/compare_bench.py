#!/usr/bin/env python3
"""Round-over-round bench comparison: common `queries` entries of two
capture JSONs -> total ratio, per-entry median ratio, worst movers.

Usage: compare_bench.py <old.json> <new.json>
"""
import json
import statistics
import sys


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    oq, nq = old["queries"], new["queries"]
    common = [k for k in oq if k in nq and oq[k] > 0 and nq[k] > 0]
    ratios = {k: nq[k] / oq[k] for k in common}
    tot_old = sum(oq[k] for k in common)
    tot_new = sum(nq[k] for k in common)
    print(f"common entries: {len(common)}")
    print(f"total: {tot_old:.1f} -> {tot_new:.1f} s  ({tot_new / tot_old:.2f}x)")
    print(f"per-entry median ratio: {statistics.median(ratios.values()):.2f}")
    movers = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    print("worst movers:")
    for k, r in movers:
        print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f} s ({r:.2f}x)")
    only_new = [k for k in nq if k not in oq]
    if only_new:
        print(f"new entries ({len(only_new)}): {', '.join(sorted(only_new))}")


if __name__ == "__main__":
    main()
