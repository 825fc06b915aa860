#!/usr/bin/env python3
"""Two-point scaling-curve sanity check over Bench JSON artifacts.

Usage: python3 tools/scaling_check.py <bench_small.json> <bench_big.json> \
           [--sf-ratio 10] [--slack 3] [--floor 0.15]

Reads the per-query seconds from two Bench runs at different scale factors
and flags any query whose time grew by MORE than sf_ratio * slack — the
signature of an accidentally super-linear (O(n^2), re-computed, or
skew-collapsed) plan that small-scale correctness tests cannot catch.

Queries faster than `floor` seconds at the LARGER scale are reported but
never flagged: below that, fixed per-query overhead (job scheduling, plan
compile) dominates and ratios are noise.

Exit code 1 if any query is flagged, 0 otherwise — usable as a gate.
"""
import argparse
import json
import sys

p = argparse.ArgumentParser()
p.add_argument("small")
p.add_argument("big")
p.add_argument("--sf-ratio", type=float, default=10.0,
               help="data-size ratio big/small (default 10: sf0.01 vs sf0.1)")
p.add_argument("--slack", type=float, default=3.0,
               help="multiplier on sf-ratio before a growth counts as "
                    "super-linear (absorbs constant factors + host variance)")
p.add_argument("--floor", type=float, default=0.15,
               help="ignore queries faster than this at the big scale (sec)")
args = p.parse_args()

small = json.load(open(args.small))
big = json.load(open(args.big))
qs_small, qs_big = small["queries"], big["queries"]
bound = args.sf_ratio * args.slack

shared = sorted(set(qs_small) & set(qs_big))
missing = sorted(set(qs_small) ^ set(qs_big))
flagged = []
rows = []
for q in shared:
    a, b = qs_small[q], qs_big[q]
    ratio = b / a if a > 0 else float("inf")
    mark = ""
    if b >= args.floor and ratio > bound:
        mark = "  <-- SUPER-LINEAR"
        flagged.append(q)
    rows.append((ratio, q, a, b, mark))

print(f"{len(shared)} shared queries | growth bound: {args.sf_ratio} x "
      f"{args.slack} = {bound:.0f}x | floor {args.floor}s")
print(f"{'query':34} {'small(s)':>9} {'big(s)':>9} {'ratio':>7}")
for ratio, q, a, b, mark in sorted(rows, reverse=True):
    print(f"{q:34} {a:9.3f} {b:9.3f} {ratio:7.2f}{mark}")
if missing:
    print(f"\nnot in both runs (skipped): {', '.join(missing)}")
tot_a = sum(qs_small[q] for q in shared)
tot_b = sum(qs_big[q] for q in shared)
print(f"\nshared totals: {tot_a:.1f}s -> {tot_b:.1f}s "
      f"({tot_b / tot_a:.2f}x at {args.sf_ratio:.0f}x the data)")
if flagged:
    print(f"\nFLAGGED ({len(flagged)}): {', '.join(flagged)}")
    sys.exit(1)
print("\nno super-linear growth detected")
