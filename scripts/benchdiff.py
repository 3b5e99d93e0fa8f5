#!/usr/bin/env python3
"""Compare two graft bench JSON artifacts: per-query ratio, sorted by delta.
Usage: benchdiff.py BEFORE.json AFTER.json [topN]"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)

a, b = load(sys.argv[1]), load(sys.argv[2])
top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
qa, qb = a["queries"], b["queries"]
common = [k for k in qa if k in qb and qa[k] and qb[k]]
rows = [(qb[k] - qa[k], qa[k], qb[k], k) for k in common]
rows.sort()
print(f"total: {a['value']:.1f} -> {b['value']:.1f}  "
      f"(n={len(qa)} -> {len(qb)}, dirty={a.get('load_dirty')} -> {b.get('load_dirty')})")
import statistics
ratios = sorted(qb[k] / qa[k] for k in common if qa[k] > 0)
print(f"per-query ratio p50={statistics.median(ratios):.3f} "
      f"p10={ratios[len(ratios)//10]:.3f} p90={ratios[9*len(ratios)//10]:.3f}")
print("\nbiggest improvements:")
for d, x, y, k in rows[:top]:
    if d < 0:
        print(f"  {k:38s} {x:7.3f} -> {y:7.3f}  ({d:+.3f}, x{y/x:.2f})")
print("\nbiggest regressions:")
for d, x, y, k in rows[::-1][:top]:
    if d > 0:
        print(f"  {k:38s} {x:7.3f} -> {y:7.3f}  ({d:+.3f}, x{y/x:.2f})")
