#!/usr/bin/env python3
"""Join a fresh sf100 bench line against ANCHORS.json sf100 and the
round-15 sf100 artifact; print per-gate ratios sorted by worst, so a
sweep can be adjudicated the moment it completes.

  python3 scripts/sf100_compare.py /tmp/bench_sf100_r17.out
"""
import json, sys

out = open(sys.argv[1]).read().strip().splitlines()
line = next(l for l in reversed(out) if l.startswith('{'))
cur = json.loads(line)
anch = json.load(open('ANCHORS.json')).get('sf100', {})
r15 = json.load(open('BENCH_sf100_r15.json'))['queries']

rows = []
for g, sec in cur['queries'].items():
    a = anch.get(g, {}).get('sec')
    p = r15.get(g, {}).get('sec')
    rows.append((g, sec, a, (sec / a) if a else None, p))

rows.sort(key=lambda r: -(r[3] or 0))
print(f"{'gate':28s}{'now':>9s}{'anchor':>9s}{'ratio':>7s}{'r15':>9s}")
for g, sec, a, ratio, p in rows:
    print(f"{g:28s}{sec:9.1f}{a if a else float('nan'):9.1f}"
          f"{ratio if ratio else float('nan'):7.2f}{p if p else float('nan'):9.1f}")

rat = sorted(r[3] for r in rows if r[3])
if rat:
    import statistics
    print(f"\nratios: n={len(rat)} median={statistics.median(rat):.2f} "
          f"max={rat[-1]:.2f} over2x={[r[0] for r in rows if (r[3] or 0) > 2]}")
print(f"total={cur['value']}s failed={cur.get('failed')} "
      f"flagged={cur.get('flagged')} box={cur.get('box_factor')} "
      f"disk={cur.get('disk_mbps')} reruns={cur.get('reruns')}")
