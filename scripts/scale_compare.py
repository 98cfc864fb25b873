#!/usr/bin/env python3
"""Compare two graft Bench JSON artifacts (e.g. sf0.1 vs a make_scale
10x run) and print per-query growth ratios grouped by operator family
— the r10-verdict item-2 full-suite scale sweep reader.

Usage: scale_compare.py base.json scaled.json [factor]
"""
import json
import sys

base = json.load(open(sys.argv[1]))["queries"]
scaled = json.load(open(sys.argv[2]))["queries"]
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0


def family(q):
    p = q.split("_", 1)[0]
    if p == "q" or (p[0] == "q" and p[1:].isdigit()):
        return "relational"
    return {"dim": "dwd", "ts": "timeseries", "pipeline": "text",
            "mm": "multimodal"}.get(p, p)


rows = []
for q, t1 in sorted(base.items()):
    t10 = scaled.get(q)
    if t10 is None or t1 <= 0:
        print(f"MISSING at scale: {q}")
        continue
    rows.append((q, family(q), t1, t10, t10 / t1))

fams = {}
for q, f, t1, t10, r in rows:
    fams.setdefault(f, []).append((q, t1, t10, r))

print(f"{'family':<12} {'n':>3} {'sum 1x':>8} {'sum Nx':>8} {'growth':>7}  worst 3 (query ratio)")
for f in sorted(fams, key=lambda f: -sum(x[2] for x in fams[f])):
    qs = fams[f]
    s1, s10 = sum(x[1] for x in qs), sum(x[2] for x in qs)
    worst = sorted(qs, key=lambda x: -x[3])[:3]
    wtxt = ", ".join(f"{q}={r:.1f}x" for q, _, _, r in worst)
    print(f"{f:<12} {len(qs):>3} {s1:>8.1f} {s10:>8.1f} {s10/s1:>6.1f}x  {wtxt}")

print(f"\nTOTAL  1x={sum(x[2] for x in rows):.1f}s  {factor:.0f}x={sum(x[3] for x in rows):.1f}s  "
      f"growth={sum(x[3] for x in rows)/sum(x[2] for x in rows):.2f}x")

print(f"\nqueries with growth > {factor:.0f}x (super-linear in data):")
for q, f, t1, t10, r in sorted(rows, key=lambda x: -x[4]):
    if r > factor:
        print(f"  {q:<32} {f:<10} {t1:>6.2f}s -> {t10:>7.2f}s  {r:.1f}x")

print("\nfull per-query table (sorted by ratio desc):")
for q, f, t1, t10, r in sorted(rows, key=lambda x: -x[4]):
    print(f"  {q:<32} {f:<10} {t1:>6.2f} {t10:>8.2f} {r:>6.1f}x")
