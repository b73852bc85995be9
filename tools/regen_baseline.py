#!/usr/bin/env python3
"""Regenerate bench_baseline.json from a close-run artifact.

Usage: python3 tools/regen_baseline.py [bench_json] [baseline_json]

Implements the provenance contract (Bench.scala): baselines come ONLY
from a full-surface 5-pass seq artifact. Prints every query whose
new/old ratio exceeds 1.5x in either direction so the operator can
isolated-probe before adopting (context skew -> adopt; real plan
regression -> fix first). Exits nonzero without writing if the
artifact looks scoped (fewer queries than the old baseline).
"""
import json
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_baseline.json"

art = json.load(open(bench_path))
seq = art.get("queries_seq")
if not seq:
    sys.exit("artifact has no queries_seq map — not a seq/both run")
try:
    old = json.load(open(base_path))
except FileNotFoundError:
    old = {}
if len(seq) < len(old):
    sys.exit(f"artifact covers {len(seq)} < baseline {len(old)} queries — "
             "scoped run, refusing (provenance contract)")

movers = []
for q, v in sorted(seq.items()):
    o = old.get(q)
    if o and (v > 1.5 * o or o > 1.5 * v):
        movers.append((q, o, v))
for q, o, v in sorted(movers, key=lambda t: -(t[2] / t[1])):
    print(f"MOVER {q}: old {o:.3f} -> new {v:.3f} ({v / o:.2f}x)")
new_qs = sorted(set(seq) - set(old))
for q in new_qs:
    print(f"NEW {q}: {seq[q]:.3f}")
dropped = sorted(set(old) - set(seq))
for q in dropped:
    print(f"DROPPED {q} (was {old[q]:.3f})")

with open(base_path, "w") as f:
    json.dump({q: round(v, 6) for q, v in sorted(seq.items())}, f, indent=0)
print(f"wrote {base_path}: {len(seq)} queries "
      f"({len(movers)} movers >1.5x, {len(new_qs)} new, {len(dropped)} dropped)")
