#!/usr/bin/env python3
"""Regenerate bench_baseline.json from a close-run artifact.

Usage: python3 tools/regen_baseline.py [bench_json] [baseline_json] [--force]

Implements the provenance contract (Bench.scala): baselines come ONLY
from a full-surface 5-pass seq artifact measured on a quiet host.
Refuses (exit nonzero, nothing written) when:
  - the artifact looks scoped (fewer queries than the old baseline);
  - the artifact carries commit_grade=false or a load_avg_start above
    the gate (co-tenant window — r13's contaminated record);
  - any query moved >1.5x in either direction, unless --force: movers
    must be isolated-probed first (context skew -> adopt with --force;
    real plan regression -> fix the plan, re-run, then regen).
"""
import json
import sys

args = [a for a in sys.argv[1:] if a != "--force"]
force = "--force" in sys.argv[1:]
bench_path = args[0] if len(args) > 0 else "target/bench.json"
base_path = args[1] if len(args) > 1 else "bench_baseline.json"

art = json.load(open(bench_path))
seq = art.get("queries_seq")
if not seq:
    sys.exit("artifact has no queries_seq map — not a seq/both run")

# Quiet-host preflight: a pre-r14 artifact has no load fields (treated
# as unknown -> warn but allow); an r14+ artifact must be commit-grade.
load = art.get("load_avg_start")
gate = art.get("load_gate", 2.0)
if art.get("commit_grade") is False or (load is not None and load > gate):
    sys.exit(f"artifact is not commit-grade (load_avg_start={load}, "
             f"gate={gate}) — re-run the close on a quiet host "
             "(provenance contract: no baseline from a loaded-host run)")
if load is None:
    print("WARNING: artifact carries no load_avg_start (pre-r14 Bench?) — "
          "cannot verify quiet-host provenance", file=sys.stderr)
if load is not None and load < 0:
    sys.exit("artifact's load_avg_start is negative — the platform exposed "
             "no load average, quiet-host provenance unverifiable; refusing")

# Per-query pass-load verdict (r15): a query whose median formed under a
# majority of dirty passes (medians_below_gate, emitted by Bench) is not
# baseline-adoptable — keep its old value, or skip it when new.
below = set(art.get("medians_below_gate") or [])
if below:
    print(f"WARNING: {len(below)} query medians below the per-pass load "
          f"gate — keeping old baseline values for them", file=sys.stderr)

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

if movers and not force:
    sys.exit(f"{len(movers)} movers >1.5x — isolated-probe each (context "
             "skew vs plan regression), then re-run with --force to adopt")

out = {}
kept_old = skipped_new = 0
for q, v in sorted(seq.items()):
    if q in below:
        if q in old:
            out[q] = old[q]
            kept_old += 1
            print(f"BELOW-GATE {q}: keeping old baseline {old[q]:.3f} "
                  f"(measured {v:.3f} under dirty passes)")
        else:
            skipped_new += 1
            print(f"BELOW-GATE {q}: NEW query with dirty passes — skipped "
                  "(no baseline until a clean run)")
    else:
        out[q] = round(v, 6)
with open(base_path, "w") as f:
    json.dump(out, f, indent=0)
print(f"wrote {base_path}: {len(out)} queries "
      f"({len(movers)} movers >1.5x, {len(new_qs)} new, {len(dropped)} dropped, "
      f"{kept_old} below-gate kept old, {skipped_new} below-gate skipped)")
