#!/usr/bin/env python3
"""Regenerate bench_baseline.json (+ bench_baseline_cpu.json) from a
close-run artifact.

Usage: python3 tools/regen_baseline.py [bench_json] [baseline_json] [--force]

Implements the provenance contract (Bench.scala): baselines come ONLY
from a full-surface 5-pass seq artifact measured on a quiet host.
Refuses (exit nonzero, nothing written) when:
  - the artifact looks scoped (fewer queries than the old baseline);
  - the artifact carries commit_grade=false or a load_avg_start above
    the gate (co-tenant window — r13's contaminated record);
  - any query moved >1.5x, unless --force. Movers are judged
    CPU-FIRST (r16): when both artifacts carry executor-CPU medians,
    a query is a mover only if its CPU moved >1.5x — CPU is
    load-invariant, so wall-only movement is context, adopted
    silently with a note. Wall-only judging applies when CPU data is
    missing on either side. Below-gate queries (medians_below_gate)
    are EXCLUDED from the movers computation entirely — their
    measurements are never adopted, so flagging them only forced
    blanket --force re-runs (ADVICE r15).

Writes TWO files: the wall baseline (arg 2, default
bench_baseline.json) and the CPU baseline beside it
(<stem>_cpu.json), from the artifact's queries_cpu_seq medians.
"""
import json
import sys

args = [a for a in sys.argv[1:] if a != "--force"]
force = "--force" in sys.argv[1:]
bench_path = args[0] if len(args) > 0 else "target/bench.json"
base_path = args[1] if len(args) > 1 else "bench_baseline.json"
cpu_path = (base_path[:-5] if base_path.endswith(".json") else base_path) + "_cpu.json"

art = json.load(open(bench_path))
seq = art.get("queries_seq")
if not seq:
    sys.exit("artifact has no queries_seq map — not a seq/both run")
cpu = art.get("queries_cpu_seq") or {}
if not cpu:
    print("WARNING: artifact carries no queries_cpu_seq (pre-r16 Bench?) — "
          "movers judged on wall only, no CPU baseline written",
          file=sys.stderr)

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
try:
    old_cpu = json.load(open(cpu_path))
except FileNotFoundError:
    old_cpu = {}
if len(seq) < len(old):
    sys.exit(f"artifact covers {len(seq)} < baseline {len(old)} queries — "
             "scoped run, refusing (provenance contract)")


def moved(a, b, ratio=1.5):
    return a and b and (b > ratio * a or a > ratio * b)


# Movers: CPU-first (load-invariant) when CPU data exists on both
# sides; wall otherwise. Below-gate queries are excluded — their
# values are never adopted (ADVICE r15).
movers = []
context_movers = []
for q, v in sorted(seq.items()):
    if q in below:
        continue
    o = old.get(q)
    if not moved(o, v):
        continue
    oc, nc = old_cpu.get(q), cpu.get(q)
    if oc and nc:
        if moved(oc, nc):
            movers.append((q, o, v, oc, nc))
        else:
            context_movers.append((q, o, v, oc, nc))
    else:
        movers.append((q, o, v, oc, nc))
for q, o, v, oc, nc in sorted(movers, key=lambda t: -(t[2] / t[1])):
    cpu_note = f", cpu {oc:.3f} -> {nc:.3f}" if oc and nc else ", no cpu data"
    print(f"MOVER {q}: old {o:.3f} -> new {v:.3f} ({v / o:.2f}x{cpu_note})")
for q, o, v, oc, nc in context_movers:
    print(f"CONTEXT {q}: wall {o:.3f} -> {v:.3f} ({v / o:.2f}x) but cpu "
          f"stable ({oc:.3f} -> {nc:.3f}) — adopted without --force")
new_qs = sorted(set(seq) - set(old))
for q in new_qs:
    print(f"NEW {q}: {seq[q]:.3f}")
dropped = sorted(set(old) - set(seq))
for q in dropped:
    print(f"DROPPED {q} (was {old[q]:.3f})")

if movers and not force:
    sys.exit(f"{len(movers)} movers >1.5x (CPU-judged where possible) — "
             "isolated-probe each (context skew vs plan regression), then "
             "re-run with --force to adopt")


def emit(path, new, old_vals, label):
    out = {}
    kept_old = skipped_new = 0
    for q, v in sorted(new.items()):
        if q in below:
            if q in old_vals:
                out[q] = old_vals[q]
                kept_old += 1
                print(f"BELOW-GATE {q}: keeping old {label} {old_vals[q]:.3f} "
                      f"(measured {v:.3f} under dirty passes)")
            else:
                skipped_new += 1
                print(f"BELOW-GATE {q}: NEW query with dirty passes — skipped "
                      "(no baseline until a clean run)")
        else:
            out[q] = round(v, 6)
    with open(path, "w") as f:
        json.dump(out, f, indent=0)
    print(f"wrote {path}: {len(out)} queries ({kept_old} below-gate kept old, "
          f"{skipped_new} below-gate skipped)")


emit(base_path, seq, old, "wall")
if cpu:
    emit(cpu_path, cpu, old_cpu, "cpu")
print(f"summary: {len(movers)} movers, {len(context_movers)} context-only "
      f"wall movers (cpu stable), {len(new_qs)} new, {len(dropped)} dropped")
