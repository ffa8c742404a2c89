#!/usr/bin/env python3
"""Round-over-round bench drift report with a mandatory re-time list.

SF-AGNOSTIC (r16): takes any two bench JSON files at the SAME scale
factor — the per-round protocol for sf1 AND the sf5 point (the r15
verdict's ask: sf5 numbers enter SCALE.md only after runs=2 or the
flagged drifts get isolated re-times through this list).

The r14 verdict's protocol hole: a runs=1 sf1 sweep shipped >20% drifts
(the ANN index family) un-adjudicated — nobody re-timed them, so sweep
contention was indistinguishable from regression. This tool makes the
adjudication list explicit: every shared query whose new time exceeds
the old by more than DRIFT (default 20%) AND by an absolute floor
(0.5 s — sub-second entries jitter past any ratio) is listed as
NEEDS-RETIME, ready to paste into SPARK_GRAFT_BENCH_ONLY for an
isolated min-of-3 on a quiet host.

Usage: python3 tools/sf1_drift.py <old_bench.json> <new_bench.json>
           [drift=0.20] [abs_floor=0.5]
Exit code 1 when any query needs a re-time.
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
drift = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

qo, qn = old["queries"], new["queries"]
shared = sorted(set(qo) & set(qn))
only_new = sorted(set(qn) - set(qo))
need = []
improved = []
for q in shared:
    o, n = qo[q], qn[q]
    if o <= 0 or n <= 0:
        continue
    if n > o * (1 + drift) and n - o > floor:
        need.append((q, o, n, n / o))
    elif o > n * (1 + drift) and o - n > floor:
        improved.append((q, o, n, n / o))

tot_o = sum(v for k, v in qo.items() if k in shared and v > 0)
tot_n = sum(v for k, v in qn.items() if k in shared and v > 0)
print(f"shared {len(shared)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
      f"({tot_n / tot_o:.2f}x)")
if only_new:
    print(f"new (excluded): {only_new}")
if improved:
    print(f"\nimproved >{drift:.0%}:")
    for q, o, n, r in sorted(improved, key=lambda t: t[3]):
        print(f"  {q:40s} {o:8.2f} -> {n:8.2f}  ({r:.2f}x)")
if need:
    print(f"\nNEEDS-RETIME (>{drift:.0%} and >{floor}s slower):")
    for q, o, n, r in sorted(need, key=lambda t: -t[3]):
        print(f"  {q:40s} {o:8.2f} -> {n:8.2f}  ({r:.2f}x)")
    print("\nSPARK_GRAFT_BENCH_ONLY=" + ",".join(q for q, *_ in need))
    sys.exit(1)
print("\nno un-adjudicated drifts")
