#!/usr/bin/env python3
"""Like-for-like bench regression report over bench_history.jsonl.

Compares the LATEST run at a scale factor against the best (min) prior
time per query at the same scale factor, so noisy hosts don't mask or
fake regressions. New queries (absent from every prior run) are listed
separately and excluded from the like-for-like total, which is how the
per-round "did anything get slower?" question is actually answered.

Usage:
    python3 tools/bench_diff.py [--history bench_history.jsonl]
        [--sf SUBSTR]        # filter runs whose sf contains SUBSTR
        [--threshold 1.5]    # flag queries slower than prior_min * t
        [--baseline-at ISO]  # compare against a specific run instead
Exit code 1 if any query exceeds the threshold (wire into round close).
"""
import argparse
import json
import sys


def load_runs(path, sf_filter):
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            d = r["detail"]
            if sf_filter and sf_filter not in str(d.get("sf", "")):
                continue
            # sweep-only per-query mins: the first `runs` entries of the
            # raw times array are the full-sweep timings; anything after
            # them is an isolated warm renoise re-timing a full run can
            # never match (the same rule Bench.scala's historyBest uses)
            n_runs = max(1, int(d.get("runs", 3)))
            raw = d.get("times") or {}
            if raw:
                queries = {}
                for q, ts in raw.items():
                    sweep = [t for t in ts[:n_runs] if t and t > 0]
                    if sweep:
                        queries[q] = min(sweep)
            else:
                queries = d.get("queries", {})
            runs.append({
                "at": r["at"],
                "sf": d.get("sf"),
                "load": d.get("load", r.get("load")),
                "total": d.get("value"),
                "queries": queries,
            })
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--history", default="bench_history.jsonl")
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--baseline-at", default=None)
    args = ap.parse_args()

    runs = load_runs(args.history, args.sf)
    if len(runs) < 2:
        print(f"need >=2 runs at sf~'{args.sf}' to diff; have {len(runs)}")
        return 0

    # anchor on the last FULL-catalog run: an ONLY-filtered diagnostic
    # line (or a torn partial run) must not masquerade as "the latest"
    full_size = max(len(r["queries"]) for r in runs)
    latest = [r for r in runs if len(r["queries"]) >= full_size * 8 // 10][-1]
    priors = runs[:runs.index(latest)]
    if not priors:
        print("no priors before the latest full run; nothing to diff")
        return 0
    # ERA GATE (mirrors Bench.scala): only priors whose catalog size is
    # comparable to the latest's (>= 80%) are a fair reference — a best
    # taken when the sweep held 120 queries ran under far less CPU
    # contention than a 190-query sweep ever will
    era_floor = len(latest["queries"]) * 8 // 10
    dropped = [r for r in priors if len(r["queries"]) < era_floor]
    priors = [r for r in priors if len(r["queries"]) >= era_floor]
    if dropped:
        print(f"era gate: {len(dropped)} prior run(s) below "
              f"{era_floor} queries excluded from the reference set")
    if not priors:
        print("no comparable-era priors; nothing to diff")
        return 0
    if args.baseline_at:
        priors = [r for r in runs if r["at"].startswith(args.baseline_at)]
        if not priors:
            print(f"no run starting at {args.baseline_at!r}")
            return 2

    # best prior per query: the fairest reference on a noisy host
    prior_best = {}
    for r in priors:
        for q, t in r["queries"].items():
            if t is None or t < 0:
                continue
            if q not in prior_best or t < prior_best[q]:
                prior_best[q] = t

    flagged, improved, new_queries = [], [], []
    shared_latest, shared_prior = 0.0, 0.0
    for q, t in sorted(latest["queries"].items()):
        if t is None or t < 0:
            flagged.append((q, t, prior_best.get(q), "ERROR (negative time)"))
            continue
        if q not in prior_best:
            new_queries.append((q, t))
            continue
        shared_latest += t
        shared_prior += prior_best[q]
        ratio = t / prior_best[q] if prior_best[q] > 0 else float("inf")
        if ratio > args.threshold:
            flagged.append((q, t, prior_best[q], f"{ratio:.2f}x"))
        elif ratio < 1 / args.threshold:
            improved.append((q, t, prior_best[q], f"{ratio:.2f}x"))

    print(f"latest run: {latest['at']}  sf={latest['sf']}  "
          f"total={latest['total']}s  load={latest['load']}")
    print(f"priors: {len(priors)} runs "
          f"({priors[0]['at']} .. {priors[-1]['at']})")
    print(f"like-for-like ({len(latest['queries']) - len(new_queries)} shared "
          f"queries): {shared_latest:.1f}s vs best-prior {shared_prior:.1f}s "
          f"({shared_latest / shared_prior:.2f}x)" if shared_prior else "")
    if new_queries:
        cost = sum(t for _, t in new_queries)
        print(f"new queries ({len(new_queries)}, {cost:.1f}s total): "
              + ", ".join(f"{q}={t}" for q, t in new_queries))
    if improved:
        print(f"\nimproved >{args.threshold}x ({len(improved)}):")
        for q, t, p, r in improved:
            print(f"  {q}: {p}s -> {t}s ({r})")
    if flagged:
        print(f"\nREGRESSIONS >{args.threshold}x vs best prior "
              f"({len(flagged)}):")
        for q, t, p, r in flagged:
            print(f"  {q}: {p}s -> {t}s ({r})")
        print("\n(check host load before believing: min-of-5 protocol "
              "in SCALE.md adjudicates)")
        return 1
    print("\nno regressions above threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
