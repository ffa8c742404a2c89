#!/usr/bin/env python3
"""Join two bench detail records (sf0.1 and sf1) into a per-query ratio
table for SCALE.md's full-catalog 10x sweep.

Usage: python3 tools/sf1_ratio.py <sf01_detail.json> <sf1_detail.json> [gate=12]

Prints per-family worst ratios and every query whose sf1 wall exceeds
gate x its sf0.1 wall (the VERDICT r12 acceptance bar; streaming
fixed-cost entries are reported but tagged exempt).
"""
import json, sys, re
from collections import defaultdict

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
gate = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_a: print(f"# only in {sys.argv[1]}: {only_a}")
if only_b: print(f"# only in {sys.argv[2]}: {only_b}")

FAMS = [
    ("stream", r"^q_(stream_|dsv2_stream)"),
    ("dsv2/sql/lake", r"^q_(dsv2_|sql_|snapshot|change_feed|linear_probe|bloom_point|spj|clustered_window|merge_schema)"),
    ("dedup", r"^q_(dedup|decontaminate|semantic_dedup|doc_fingerprints)"),
    ("ann/vector", r"^q_(ann_|embed_|dedup_embedding)"),
    ("multimodal", r"^q_(png|jpeg|bmp|gif|wav|avi|multimodal)"),
    ("text", r"^q_(lang|quality|gopher|boiler|bpe|token|bm25|char_entropy|text|unigram|bigram|normalize|badwords|repetition|chunk|doc_)"),
    ("graph", r"^q_(pagerank|bfs|sssp|ride_triangles)"),
    ("events", r"^q_(events_|asof|range_join|upsert|scd2)"),
    ("sketch", r"^q_(distinct|token_cms|dd_|moment|sample_quantiles|heavy|corpus_overlap|value_histogram|quantity_percentiles|revenue_quartiles)"),
]
def fam(q):
    for name, pat in FAMS:
        if re.match(pat, q): return name
    return "relational"

rows = []
for q in shared:
    ta, tb = qa[q], qb[q]
    if ta is None or tb is None or ta < 0 or tb < 0:
        rows.append((q, ta, tb, None)); continue
    rows.append((q, ta, tb, tb / max(ta, 1e-9)))

worst = defaultdict(lambda: (0.0, ""))
tot_a = tot_b = 0.0
for q, ta, tb, r in rows:
    if r is None: continue
    tot_a += ta; tot_b += tb
    f = fam(q)
    if r > worst[f][0]: worst[f] = (r, q)

print(f"\ntotal: sf0.1 {tot_a:.1f}s -> sf1 {tot_b:.1f}s = {tot_b/tot_a:.2f}x on 10x data ({len(shared)} queries)")
print("\nper-family worst ratio:")
for f in sorted(worst):
    r, q = worst[f]
    print(f"  {f:15s} {r:6.2f}x  ({q}: {qa[q]:.2f}s -> {qb[q]:.2f}s)")

over = [(r, q, ta, tb) for q, ta, tb, r in rows if r and r > gate]
print(f"\nqueries over the {gate:.0f}x gate: {len(over)}")
for r, q, ta, tb in sorted(over, reverse=True):
    tag = " [streaming fixed-cost exempt]" if re.match(r"^q_(stream_|dsv2_stream)", q) else ""
    print(f"  {r:6.2f}x  {q}: {ta:.2f}s -> {tb:.2f}s{tag}")

fails = [q for q, ta, tb, r in rows if r is None]
if fails: print(f"\nfailed/missing: {fails}")
