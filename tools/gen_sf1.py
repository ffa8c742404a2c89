#!/usr/bin/env python3
"""Generate the 10x "sf1" bench corpus at /tmp/sf1 from /root/testdata/sf0.1.

ALL fact-shaped families are replicated 10x with FK-consistent key shifts,
so no bench row is a fixed-size-input "overhead stability" reading:

- lineitem   10x: l_orderkey shifted per replica (joins orders replica-wise);
              l_partkey / l_suppkey UNCHANGED -> the rides/stations analog
              keeps a fixed station registry while ride volume grows 10x
              (the real-world shape: stations don't grow with rides), and
              part/supplier joins still match exactly one row (replica 0).
- orders     10x: o_orderkey / o_custkey shifted (FK-consistent with
              lineitem and customer replicas).
- customer   10x: c_custkey shifted.
- part       10x: p_partkey shifted (replica 0 keeps original keys, so
              unchanged lineitem partkeys join 1:1).
- events     10x: event_id / user_id shifted per replica (per-user state,
              sessionization and as-of grids replicate disjointly).
- documents  10x disjoint replicas: doc_id shifted, every token suffixed
              _r<k> so intra-replica near-dup structure (planted pairs) is
              preserved while replicas share no shingles -- 10x near-dup
              pairs and 10x shingle vocabulary, not 10 copies of the same
              clusters (SCALE.md round-3 recipe).
- embeddings 10x: vec_id shifted; deterministic per-replica jitter keeps
              vectors distinct while preserving cluster structure
              (SCALE.md round-5 recipe).
- supplier / nation / region: copied unchanged -- true dimensions (the
              station registry / country list); at 100 TB these stay
              broadcast-scale by design.

Usage: python3 tools/gen_sf1.py [REPLICAS=10] [SRC=/root/testdata/sf0.1] [DST=/tmp/sf1]
"""
import sys
import duckdb

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO 16")
REPS = f"(SELECT unnest(generate_series(0, {R - 1})) AS r) reps"

def copy(table):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
                f"TO '{DST}/{table}.parquet' (FORMAT PARQUET, CODEC SNAPPY)")
    print(f"{table}: copied unchanged")

def gen(table, select):
    con.execute(
        f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet') t, {REPS}) "
        f"TO '{DST}/{table}.parquet' (FORMAT PARQUET, CODEC SNAPPY)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows ({R}x)")

for t in ("region", "nation", "supplier"):
    copy(t)

gen("customer",
    "t.c_custkey + reps.r * 1000000 AS c_custkey, t.c_name, t.c_nationkey, "
    "t.c_acctbal, t.c_mktsegment")

gen("part",
    "t.p_partkey + reps.r * 1000000 AS p_partkey, t.p_name, t.p_brand, "
    "t.p_type, t.p_size, t.p_retailprice")

gen("orders",
    "t.o_orderkey + reps.r * 10000000 AS o_orderkey, "
    "t.o_custkey + reps.r * 1000000 AS o_custkey, t.o_orderstatus, "
    "t.o_totalprice, t.o_orderdate, t.o_orderpriority")

gen("lineitem",
    "t.l_orderkey + reps.r * 10000000 AS l_orderkey, t.l_partkey, t.l_suppkey, "
    "t.l_linenumber, t.l_quantity, t.l_extendedprice, t.l_discount, t.l_tax, "
    "t.l_returnflag, t.l_linestatus, t.l_shipdate")

gen("events",
    "t.event_id + reps.r * 10000000 AS event_id, t.ts, "
    "t.user_id + reps.r * 1000000 AS user_id, t.event_type, t.value, t.props")

gen("documents",
    "t.doc_id + reps.r * 10000000 AS doc_id, "
    "array_to_string(list_transform(string_split(t.text, ' '), "
    "  tok -> tok || '_r' || reps.r), ' ') AS text, "
    "t.lang, t.source, "
    "CAST(length(array_to_string(list_transform(string_split(t.text, ' '), "
    "  tok -> tok || '_r' || reps.r), ' ')) AS BIGINT) AS n_chars")

# deterministic per-replica jitter: hash(vec_id, r, dim index) -> [-0.005, 0.005]
# (cluster structure preserved, replicas distinct; replica 0 jitter-free)
gen("embeddings",
    "t.vec_id + reps.r * 10000000 AS vec_id, "
    "CASE WHEN reps.r = 0 THEN t.embedding ELSE "
    "list_transform(list_zip(t.embedding, range(len(t.embedding))), "
    "  z -> CAST(z[1] + (CAST(hash(t.vec_id * 1000003 + reps.r * 101 + z[2]) "
    "       % 1000 AS BIGINT) - 500) / 100000.0 AS FLOAT)) END AS embedding, "
    "t.label")

print(f"done -> {DST}")
