#!/usr/bin/env python3
"""Build a bench-only sf1 lake (~10x sf0.1) by replicating sf0.1 with key
remapping, used to validate the engine's scaling claims empirically
(BENCH at two scale factors). Dev tool — runs driver-side with duckdb.

Replication rules keep join consistency and avoid degenerate dedup inputs:
  - lineitem/orders: orderkey += r * 1_000_000 per replica r (custkey/partkey
    unchanged — dims stay one copy, like scale-frozen dimensions)
  - events: event_id += r * 1_000_000, user_id/ts unchanged
  - documents: doc_id += r * 100_000; text gets a per-replica suffix token so
    replicas are NEAR-duplicates (exercises minhash/simhash realistically)
    rather than exact 10-clones
  - embeddings: vec_id += r * 100_000, vectors unchanged
  - dims (region nation customer supplier part): copied as-is

Usage: python3 tools/make_sf1.py [outdir=/tmp/sf1] [replicas=10]
"""
import sys, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
src = "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def copy(sql, table):
    con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")

def check_offset(table, key, offset):
    """Replica keys are `key + r*offset`; if max(key) >= offset the replicas
    silently collide and the bench lake is corrupted."""
    mx = con.execute(f"SELECT max({key}) FROM '{src}/{table}.parquet'").fetchone()[0]
    assert mx < offset, f"{table}.{key} max={mx} >= replica offset {offset}: keys would collide"

check_offset("orders", "o_orderkey", 1_000_000)
check_offset("lineitem", "l_orderkey", 1_000_000)
check_offset("events", "event_id", 1_000_000)
check_offset("documents", "doc_id", 100_000)
check_offset("embeddings", "vec_id", 100_000)

for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(f"SELECT * FROM '{src}/{t}.parquet'", t)

copy(f"""SELECT * REPLACE (o_orderkey + r.r * 1000000 AS o_orderkey)
         FROM '{src}/orders.parquet', range({reps}) r(r)""", "orders")
copy(f"""SELECT * REPLACE (l_orderkey + r.r * 1000000 AS l_orderkey)
         FROM '{src}/lineitem.parquet', range({reps}) r(r)""", "lineitem")
copy(f"""SELECT * REPLACE (event_id + r.r * 1000000 AS event_id)
         FROM '{src}/events.parquet', range({reps}) r(r)""", "events")
copy(f"""SELECT * REPLACE (doc_id + r.r * 100000 AS doc_id,
                           CASE WHEN r.r = 0 THEN text
                                ELSE text || ' replica' || r.r END AS text)
         FROM '{src}/documents.parquet', range({reps}) r(r)""", "documents")
copy(f"""SELECT * REPLACE (vec_id + r.r * 100000 AS vec_id)
         FROM '{src}/embeddings.parquet', range({reps}) r(r)""", "embeddings")
print("done:", out)
