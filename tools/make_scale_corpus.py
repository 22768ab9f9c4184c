#!/usr/bin/env python3
"""Rebuild the 10x scale corpus used by SCALE.md (driver-side tooling, not
engine code): replicate /root/testdata/sf0.1 tables K times with offset
keys so every join stays consistent and every text occurs K times (the
deliberately duplicate-heavy dedup stress case).

Usage: python3 tools/make_scale_corpus.py [outDir] [K] [srcDir]
srcDir defaults to sf0.1; pass an earlier replica (e.g. /tmp/scale100)
to compose scales multiplicatively — a single-shot K near 1000 hits
DuckDB's max_expression_depth on the UNION ALL chain.
"""
import os, sys
import duckdb

SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def copy_union(t, select_k):
    parts = " UNION ALL ".join(select_k(k) for k in range(K))
    con.execute(f"COPY ({parts}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")

def max_of(t, c):
    return con.execute(f"SELECT max({c}) + 1 FROM {src(t)}").fetchone()[0]

DOC = max_of("documents", "doc_id")
VEC = max_of("embeddings", "vec_id")
EVT = max_of("events", "event_id")
USR = max_of("events", "user_id")
ORD = max_of("orders", "o_orderkey")
CUS = max_of("customer", "c_custkey")
SUP = max_of("supplier", "s_suppkey")
PRT = max_of("part", "p_partkey")

copy_union("documents", lambda k: f"SELECT doc_id + {k * DOC} AS doc_id, text, lang, source, n_chars FROM {src('documents')}")
copy_union("embeddings", lambda k: f"SELECT vec_id + {k * VEC} AS vec_id, embedding, label FROM {src('embeddings')}")
# testdata events.ts is parquet timestamp[ns] (the engine reads it with
# nanosAsLong) — DuckDB's parquet writer downcasts to us, so route events
# through pyarrow to keep the replica at ns like the real corpus
import pyarrow as pa
import pyarrow.parquet as pq
ev_parts = " UNION ALL ".join(
    f"SELECT event_id + {k * EVT} AS event_id, ts, user_id + {k * USR} AS user_id,"
    f" event_type, value, props FROM {src('events')}" for k in range(K))
ev = con.execute(ev_parts).arrow()
i = ev.schema.get_field_index("ts")
ev = ev.set_column(i, pa.field("ts", pa.timestamp("ns")), ev["ts"].cast(pa.timestamp("ns")))
pq.write_table(ev, f"{OUT}/events.parquet")
print(f"events: {ev.num_rows} rows (ns ts)")
copy_union("customer", lambda k: f"SELECT c_custkey + {k * CUS} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}")
copy_union("orders", lambda k: f"SELECT o_orderkey + {k * ORD} AS o_orderkey, o_custkey + {k * CUS} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')}")
copy_union("supplier", lambda k: f"SELECT s_suppkey + {k * SUP} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {src('supplier')}")
copy_union("lineitem", lambda k: f"SELECT l_orderkey + {k * ORD} AS l_orderkey, l_partkey + {k * PRT} AS l_partkey, l_suppkey + {k * SUP} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}")
for t in ["nation", "region", "part"]:
    if t == "part":
        copy_union("part", lambda k: f"SELECT p_partkey + {k * PRT} AS p_partkey, * EXCLUDE (p_partkey) FROM {src('part')}")
    else:
        con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied 1x")
