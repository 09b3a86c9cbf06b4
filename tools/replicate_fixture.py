#!/usr/bin/env python3
"""Replicate an sf fixture N-fold into a throwaway dir (the SCALE.md
experiment harness): key-offset copies preserve FK integrity; per-copy
text suffixes / vector shifts avoid artificial cross-copy duplicates.
Labels are deliberately NOT offset, so per-label embedding blocks grow
N-fold — the hot-block regime blockedNearDup exists for.

Usage: replicate_fixture.py <src_sf_dir> <out_dir> [factor=10]
"""
import sys

import duckdb

src, out = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
con.execute(f"CREATE VIEW orders_src AS SELECT * FROM '{src}/orders.parquet'")
con.execute(f"CREATE VIEW lineitem_src AS SELECT * FROM '{src}/lineitem.parquet'")
con.execute(f"CREATE VIEW emb_src AS SELECT * FROM '{src}/embeddings.parquet'")
con.execute(f"CREATE VIEW docs_src AS SELECT * FROM '{src}/documents.parquet'")
con.execute(f"CREATE VIEW ev_src AS SELECT * FROM '{src}/events.parquet'")

ok, ck, pk, vk, dk, ek, uk = [con.execute(q).fetchone()[0] for q in (
    "SELECT MAX(o_orderkey)+1 FROM orders_src",
    "SELECT MAX(o_custkey)+1 FROM orders_src",
    "SELECT MAX(l_partkey)+1 FROM lineitem_src",
    "SELECT MAX(vec_id)+1 FROM emb_src",
    "SELECT MAX(doc_id)+1 FROM docs_src",
    "SELECT MAX(event_id)+1 FROM ev_src",
    "SELECT MAX(user_id)+1 FROM ev_src")]

import os
os.makedirs(out, exist_ok=True)

con.execute(f"""
COPY (SELECT o_orderkey + i*{ok} AS o_orderkey, o_custkey + i*{ck} AS o_custkey,
             * EXCLUDE (o_orderkey, o_custkey)
      FROM orders_src CROSS JOIN range({n}) t(i))
TO '{out}/orders.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (SELECT l_orderkey + i*{ok} AS l_orderkey, l_partkey + i*{pk} AS l_partkey,
             * EXCLUDE (l_orderkey, l_partkey)
      FROM lineitem_src CROSS JOIN range({n}) t(i))
TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (SELECT vec_id + i*{vk} AS vec_id, label,
             list_transform(embedding, x -> x + CAST(i AS FLOAT) * 0.01) AS embedding
      FROM emb_src CROSS JOIN range({n}) t(i))
TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (SELECT doc_id + i*{dk} AS doc_id, * EXCLUDE (doc_id, text),
             text || ' copytok' || CAST(i AS VARCHAR) AS text
      FROM docs_src CROSS JOIN range({n}) t(i))
TO '{out}/documents.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (SELECT event_id + i*{ek} AS event_id, CAST(ts AS TIMESTAMP_NS) AS ts,
             user_id + i*{uk} AS user_id, event_type, value, props
      FROM ev_src CROSS JOIN range({n}) t(i))
TO '{out}/events.parquet' (FORMAT PARQUET)""")

for t in ("orders", "lineitem", "embeddings", "documents", "events"):
    print(t, con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0])
