#!/usr/bin/env python3
"""Build the 10x synthetic stress dataset used by SURVEY.md §6's
measured scaling study (driver-side tool, like check_oracle.py — not
part of the Scala library).

Clones an sf directory 10x:
  - documents: unique doc_ids, each clone's text gets a per-clone
    suffix token (avoids pathological EXACT duplicates while keeping
    clone families near-duplicate — deliberately adversarial for the
    Hamming<=1 graph family);
  - embeddings: vec_id offsets, vectors unchanged (uniform 10x ANN
    bucket growth);
  - orders/lineitem: consistent o_orderkey/l_orderkey offsets so the
    fact-fact joins stay valid; customer/supplier keys left in range;
  - dims + events copied as-is.

Usage: make_stress10x.py <src_sf_dir> <dst_dir>
Then:  SPARK_GRAFT_SF_DIR=<dst_dir> SPARK_GRAFT_ONLY=<keys> \
         sbt "runMain graft.Bench"
"""
import os
import shutil
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# offsets derive from max(id)+1 (same as orders below): a hardcoded
# stride would silently collide ids across clones on a source dir with
# >= stride rows, corrupting the dedup/ANN studies this tool feeds.
dmx = con.execute(
    f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]
con.execute(f"""
COPY (
  SELECT d.doc_id + k.k * {dmx} AS doc_id,
         CASE WHEN k.k = 0 THEN d.text
              ELSE d.text || ' u' || (d.doc_id + k.k * {dmx})::VARCHAR END AS text,
         d.lang, d.source, d.n_chars
  FROM read_parquet('{src}/documents.parquet') d, (SELECT unnest(range(10)) AS k) k
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

vmx = con.execute(
    f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')"
).fetchone()[0]
con.execute(f"""
COPY (
  SELECT e.vec_id + k.k * {vmx} AS vec_id, e.embedding, e.label
  FROM read_parquet('{src}/embeddings.parquet') e, (SELECT unnest(range(10)) AS k) k
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

mx = con.execute(
    f"SELECT max(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')"
).fetchone()[0]
con.execute(f"""
COPY (
  SELECT o_orderkey + k.k * {mx} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (
  SELECT l.* REPLACE (l.l_orderkey + k.k * {mx} AS l_orderkey)
  FROM read_parquet('{src}/lineitem.parquet') l, (SELECT unnest(range(10)) AS k) k
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

for t in ["customer", "supplier", "part", "nation", "region", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

for t in ["documents", "embeddings", "orders", "lineitem"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)
