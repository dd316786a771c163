#!/usr/bin/env python3
"""Dev tool: build a K×-replicated copy of the documents/embeddings
tables (the LLM-pipeline workload) for scaling-slope measurement.

Replicas get distinct ids (doc_id + k*stride) and lightly perturbed
content — a replica marker token in text, a small uniform per-replica
shift on every embedding dimension — so dedup/ANN workloads keep their
SHAPE (cluster
sizes, bucket occupancy) instead of degenerating into k-way exact
duplicates whose pairwise outputs would grow quadratically by
construction. TPC-H tables are hard-linked unchanged: the slope is
measured on the document/vector queries.

Documents/embeddings are written with small (2048-row) parquet row
groups so the scaled files are SPLITTABLE: the dev fixtures are one
file with one row group, which caps the scan stage — where the
explode + partial-aggregate map work of the text/vector gates runs —
at ONE task regardless of core count, flattening every core-scaling
slope by construction. With many row groups plus a scan-split
override (SPARK_GRAFT_MAX_PARTITION_BYTES, see GraftSession) the scan
parallelizes like a production multi-file input.

Usage: make_scaled.py <src_sf_dir> <dst_dir> <k>
"""
import sys, os, shutil, glob
import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

doc_stride = con.execute(
    f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
vec_stride = con.execute(
    f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]

con.execute(f"""
COPY (
  SELECT doc_id + r.k*{doc_stride} AS doc_id,
         CASE WHEN r.k = 0 THEN text ELSE text || ' r' || r.k END AS text,
         lang, source,
         CASE WHEN r.k = 0 THEN n_chars
              ELSE n_chars + 2 + len(cast(r.k as varchar)) END AS n_chars
  FROM '{src}/documents.parquet', (SELECT unnest(range({k})) k) r
  ORDER BY doc_id
) TO '{dst}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)""")

con.execute(f"""
COPY (
  SELECT vec_id + r.k*{vec_stride} AS vec_id,
         CASE WHEN r.k = 0 THEN embedding
              ELSE list_transform(embedding,
                     x -> cast(x + r.k*0.001 as float)) END AS embedding,
         label
  FROM '{src}/embeddings.parquet', (SELECT unnest(range({k})) k) r
  ORDER BY vec_id
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)""")

# part: the t83/t94 vocabulary is DISTINCT p_name words, so replicating
# rows alone would not grow it. Each replica suffixes every word with a
# 3-char replica tag (aaa/bbb/...): vocabulary size scales by k, within-
# replica edit-distance structure is preserved (a shared suffix doesn't
# change Levenshtein distances), and cross-replica distances are >= 3 —
# outside the maxDist=2 envelope, so candidate density per word stays
# the base density instead of acquiring k^2 synthetic near-dups.
part_stride = con.execute(
    f"SELECT max(p_partkey)+1 FROM '{src}/part.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT p_partkey + r.k*{part_stride} AS p_partkey,
         CASE WHEN r.k = 0 THEN p_name
              ELSE array_to_string(list_transform(string_split(p_name, ' '),
                     w -> w || repeat(chr(cast(97 + (r.k % 26) as int)), 3)), ' ')
         END AS p_name,
         p_brand, p_type, p_size, p_retailprice
  FROM '{src}/part.parquet', (SELECT unnest(range({k})) k) r
  ORDER BY p_partkey
) TO '{dst}/part.parquet' (FORMAT PARQUET)""")

# customer: strided distinct keys; t96 derives grid coordinates by
# hashing c_custkey, so k x customers = k x points in the same spatial
# domain (density grows with k — the fixed-domain densification story,
# see SCALING.md's t96 note)
cust_stride = con.execute(
    f"SELECT max(c_custkey)+1 FROM '{src}/customer.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT c_custkey + r.k*{cust_stride} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{src}/customer.parquet', (SELECT unnest(range({k})) k) r
  ORDER BY c_custkey
) TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

ord_stride = con.execute(
    f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT o_orderkey + r.k*{ord_stride} AS o_orderkey,
         o_custkey, o_orderstatus, o_totalprice,
         CAST(o_orderdate + r.k * INTERVAL 1 SECOND AS TIMESTAMP_MS)
           AS o_orderdate,
         o_orderpriority
  FROM '{src}/orders.parquet', (SELECT unnest(range({k})) k) r
  ORDER BY o_orderkey
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

ev_stride = con.execute(
    f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT event_id + r.k*{ev_stride} AS event_id,
         -- Spark reads the original TIMESTAMP(NANOS) column as an
         -- epoch-ns long (nanosAsLong); DuckDB's COPY would narrow a
         -- shifted timestamp to µs, so emit the epoch-ns long directly
         epoch_ns(ts) + r.k * 1000 AS ts,
         user_id, event_type, value, props
  FROM '{src}/events.parquet', (SELECT unnest(range({k})) k) r
  ORDER BY event_id
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

for p in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(p)
    if name in ("documents.parquet", "embeddings.parquet"):
        continue
    q = os.path.join(dst, name)
    if not os.path.exists(q):
        try:
            os.link(p, q)
        except OSError:
            shutil.copyfile(p, q)

print(f"wrote {dst}: documents x{k} (stride {doc_stride}), "
      f"embeddings x{k} (stride {vec_stride}), part x{k}, customer x{k}")
