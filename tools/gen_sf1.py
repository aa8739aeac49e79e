#!/usr/bin/env python3
"""Generate a deterministic sf1-scale (10x sf0.1) documents+embeddings
corpus under target/sf1 for the scale spot-check (tools-side only — the
library never reads this path by default; /root/testdata stays the
correctness corpus and is read-only).

Matches the sf0.1 shape: same 31-token vocabulary, 10-100 tokens/doc,
20 sources, 5 langs; 50,000 docs. Embeddings: 20,000 x 64 float32 with
10 label-correlated centers (so IVF cells and margin mining have
structure). Seed fixed; regeneration is byte-stable.
"""
import os, random
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

OUT = os.path.join(os.path.dirname(__file__), "..", "target", "sf1")
os.makedirs(OUT, exist_ok=True)

vocab = [r[0] for r in duckdb.sql(
    "SELECT DISTINCT tok FROM (SELECT unnest(str_split(text,' ')) tok "
    "FROM read_parquet('/root/testdata/sf0.1/documents.parquet')) ORDER BY tok"
).fetchall()]
langs = [r[0] for r in duckdb.sql(
    "SELECT DISTINCT lang FROM read_parquet('/root/testdata/sf0.1/documents.parquet') ORDER BY lang"
).fetchall()]

rng = random.Random(1042)
N_DOCS, N_VECS, DIM = 50_000, 20_000, 64

# ~5% of sf0.1's 8-grams repeat; plant a small boilerplate pool to match
boiler = [" ".join(rng.choice(vocab) for _ in range(rng.randint(8, 14)))
          for _ in range(40)]

ids, texts, lg, src, nch = [], [], [], [], []
for i in range(N_DOCS):
    n = rng.randint(10, 100)
    toks = [rng.choice(vocab) for _ in range(n)]
    if rng.random() < 0.06:  # splice a boilerplate span at a random offset
        b = rng.choice(boiler).split(" ")
        off = rng.randint(0, max(0, len(toks) - len(b)))
        toks[off:off + len(b)] = b
    t = " ".join(toks)
    ids.append(i); texts.append(t)
    lg.append(rng.choice(langs)); src.append(f"src{rng.randint(0, 19)}")
    nch.append(len(t))
pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts,
                         "lang": lg, "source": src,
                         "n_chars": pa.array(nch, pa.int64())}),
               os.path.join(OUT, "documents.parquet"))

# labels 2k / 2k+1 share a near-identical center (the bitext shape:
# same content, different language) so IVF cells hold BOTH labels and
# cross-label margin mining has real candidates at scale
base = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(5)]
centers = [[base[l // 2][d] + rng.gauss(0, 0.05) for d in range(DIM)]
           for l in range(10)]
vid, emb, lab = [], [], []
for i in range(N_VECS):
    l = rng.randint(0, 9)
    v = [centers[l][d] + rng.gauss(0, 0.6) for d in range(DIM)]
    vid.append(i); emb.append([float(f"{x:.6g}") for x in v]); lab.append(l)
pq.write_table(pa.table({"vec_id": pa.array(vid, pa.int64()),
                         "embedding": pa.array(emb, pa.list_(pa.float32())),
                         "label": pa.array(lab, pa.int32())}),
               os.path.join(OUT, "embeddings.parquet"))
print(f"wrote {N_DOCS} docs / {N_VECS} vecs to {OUT}")

# ---- star-schema tables at 10x sf0.1 (key-offset replication) ----
# The full-registry sf1 gate needs every table, not just the corpus.
# Self-consistent data is all the oracle compare requires (Spark and
# DuckDB read the SAME parquet): each of the 10 key-offset copies
# preserves sf0.1's FK graph and event orderings exactly; cross-copy
# interaction only occurs in global aggregates, which are well-defined
# on the union. Strides are aligned (user_id/custkey share 1e6) so any
# cross-table key equality that held in sf0.1 holds per copy.
SRC = "/root/testdata/sf0.1"
con = duckdb.connect()
KS = "(SELECT unnest(range(10)) AS k) ks"

def rep(table, sql):
    con.sql(f"COPY ({sql}) TO '{os.path.join(OUT, table + '.parquet')}' (FORMAT PARQUET)")

for t in ("region", "nation"):  # fixed dims, one copy
    rep(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

rep("customer", f"""SELECT c_custkey + k*1000000 AS c_custkey, c_name,
    c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet'), {KS} ORDER BY c_custkey""")
rep("supplier", f"""SELECT s_suppkey + k*1000000 AS s_suppkey, s_name,
    s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet'), {KS} ORDER BY s_suppkey""")
rep("part", f"""SELECT p_partkey + k*1000000 AS p_partkey, p_name, p_brand,
    p_type, p_size, p_retailprice
  FROM read_parquet('{SRC}/part.parquet'), {KS} ORDER BY p_partkey""")
rep("orders", f"""SELECT o_orderkey + k*10000000 AS o_orderkey,
    o_custkey + k*1000000 AS o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet'), {KS} ORDER BY o_orderkey""")
rep("lineitem", f"""SELECT l_orderkey + k*10000000 AS l_orderkey,
    l_partkey + k*1000000 AS l_partkey, l_suppkey + k*1000000 AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), {KS} ORDER BY l_orderkey, l_linenumber""")
rep("events", f"""SELECT event_id + k*10000000 AS event_id, ts,
    user_id + k*1000000 AS user_id, event_type, value, props
  FROM read_parquet('{SRC}/events.parquet'), {KS} ORDER BY event_id""")
print(f"wrote star schema (10x sf0.1) to {OUT}")
