#!/usr/bin/env python3
"""STANDING planted-degeneracy corpus under target/degen: the sf0.01
corpus plus 1,300 byte-identical boilerplate documents — sized so BOTH
degeneracy guards actually fire at gate time (1,300 > the LSH band-
bucket cap 256, and every boilerplate gram occurs 1,300x > the
HotGramOccurrences=1024 salting threshold), unlike the uniform corpora
where the caps are provably idle. Run the oracle gate on it in every
round's verify cycle (tools/gate_degenerate.py), not just in one-off
stress sessions: the LSH cap and the salted scrub are exactly the code
paths that stay untested on hash-uniform data.

Deterministic; regeneration is byte-stable. Embeddings are copied so
the warehouse's embedding-side artifacts build identically."""
import os, shutil
import duckdb

HERE = os.path.dirname(__file__)
SRC = os.environ.get("GRAFT_DEGEN_SRC", "/root/testdata/sf0.01")
OUT = os.path.join(HERE, "..", "target", "degen")
os.makedirs(OUT, exist_ok=True)

BOILER = ("this software is provided as is without warranty of any kind "
          "express or implied including merchantability fitness and noninfringement")
N_PLANT = 1300  # > LshMaxBucket (256) and > HotGramOccurrences (1024)

con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars
  FROM read_parquet('{SRC}/documents.parquet')
  UNION ALL
  SELECT 1000000 + k AS doc_id, '{BOILER}' AS text, 'en' AS lang,
         'boilerplate' AS source, length('{BOILER}') AS n_chars
  FROM (SELECT unnest(range({N_PLANT})) AS k)
  ORDER BY doc_id
) TO '{os.path.join(OUT, "documents.parquet")}' (FORMAT PARQUET)""")
shutil.copy(os.path.join(SRC, "embeddings.parquet"),
            os.path.join(OUT, "embeddings.parquet"))
print(f"wrote {SRC} + {N_PLANT} planted boilerplate docs to {OUT}")
