#!/usr/bin/env python3
"""Planted-skew correctness corpus under target/skewed: the sf1 corpus
plus 5% byte-identical boilerplate documents (2,600 copies of a
24-token block -> every block gram occurs 2,600x, far above the
HotGramOccurrences=1024 salting threshold). q122/q139 run hash-gated
against the DuckDB oracle on this corpus (tools/verify_local.py
target/skewed --only=q122_substr_scrub,q139_gram_skew_audit), proving
the salted scrub and the skew audit stay byte-correct when the skew
they guard against is actually present. Deterministic; regeneration is
byte-stable. Embeddings are copied so the warehouse's embedding-side
artifacts build identically."""
import os, shutil
import duckdb

HERE = os.path.dirname(__file__)
SF1 = os.path.join(HERE, "..", "target", "sf1")
OUT = os.path.join(HERE, "..", "target", "skewed")
os.makedirs(OUT, exist_ok=True)

BOILER = ("this software is provided as is without warranty of any kind "
          "express or implied including merchantability fitness and noninfringement")
N_PLANT = 2600  # 5% of the 52,600-doc result

con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars
  FROM read_parquet('{SF1}/documents.parquet')
  UNION ALL
  SELECT 1000000 + k AS doc_id, '{BOILER}' AS text, 'en' AS lang,
         'boilerplate' AS source, length('{BOILER}') AS n_chars
  FROM (SELECT unnest(range({N_PLANT})) AS k)
  ORDER BY doc_id
) TO '{os.path.join(OUT, "documents.parquet")}' (FORMAT PARQUET)""")
shutil.copy(os.path.join(SF1, "embeddings.parquet"),
            os.path.join(OUT, "embeddings.parquet"))
print(f"wrote sf1+{N_PLANT} planted boilerplate docs to {OUT}")
