#!/usr/bin/env python3
"""sf10 gate for q102_rrf_ensemble — the RRF ensemble whose single-SQL
oracle replay is DISK-bound on one host at 500k docs / 200k vecs.

Why not the ordinary verify_local hash gate: the oracle replays BOTH
retrievers from scratch, and each is a rank window over an in-bucket /
in-cell pair stream (LSH: sum(n_b^2) = 2.16e9 pairs at sf10 — measured,
printed below; IVF: ~6e8). DuckDB's window sort spills the full pair
stream, and the two retrievers' spills inside ONE query peaked at 76 GB
on a 79 GB budget (r15 attempt; the lr/ir MATERIALIZED serialization
was not enough — a completed sort's temp blocks are only reliably freed
at STATEMENT end, not mid-query).

The gate therefore runs the SAME oracle SQL as a sliced, sequential
protocol — the q166 decomposition applied to the ORACLE side:

  1. The dumped oracle (oracle_sql.json — the exact string the driver
     gates at sf0.01) is split at its top-level CTE boundaries; the
     shared state (en, bk, the asn selector chain) lands ONCE as temp
     tables.
  2. Each retriever's candidate+rank stage runs as K disjoint qid-hash
     slices (qid % K), one statement per slice, appending its (tiny,
     rank <= 3) survivors. Slicing by qid is an EXACT decomposition:
     every downstream operator — the rank windows, the RRF fusion, the
     final ranking — partitions by qid. Peak temp disk is one slice's
     window sort (~1/K of the single-SQL peak), freed at statement end.
  3. Fusion + final ranking run once over the two bounded lists, and
     the result is compared row-for-row against the engine dump
     (all-integer columns — exact equality, no float repr concerns).

The surgery is verifiable, not trusted: every split/replace asserts on
exact anchors from the generated SQL, and --check-single (run it at
sf0.01) asserts sliced-protocol == single-statement oracle == engine.

Usage:
  python3 tools/gate_q102_sf10.py [sfdir] [--slices-lsh=N] [--slices-ivf=N]
                                  [--check-single]

Expects a prior engine dump (tools/verify_local.py <sfdir>
--only=q102_rrf_ensemble, which also writes oracle_sql.json) under
/tmp/graft_verify_<sf>/ or GRAFT_VERIFY_OUT.
"""
import json
import os
import re
import sys
import time

import duckdb

SFDIR = (sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
         else "target/sf10")
OUT = os.environ.get("GRAFT_VERIFY_OUT",
                     "/tmp/graft_verify_" + os.path.basename(SFDIR.rstrip("/")))


def flag(name, default):
    for a in sys.argv:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


K_LSH = flag("slices-lsh", 12)
K_IVF = flag("slices-ivf", 4)

sql = json.load(open(f"{OUT}/oracle_sql.json"))["q102_rrf_ensemble"]

# ---- split the generated WITH-chain at top-level CTE anchors ----
# the generator emits each top-level CTE at column 0 as "<name> AS (" or
# "<name> AS MATERIALIZED ("; nested subqueries are indented, so a
# line-start regex finds exactly the top level. The final SELECT also
# starts at column 0.
anchors = [(m.start(), m.group(1))
           for m in re.finditer(r"(?m)^(?:WITH )?([a-z_][a-z_0-9]*) AS (?:MATERIALIZED )?\(", sql)]
final_m = re.search(r"(?m)^SELECT qid, rank, nid, rrf_micro FROM \(", sql)
assert final_m, "final SELECT anchor not found — oracle shape changed"
bounds = anchors + [(final_m.start(), "__final__")]
cte = {}
for (s, name), (e, _) in zip(bounds, bounds[1:]):
    body = sql[s:e].rstrip().rstrip(",")
    body = re.sub(r"^(?:WITH )?[a-z_0-9]+ AS (?:MATERIALIZED )?\(", "(", body, count=1)
    assert body.startswith("(") and body.endswith(")"), f"unbalanced CTE body for {name}"
    cte[name] = body[1:-1]
final_select = sql[final_m.start():]
expected_names = {"en", "bk", "lp", "lr", "cent", "sup", "smp", "asn_srk",
                  "asn_two", "asn_flat", "asn", "iq", "ix", "ip", "ir", "fu"}
assert set(cte) == expected_names, f"CTE set drifted: {sorted(set(cte) ^ expected_names)}"


def rewrite(body, **tables):
    for name, tbl in tables.items():
        body = re.sub(rf"\b{name}\b", tbl, body)
    return body


con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '50GB')}'")
con.execute("SET temp_directory='/tmp/graft_duck_spill'")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SFDIR}/documents.parquet'")
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SFDIR}/embeddings.parquet'")


def timed(label, stmt):
    t0 = time.time()
    con.execute(stmt)
    print(f"[q102-gate] {label}: {time.time() - t0:.1f} s", flush=True)


# ---- shared state, landed once ----
timed("t_en", f"CREATE TEMP TABLE t_en AS {cte['en']}")
timed("t_bk", f"CREATE TEMP TABLE t_bk AS {rewrite(cte['bk'], en='t_en')}")
asn_chain = (f"WITH cent AS ({cte['cent']}), sup AS ({cte['sup']}), "
             f"smp AS ({cte['smp']}), "
             f"asn_srk AS ({rewrite(cte['asn_srk'], en='t_en')}), "
             f"asn_two AS ({rewrite(cte['asn_two'], en='t_en')}), "
             f"asn_flat AS ({rewrite(cte['asn_flat'], en='t_en')}) "
             f"{cte['asn']}")
timed("t_asn (selector replay)", f"CREATE TEMP TABLE t_asn AS {asn_chain}")

mass = con.execute("""SELECT sum(n * n), max(n) FROM
  (SELECT bucket, count(*) AS n FROM t_bk GROUP BY bucket)""").fetchone()
print(f"[q102-gate] LSH pair mass sum(n_b^2)={mass[0]} max_bucket={mass[1]} "
      f"-> {K_LSH} slices (~{mass[0] // K_LSH} pairs live per statement)", flush=True)

# ---- retriever 1: LSH top-3, K_LSH sequential qid slices ----
lsh_anchor = "FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id"
assert cte["lp"].count(lsh_anchor) == 1, "lp join anchor drifted"
con.execute("CREATE TEMP TABLE t_lr (qid BIGINT, nid BIGINT, rank BIGINT)")
for k in range(K_LSH):
    lp_k = rewrite(cte["lp"].replace(
        lsh_anchor, lsh_anchor + f" AND a.vec_id % {K_LSH} = {k}"), bk="t_bk")
    lr_k = re.sub(r"\blp\b", "lp_k", cte["lr"])
    timed(f"t_lr slice {k + 1}/{K_LSH}",
          f"INSERT INTO t_lr WITH lp_k AS ({lp_k}) {lr_k}")

# ---- retriever 2: IVF top-3, K_IVF sequential qid slices ----
ivf_anchor = "FROM iq JOIN ix ON iq.cell = ix.cell AND qid <> nid"
assert cte["ip"].count(ivf_anchor) == 1, "ip join anchor drifted"
con.execute("CREATE TEMP TABLE t_ir (qid BIGINT, nid BIGINT, rank BIGINT)")
for k in range(K_IVF):
    ip_k = rewrite(cte["ip"].replace(
        ivf_anchor, ivf_anchor + f" AND qid % {K_IVF} = {k}"),
        iq="iq_k", ix="ix_k")
    iq_k = rewrite(cte["iq"], en="t_en", asn="t_asn")
    ix_k = rewrite(cte["ix"], en="t_en", asn="t_asn")
    ir_k = re.sub(r"\bip\b", "ip_k", cte["ir"])
    timed(f"t_ir slice {k + 1}/{K_IVF}",
          f"INSERT INTO t_ir WITH iq_k AS ({iq_k}), ix_k AS ({ix_k}), "
          f"ip_k AS ({ip_k}) {ir_k}")

# ---- fusion + final ranking over the two bounded lists ----
fu = rewrite(cte["fu"], lr="t_lr", ir="t_ir")
timed("expected (fuse + rank)",
      f"CREATE TEMP TABLE expected AS WITH fu AS ({fu}) {final_select}")

# ---- compare against the engine dump, exact ----
con.execute(f"CREATE VIEW engine AS SELECT * FROM '{OUT}/q102_rrf_ensemble/*.parquet'")
n_exp, n_eng = (con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
                for t in ("expected", "engine"))
d1 = con.execute("SELECT count(*) FROM (SELECT * FROM expected EXCEPT "
                 "SELECT qid, rank, nid, rrf_micro FROM engine)").fetchone()[0]
d2 = con.execute("SELECT count(*) FROM (SELECT qid, rank, nid, rrf_micro "
                 "FROM engine EXCEPT SELECT * FROM expected)").fetchone()[0]
print(f"[q102-gate] expected={n_exp} engine={n_eng} only_expected={d1} only_engine={d2}")

ok = n_exp == n_eng and n_exp > 0 and d1 == 0 and d2 == 0

# ---- optional: sliced protocol == the single dumped SQL (run at sf0.01,
# where the single statement is cheap — the surgery's own gate) ----
if "--check-single" in sys.argv:
    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE single AS {sql}")
    s1 = con.execute("SELECT count(*) FROM (SELECT * FROM expected EXCEPT "
                     "SELECT * FROM single)").fetchone()[0]
    s2 = con.execute("SELECT count(*) FROM (SELECT * FROM single EXCEPT "
                     "SELECT * FROM expected)").fetchone()[0]
    n_single = con.execute("SELECT count(*) FROM single").fetchone()[0]
    print(f"[q102-gate] single-SQL check: rows={n_single} "
          f"only_sliced={s1} only_single={s2} ({time.time() - t0:.1f} s)")
    ok = ok and s1 == 0 and s2 == 0 and n_single == n_exp

print(("OK   q102_rrf_ensemble (sliced oracle replay): %d rows" % n_eng) if ok
      else "FAIL q102_rrf_ensemble")
sys.exit(0 if ok else 1)
