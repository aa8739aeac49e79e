#!/usr/bin/env python3
"""The STANDING planted-degeneracy gate: (re)generate target/degen
(sf0.01 + 1,300 byte-identical boilerplate docs — both the LSH
band-bucket cap and the hot-gram salting threshold fire) and
oracle-gate the degeneracy-guarding queries on it. Part of every
round's verify cycle beside the uniform-corpus gates; a cap or salting
regression that is invisible on hash-uniform data fails HERE.

Usage: python3 tools/gate_degenerate.py
"""
import os, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
GATE_QUERIES = ",".join([
    "q12_dedup_exact",          # collapses the planted copies to one keeper
    "q14_dedup_minhash_lsh",    # the capped pair build, cap FIRING
    "q122_substr_scrub",        # salted hot grams, threshold FIRING
    "q139_gram_skew_audit",     # the skew audit seeing the skew
    "q162_lsh_bucket_audit",    # capped/dropped candidate mass reported
])

for step in (
    [sys.executable, os.path.join(HERE, "gen_degenerate.py")],
    [sys.executable, os.path.join(HERE, "verify_local.py"),
     os.path.join(HERE, "..", "target", "degen"), f"--only={GATE_QUERIES}"],
):
    r = subprocess.run(step)
    if r.returncode != 0:
        sys.exit(r.returncode)
print("DEGENERATE-CORPUS GATE OK")
