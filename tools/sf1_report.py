#!/usr/bin/env python3
"""Assemble the per-query sf1 oracle-compare table from one or more
verify_local logs (passed as args). Emits a markdown table of
query -> rows -> OK, plus a coverage summary against the current
oracle registry, for BASELINE.md."""
import json, re, sys

logs = sys.argv[1:] or ["/tmp/sf1_verify.log", "/tmp/sf1_light.log",
                        "/tmp/sf1_new.log", "/tmp/sf1_q147.log"]
oracle = json.load(open("/tmp/graft_verify_sf1/oracle_sql.json"))
rows = {}
fails = []
for f in logs:
    try:
        text = open(f).read()
    except FileNotFoundError:
        continue
    for name, n in re.findall(r"^OK\s+(\S+): (\d+) rows", text, re.M):
        rows[name] = int(n)
    fails += re.findall(r"^FAIL\s+(\S+)", text, re.M)

missing = sorted(set(oracle) - set(rows))
print(f"{len(rows)}/{len(oracle)} green; FAILs: {sorted(set(fails))}; missing: {missing}")
print()
names = sorted(rows)
# compact 3-column markdown table
cells = [f"{q} {rows[q]:,}" for q in names]
per = 3
print("| " + " | ".join(["query rows(sf1)"] * per) + " |")
print("|" + "---|" * per)
for i in range(0, len(cells), per):
    row = cells[i:i + per] + [""] * (per - len(cells[i:i + per]))
    print("| " + " | ".join(row) + " |")
