#!/usr/bin/env python3
"""Write CORRECTNESS_LOCAL_r{N}.json from a tools/check.py log.

Usage: python3 tools/correctness_local.py <round> <sfdir> <check_log> [out]

Parses the PASS / "ok?" / FAIL lines check.py printed and emits the
round-close artifact shape (round, sf_dir, queries, hash_match,
rows_only, fail, per_query). Driver-side tooling only — NOT part of the
shipped library.
"""
import json, re, sys

rnd = int(sys.argv[1])
sfdir = sys.argv[2]
log = open(sys.argv[3]).read().splitlines()
out = sys.argv[4] if len(sys.argv) > 4 else f"CORRECTNESS_LOCAL_r{rnd}.json"

per = {}
for l in log:
    m = re.match(r"PASS (\S+): rows=(\d+)", l)
    if m:
        per[m.group(1)] = {"status": "hash_match", "rows": int(m.group(2))}
        continue
    m = re.match(r"ok\?  (\S+): rows=(\d+)", l)
    if m:
        per[m.group(1)] = {"status": "rows_only", "rows": int(m.group(2))}
        continue
    m = re.match(r"FAIL (\S+):", l)
    if m:
        per[m.group(1)] = {"status": "fail"}

counts = {"hash_match": 0, "rows_only": 0, "fail": 0}
for v in per.values():
    counts[v["status"]] += 1

doc = {
    "round": rnd,
    "sf_dir": sfdir,
    "queries": len(per),
    "hash_match": counts["hash_match"],
    "rows_only": counts["rows_only"],
    "fail": counts["fail"],
    "per_query": dict(sorted(per.items())),
}
with open(out, "w") as f:
    json.dump(doc, f, indent=0)
    f.write("\n")
print(f"{out}: {len(per)} queries, {counts['hash_match']} hash, "
      f"{counts['rows_only']} rows-only, {counts['fail']} fail")
