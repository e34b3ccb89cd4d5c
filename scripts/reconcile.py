#!/usr/bin/env python3
"""Self-certify a driver bench artifact against same-round medians:
prints per-query driver/median ratios so contended lines identify
themselves (HOSTNOTE rule 3: >1.3x means trust the medians file).
Usage: python3 scripts/reconcile.py BENCH_rNN.json BENCH_MEDIANS_rNN.json
Driver-side tooling only; NOT part of the Scala library."""
import json, re, sys

bench = json.load(open(sys.argv[1]))
med = json.load(open(sys.argv[2]))
if "queries" in bench:
    qs = bench["queries"]
else:
    # driver artifacts carry a truncated stdout "tail" — scrape the
    # per-query pairs out of whatever fragment survived
    qs = {k: float(v) for k, v in
          re.findall(r'"(q[0-9][^"]*)":([0-9.]+)', bench.get("tail", ""))}
m = med["queries"]
rows = []
for q in sorted(set(qs) & set(m)):
    if qs[q] > 0 and m[q] > 0:
        rows.append((qs[q] / m[q], q, qs[q], m[q]))
rows.sort(reverse=True)
total_d = sum(r[2] for r in rows)
total_m = sum(r[3] for r in rows)
print(f"driver total {total_d:.1f}s vs median total {total_m:.1f}s "
      f"= {total_d/total_m:.2f}x over {len(rows)} queries")
hot = [r for r in rows if r[0] > 1.3]
print(f"{len(hot)} lines >1.3x (contended per HOSTNOTE rule 3):")
for ratio, q, d, mm in hot[:20]:
    print(f"  {q:32s} driver {d:7.2f}s median {mm:7.2f}s  {ratio:.2f}x")
