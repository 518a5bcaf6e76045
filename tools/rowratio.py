#!/usr/bin/env python3
"""Row-count ratio eyeball across scale factors (r16, the r15 lesson
operationalized: oracle-by-construction compares check EQUALITY, not
USEFULNESS — dedup_embedding_lsh sat green for 7 rounds returning 0
pairs past sf0.2, and pipeline_curate_ppl passed sf10 with 0 rows
because its fixed ppl<=30 gate emptied once the corpus LM's perplexity
floor drifted past it).

Flags queries whose big-fixture PASS row count is zero or SMALLER than
their sf0.01 row count (1000x the data, fewer rows = a threshold or
cap is probably silently degrading). Histogram/summary queries and
fixed-probe-set queries (user_id <= 30, qid < 50) flag benignly — the
point is to force one human look, not to auto-fail.

Usage: python3 tools/rowratio.py <CORRECTNESS_rN.json> <ledger.jsonl>...
"""
import json, re, sys

small = {k: v.get('spark_rows') for k, v in json.load(open(sys.argv[1])).items()
         if isinstance(v, dict)}
big = {}
for f in sys.argv[2:]:
    for l in open(f):
        r = json.loads(l)
        m = re.match(r'^(\d+) rows$', r.get('detail', ''))
        if r['status'] == 'pass' and m:
            big[r['name']] = int(m.group(1))  # last status wins

sus = [(n, small.get(n), r) for n, r in sorted(big.items())
       if small.get(n) is not None and (r == 0 or (small[n] > 0 and r < small[n]))]
for n, r0, r1 in sus:
    print(f"SUSPECT {n}: small={r0} big={r1}")
print(f"== {len(sus)} suspect of {len(big)} compared (each needs one "
      f"human look; see module comments for the benign classes)")
