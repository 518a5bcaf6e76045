#!/usr/bin/env python3
"""Build the two r16 scale-probe fixtures from the sf10 ScaleGen output
(VERDICT r15 #5: both adaptive formulas — dedup_embedding_cosine's salt
width W and the LSH plane count pe — had only been exercised in the
regime where the r14 constants reproduce; ScaleGen cannot reach the
crossover (k caps at 128 isometries), so the probes are derived
fixtures, exactly the "synthetic max-label-block fixture" the verdict
prescribes):

  probe_pe: sf10's 200k embeddings + the first 80k rows duplicated
    with a +2e11 vec_id offset (above sf10's max id) -> n = 280,000 >
    64*2^12, so pe steps from 12 to 13 in dedup_embedding_lsh and
    ann_lsh_bucketed. Duplicated vectors are exact near-dups by
    construction (cos = 1 pairs through every shared bucket).

  probe_w: the first 80k embeddings with label forced to 0 (single
    max-label block). Verified with SPARK_GRAFT_CPUS=4 so the
    parallelism term is ceil(2*4/1) = 8 while the task-size term is
    ceil(80000^2/2 / 2.5e8) = 13 -> W = 13, the first measured point
    where the task-size term dominates.

Non-embeddings tables are symlinked from sf10 (sweep10.py's fresh_con
creates a DuckDB view per table and validates the file exists; the
probe queries only read embeddings).

Usage: python3 tools/probe_fixtures.py [sf10dir] [outroot]
"""
import duckdb, os, sys

sf10 = sys.argv[1] if len(sys.argv) > 1 else "target/sf10"
outroot = sys.argv[2] if len(sys.argv) > 2 else "target"
src = f"{sf10}/embeddings.parquet"
if os.path.isdir(src):
    src = f"{src}/*.parquet"

FIXTURES = {
    "probe_pe": f"""
        SELECT vec_id, embedding, label FROM '{src}'
        UNION ALL
        SELECT vec_id + 200000000000, embedding, label FROM (
          SELECT * FROM '{src}' ORDER BY vec_id LIMIT 80000)""",
    "probe_w": f"""
        SELECT vec_id, embedding, CAST(0 AS INT) AS label FROM (
          SELECT vec_id, embedding FROM '{src}' ORDER BY vec_id LIMIT 80000)""",
}
OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents"]

for name, sql in FIXTURES.items():
    d = os.path.join(outroot, name)
    os.makedirs(d, exist_ok=True)
    dest = os.path.join(d, "embeddings.parquet")
    duckdb.sql(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
    n = duckdb.sql(f"SELECT COUNT(*), COUNT(DISTINCT label) FROM '{dest}'").fetchone()
    print(f"{name}: rows={n[0]} labels={n[1]}")
    for t in OTHER_TABLES:
        link = os.path.join(d, f"{t}.parquet")
        target = os.path.relpath(os.path.join(sf10, f"{t}.parquet"), d)
        if not os.path.lexists(link):
            os.symlink(target, link)
