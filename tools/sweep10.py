#!/usr/bin/env python3
"""Serial, resumable DuckDB oracle sweep for the big ScaleGen fixtures
(sf1/sf10) — the r14 lesson operationalized: the heavy oracles run ONE
at a time (two concurrent 60 GB DuckDB spills exhausted the disk and
aborted pipeline_dedup_report's compare), cheapest-first, with every
result appended to a JSONL ledger so an interrupted sweep resumes
without repeating finished work.

Usage:
  python3 tools/sweep10.py <sfdir> <verify_outdir> <ledger.jsonl> [only1,only2,...]

The optional 4th argument is a comma-separated query-name filter (run
only those). Heavy-last ordering (the HEAVY tier below) is always on.

Compare semantics are check.py's driver mirror verbatim (columns sorted
by name, dtype-KIND-strict, bit-exact floats incl. -0.0, mergesort row
order). A per-query fresh DuckDB connection keeps one query's spill /
memory state from leaking into the next and lets us bound temp usage.
"""
import duckdb, json, sys, glob, math, os, time
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# Oracle-side cost model (families observed in the r13 sf1 / r14 sf10
# sweeps): plain SQL aggregates are seconds; these are minutes-to-hours
# at sf10 and run LAST, roughly cheapest-first within the tier.
HEAVY = [
    # fmix64 / seeded-hash chain replications (CPU-heavy, linear-ish)
    "text_decontaminate_fuzzy", "dedup_simhash", "dedup_minhash_lsh",
    "ann_lsh_bucketed", "ann_lsh_probe_indexed", "ann_lsh_probe_incremental",
    "ann_lsh_probe_migrated", "ann_lsh_probe_deleted", "dedup_embedding_lsh",
    # quadratic-pair oracles
    "multimodal_phash_pairs", "dedup_ngram_jaccard", "link_fuzzy_match",
    "search_near_copies", "dedup_embedding_cosine", "dedup_semantic_saltsplit",
    # kmeans chain (Iters unrolled Lloyd's in SQL)
    "cluster_kmeans_assign", "cluster_centroids", "sample_coreset",
    "dedup_semantic", "dedup_incremental_semantic", "dedup_semantic_prune",
    # composite pipelines over the above
    "pipeline_curate_ppl", "curation_dedup_aware_sample",
    "dedup_cluster_stats", "pipeline_dedup_report",
]

def cell_equal(x, y):
    xnull = x is None or (isinstance(x, float) and math.isnan(x))
    ynull = y is None or (isinstance(y, float) and math.isnan(y))
    if xnull or ynull:
        return xnull == ynull and (isinstance(x, float) == isinstance(y, float)
                                   or (x is None and y is None))
    if isinstance(x, float) and isinstance(y, float):
        return x == y and math.copysign(1.0, x) == math.copysign(1.0, y)
    if isinstance(x, float) != isinstance(y, float):
        return False
    if isinstance(x, (np.ndarray, list, dict)) or isinstance(y, (np.ndarray, list, dict)):
        raise ValueError("container cell reached cell_equal — str() compare "
                         "of arrays is unsafe (numpy elides long reprs)")
    return str(x) == str(y)

def fresh_con(sfdir, tmpdir):
    con = duckdb.connect()
    con.sql(f"SET temp_directory='{tmpdir}'")
    # default sized for 2 concurrent lanes; the kmeans-chain pair
    # oracles spill 75+ GB under 48GB and exhaust the disk even SOLO —
    # for those, run one-at-a-time with SWEEP_MEMLIMIT=100GB so the
    # intermediates stay in RAM (the host has 125 GB)
    con.sql(f"SET memory_limit='{os.environ.get('SWEEP_MEMLIMIT', '48GB')}'")
    for t in TABLES:
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con

def compare_one(con, name, sql, outdir):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return ("fail", "no spark output")
    sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    odf = con.sql(sql).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        return ("fail", f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
    if sdf.shape != odf.shape:
        return ("fail", f"shape spark={sdf.shape} oracle={odf.shape}")
    sdt, odt = [t.kind for t in sdf.dtypes], [t.kind for t in odf.dtypes]
    if sdt != odt:
        bad = [(c, str(a), str(b)) for c, a, b
               in zip(sdf.columns, sdf.dtypes, odf.dtypes) if a.kind != b.kind]
        return ("fail", f"dtype-kind drift {bad}")
    # fail-loud on array/map cells anywhere in the column — ALL non-null
    # cells are scanned (r16 ADVICE: checking only the first let a
    # mixed scalar-then-array column surface later as a mid-compare
    # 'err' from cell_equal instead of this column-level 'fail')
    def has_container(series):
        nn = series.dropna()
        return any(isinstance(v, (np.ndarray, list, dict)) for v in nn)
    bad_cols = [c for c in sdf.columns
                if sdf[c].dtype == object and has_container(sdf[c])]
    if bad_cols:
        return ("fail", f"driver-unhashable array/map columns {bad_cols}")
    cols = list(sdf.columns)
    sdf = sdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    odf = odf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        a, b = sdf[c].tolist(), odf[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if not cell_equal(x, y):
                extra = ""
                if isinstance(x, float) and isinstance(y, float):
                    extra = f" (absdiff {abs(x - y):.3e})"
                return ("fail", f"col {c} row {i}: {x!r} != {y!r}{extra}")
    return ("pass", f"{sdf.shape[0]} rows")

def main():
    sfdir, outdir, ledger_path = sys.argv[1], sys.argv[2], sys.argv[3]
    only = None
    if len(sys.argv) > 4 and not sys.argv[4].startswith("--"):
        only = set(sys.argv[4].split(","))
    done = {}
    if os.path.exists(ledger_path):
        for line in open(ledger_path):
            rec = json.loads(line)
            done[rec["name"]] = rec["status"]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    declared = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*")
                if not p.endswith(".json")}
    # every oracle entry is swept: a query whose Spark run crashed
    # before creating its output dir is a FAILURE (compare_one reports
    # "no spark output"), never silently dropped from coverage
    names = sorted(oracle)
    # the HEAVY cost model must name real queries — a rename would
    # otherwise silently misfile the query into the cheap tier
    unknown_heavy = [n for n in HEAVY if n not in oracle]
    assert not unknown_heavy, \
        f"HEAVY names not in oracle_sql.json (stale rename?): {unknown_heavy}"
    hw = {n: i for i, n in enumerate(HEAVY)}
    names.sort(key=lambda n: (n in hw, hw.get(n, 0)))
    if only:
        names = [n for n in names if n in only]
    missing = sorted(n for n in names if n not in declared)
    if missing:
        print(f"!! {len(missing)} oracle entries have no Spark output dir "
              f"(will be reported as fail): {missing}", flush=True)
    tmpdir = os.path.join(outdir, "_duck_tmp")
    os.makedirs(tmpdir, exist_ok=True)
    n_pass = n_fail = n_skip = 0
    for idx, name in enumerate(names):
        if name in done and done[name] in ("pass",):
            n_skip += 1
            continue
        t0 = time.time()
        try:
            con = fresh_con(sfdir, tmpdir)
            status, detail = compare_one(con, name, oracle[name], outdir)
            con.close()
        except Exception as e:
            status, detail = "err", f"{type(e).__name__}: {e}"
        dt = round(time.time() - t0, 1)
        rec = {"name": name, "status": status, "detail": detail, "sec": dt}
        with open(ledger_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{idx+1}/{len(names)}] {status.upper()} {name} ({dt}s) {detail}",
              flush=True)
        if status == "pass": n_pass += 1
        else: n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail-or-err / {n_skip} already-done ==")
    # Standing close-out stage (r17, verdict #3): on a FULL sweep, run
    # the cross-SF row-ratio gate against the newest driver correctness
    # artifact — zero/shrinking outputs on 1000x data mean a threshold
    # or cap silently degraded even though every compare PASSed. The
    # verdict lands in the ledger; an uncleared suspect fails the run.
    if only is None:
        import rowratio, re as _re
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        corrs = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
                       key=lambda p: int(_re.search(r"_r(\d+)\.json$", p).group(1)))
        if not corrs:
            print("rowratio: no CORRECTNESS_r*.json found — gate skipped")
            return
        sus, n_cmp = rowratio.suspects(corrs[-1], [ledger_path])
        uncleared = [n for n, _, _ in sus if n not in rowratio.ADJUDICATED_BENIGN]
        rec = {"name": "_rowratio_gate",
               "status": "fail" if uncleared else "pass",
               "detail": f"{len(sus)} suspect of {n_cmp} vs {os.path.basename(corrs[-1])}; "
                         f"uncleared={uncleared}; "
                         f"benign={[n for n, _, _ in sus if n in rowratio.ADJUDICATED_BENIGN]}"}
        with open(ledger_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"ROWRATIO {rec['status'].upper()}: {rec['detail']}")
        if uncleared:
            sys.exit(1)

if __name__ == "__main__":
    main()
