#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (dev tool, mirrors driver).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

Mirrors the driver compare *strictly* (round-1 lesson — the lax version
passed locally while the driver failed):
  - columns sorted by name, then dtypes must MATCH EXACTLY (int64 vs
    float64 is a FAIL even when values are numerically equal: the driver
    hashes typed values, so 3 != 3.0);
  - rows sorted by all columns inside try/except — a column the driver
    cannot sort/hash (array/map -> numpy.ndarray) is a FAIL here because
    it is an `err` there;
  - floats compared bit-exactly, including the -0.0 vs 0.0 distinction
    (both hash differently); NaN == NaN allowed (stable under hashing).
"""
import duckdb, json, sys, glob, math
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def cell_equal(x, y):
    xnull = x is None or (isinstance(x, float) and math.isnan(x))
    ynull = y is None or (isinstance(y, float) and math.isnan(y))
    if xnull or ynull:
        # keep None vs NaN distinct only when dtypes already matched:
        # within a float64 column both surface as NaN, which is fine.
        return xnull == ynull and (isinstance(x, float) == isinstance(y, float)
                                   or (x is None and y is None))
    if isinstance(x, float) and isinstance(y, float):
        return x == y and math.copysign(1.0, x) == math.copysign(1.0, y)
    if isinstance(x, float) != isinstance(y, float):
        return False  # int-vs-float dtype drift leaking through object cols
    return str(x) == str(y)

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # ScaleGen fixtures (target/sf1, sf10) are Spark-written
        # DIRECTORIES of part files; driver fixtures are single files
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:  # dev subset run (mirrors Verify's optional third arg)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_fail += 1; continue
        if sdf.shape != odf.shape:
            print(f"FAIL {name}: shape spark={sdf.shape} oracle={odf.shape}")
            n_fail += 1; continue
        # dtype-KIND-strict, like the driver's typed-value hash: int-vs-float
        # drift fails (3 hashes differently from 3.0) but int32-vs-int64
        # does not (round-1 evidence: 12 queries with int32/int64 drift all
        # hash-matched; the 2 that failed were int-vs-float)
        sdt, odt = [t.kind for t in sdf.dtypes], [t.kind for t in odf.dtypes]
        if sdt != odt:
            bad = [(c, str(a), str(b)) for c, a, b
                   in zip(sdf.columns, sdf.dtypes, odf.dtypes) if a.kind != b.kind]
            print(f"FAIL {name}: dtype-kind drift {bad}")
            n_fail += 1; continue
        # driver-unhashable columns (array/map surface as ndarray cells)
        bad_cols = [c for c in sdf.columns
                    if sdf[c].dtype == object and len(sdf) > 0
                    and isinstance(sdf[c].iloc[0], (np.ndarray, list, dict))]
        if bad_cols:
            print(f"FAIL {name}: driver-unhashable array/map columns {bad_cols}")
            n_fail += 1; continue
        # driver sorts rows by all columns before hashing — crash == err
        try:
            cols = list(sdf.columns)
            sdf = sdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
            odf = odf.sort_values(cols, kind="mergesort").reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: driver-style row sort crashed: {e}")
            n_fail += 1; continue
        ok = True
        for c in sdf.columns:
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if not cell_equal(x, y):
                    extra = ""
                    if isinstance(x, float) and isinstance(y, float):
                        extra = f" (absdiff {abs(x - y):.3e})"
                    print(f"FAIL {name}: col {c} row {i}: {x!r} != {y!r}{extra}")
                    ok = False; break
            if not ok: break
        if ok:
            print(f"PASS {name} ({sdf.shape[0]} rows)"); n_pass += 1
        else:
            n_fail += 1
    # queries without an oracle entry (rows-only check by driver) — still
    # verify the parquet loads and row-sorts (driver records rows even here)
    declared = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")}
    no_oracle = declared - set(oracle)
    if only:
        no_oracle &= set(only)
    for name in sorted(no_oracle):
        try:
            sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            sdf = sdf.reindex(sorted(sdf.columns), axis=1)
            sdf.sort_values(list(sdf.columns), kind="mergesort")
            print(f"rows-only {name}: {sdf.shape[0]} rows")
        except Exception as e:
            print(f"FAIL {name} (rows-only): driver compare would err: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
