#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (dev tool, mirrors driver).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import duckdb, json, sys, glob, math

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
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
        ok = True
        for c in sdf.columns:
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x is None and y is None: continue
                xn = isinstance(x, float) and math.isnan(x)
                yn = isinstance(y, float) and math.isnan(y)
                if xn and yn: continue
                if xn != yn or (x is None) != (y is None):
                    print(f"FAIL {name}: col {c} row {i}: {x!r} != {y!r}"); ok = False; break
                if isinstance(x, float) or isinstance(y, float):
                    if x != y:
                        d = abs(float(x) - float(y))
                        print(f"FAIL {name}: col {c} row {i}: {x!r} != {y!r} (absdiff {d:.3e})")
                        ok = False; break
                elif str(x) != str(y):
                    print(f"FAIL {name}: col {c} row {i}: {x!r} != {y!r}"); ok = False; break
            if not ok: break
        if ok:
            print(f"PASS {name} ({sdf.shape[0]} rows)"); n_pass += 1
        else:
            n_fail += 1
    # queries without an oracle entry (rows-only check by driver)
    declared = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")}
    no_oracle = declared - set(oracle)
    if no_oracle:
        print(f"rows-only (no oracle): {sorted(no_oracle)}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
