#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables (registered as bare-name views), reads the Spark
result parquet the Verify main wrote, and compares: column names (sorted),
row counts, and cell values. Usage:

    python3 tools/compare.py <sfDir> <outDir>
"""
import json, math, os, sys
import duckdb

def canon(rows, cols):
    """Sort columns by name, then rows; normalize floats/timestamps."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out), [cols[i] for i in idx]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        # driver testdata is one file per table; Spark-written scale-ups
        # (testdata-sf1) are directories of part files
        path = f"{sf_dir}/{tbl}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            want = con.execute(oracle[name])
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            wr, wc = canon(wrows, wcols)
            gr, gc = canon(grows, gcols)
            if wc != gc:
                print(f"FAIL {name}: cols spark={gc} oracle={wc}")
                n_fail += 1
            elif len(wr) != len(gr):
                print(f"FAIL {name}: rows spark={len(gr)} oracle={len(wr)}")
                n_fail += 1
            elif wr != gr:
                bad = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs (spark, oracle): {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
