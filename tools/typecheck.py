#!/usr/bin/env python3
"""Strict arrow-level schema parity between Spark verify output and the
DuckDB oracle. Value equality via str() (compare.py) is necessary but not
sufficient: the driver hashes *typed* values, so DuckDB HUGEINT
(decimal128(38,0)) vs Spark int64, or DECIMAL(38,2) vs DECIMAL(28,2),
hash-mismatch even when values print identically. Usage:

    python3 tools/typecheck.py <sfDir> <outDir>
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The driver's pandas/hash comparator is only proven safe on these arrow
# types (r1 broke on decimal128, r2 broke on lists). Compared queries must
# emit ONLY these — keep exact decimals/arrays internal and cast/join at
# the comparison boundary. int32 is allowed ONLY because identical-int32
# passthrough columns (source parquet keys) were driver hash-green in both
# rounds; the TYPEDIFF check above still rejects int32-vs-int64 mixes.
ALLOWED_TYPES = ("int64", "int32", "double", "string", "large_string",
                 "bool", "date32[day]", "timestamp[us]",
                 "timestamp[us, tz=UTC]")

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        try:
            o = con.execute(oracle[name]).fetch_arrow_table().schema
            s = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 5"
            ).fetch_arrow_table().schema
            od = {f.name: str(f.type) for f in o}
            sd = {f.name: str(f.type) for f in s}
            diff = {k: (sd.get(k), od.get(k))
                    for k in set(od) | set(sd) if od.get(k) != sd.get(k)}
            banned = {k: v for d in (sd, od) for k, v in d.items()
                      if v not in ALLOWED_TYPES}
            if diff:
                print(f"TYPEDIFF {name} (spark, oracle): {diff}")
                n_fail += 1
            elif banned:
                print(f"BANNEDTYPE {name}: {banned} "
                      f"(driver-safe types: {ALLOWED_TYPES})")
                n_fail += 1
        except Exception as e:
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
    print(f"== {len(oracle) - n_fail} ok, {n_fail} type-diff/err ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
