#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>
For each query in oracle_sql.json: run the SQL in DuckDB over the parquet
tables, load the Spark parquet result, sort columns by name, sort rows,
and hash-compare cell values.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values: floats rounded, ints as int64, strings as-is
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).fetchdf()
            sdf = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            bad += 1
            continue
        so, ss = sorted(map(str.lower, odf.columns)), sorted(map(str.lower, sdf.columns))
        if so != ss:
            print(f"SCHEMA-MISMATCH {name}: oracle={so} spark={ss}")
            bad += 1
            continue
        odf.columns = [c.lower() for c in odf.columns]
        sdf.columns = [c.lower() for c in sdf.columns]
        ho, hs = norm(odf), norm(sdf)
        if len(odf) != len(sdf):
            print(f"ROWS-MISMATCH {name}: oracle={len(odf)} spark={len(sdf)}")
            bad += 1
        elif ho != hs:
            print(f"HASH-MISMATCH {name} (rows={len(odf)})")
            bad += 1
        else:
            print(f"OK   {name} rows={len(odf)}")
            ok += 1
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
