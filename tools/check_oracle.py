#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark-written parquet,
run the matching oracle SQL from oracle_sql.json in DuckDB against the raw
sfDir tables, align columns by sorted name, and compare row-by-row.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cell_eq(a, b):
    # arrays/lists first: pd.isna is ambiguous on them
    if hasattr(a, '__len__') and not isinstance(a, str):
        if not hasattr(b, '__len__') or isinstance(b, str) or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) != pd.isna(b):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) < 1e-12
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    # a query that threw inside Verify leaves no result dir — that's a fail
    have = {os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
            if os.path.isdir(p)}
    for name in sorted(set(oracles) - have):
        print(f"✗ {name}: no Spark result written (query threw in Verify)")
        n_fail += 1
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)]) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [no-oracle] {name}: {len(spark_df)} rows")
            n_noracle += 1
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: DuckDB error: {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"✗ {name}: columns differ: spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"✗ {name}: row counts differ: spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        bad = None
        sv, dv = s.values, d.values
        for i in range(len(s)):
            for j in range(len(s.columns)):
                if not cell_eq(sv[i][j], dv[i][j]):
                    bad = (i, s.columns[j], sv[i][j], dv[i][j])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"✗ {name}: row {i} col {c}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(s)} rows match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
