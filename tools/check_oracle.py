#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --selftest

For each query dir under verifyOutDir: load the Spark-written parquet,
run the matching oracle SQL from oracle_sql.json in DuckDB against the raw
sfDir tables, align columns by sorted name, and compare row-by-row.

DTYPE-STRICT (r10): the r9 driver gate failed two keys whose VALUES all
matched because DuckDB widened an integer windowed sum() to HUGEINT
(int128), which materializes as float64/object while Spark emits int64 —
and the old cell_eq here compared 310 == 310.0 as equal, so the replica
certified keys the driver then failed. Now:
  - column numeric KIND must match (int vs float vs bool vs timestamp vs
    object) — exact width (int32 vs int64) is not a signal because the
    driver hashes values, not physical widths;
  - floats compare EXACTLY (the suite is engineered for bitwise-stable
    doubles: cents-integer sums, r2/r6 rounding, total orders);
  - cell-level float-ness must agree (catches object columns that mix
    kinds per row, which column dtype alone can't see).
"""
import sys, json, glob, os
import numpy as np
import pandas as pd
try:
    import duckdb
except ImportError:  # --selftest needs no duckdb
    duckdb = None


def norm(df):
    return df.reindex(sorted(df.columns), axis=1)


def col_kind(dtype):
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "Mm":
        return "timestamp"
    return "object"


def is_floaty(x):
    return isinstance(x, (float, np.floating))


def is_inty(x):
    return isinstance(x, (int, np.integer)) and not isinstance(x, (bool, np.bool_))


def cell_eq(a, b):
    # arrays/lists first: pd.isna is ambiguous on them
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not hasattr(b, "__len__") or isinstance(b, str) or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    if hasattr(b, "__len__") and not isinstance(b, str):
        return False
    na_a, na_b = pd.isna(a), pd.isna(b)
    if na_a and na_b:
        return True
    if na_a != na_b:
        return False
    # dtype-strict: an int on one side and a float on the other is a FAIL
    # even when the values are numerically equal — that is exactly the
    # HUGEINT→float64 class the driver hash rejects.
    if is_floaty(a) != is_floaty(b):
        return False
    if is_floaty(a):
        return a == b  # exact: the suite is built for bitwise-stable doubles
    if is_inty(a) != is_inty(b):
        return False
    return a == b


def compare(name, s, d):
    """Returns None on match, else a human-readable failure string."""
    s, d = norm(s), norm(d)
    if list(s.columns) != list(d.columns):
        return f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"row counts differ: spark={len(s)} duck={len(d)}"
    for c in s.columns:
        ks, kd = col_kind(s[c].dtype), col_kind(d[c].dtype)
        if ks != kd:
            return (f"col {c} dtype kind differs: spark={s[c].dtype}({ks}) "
                    f"duck={d[c].dtype}({kd})")
    sv, dv = s.values, d.values
    for i in range(len(s)):
        for j in range(len(s.columns)):
            if not cell_eq(sv[i][j], dv[i][j]):
                return (f"row {i} col {s.columns[j]}: "
                        f"spark={sv[i][j]!r} duck={dv[i][j]!r}")
    return None


def selftest():
    """The checker must FAIL an int-vs-float frame with equal values."""
    ints = pd.DataFrame({"k": [1, 2], "v": pd.array([310, 7], dtype="int64")})
    flts = pd.DataFrame({"k": [1, 2], "v": pd.array([310.0, 7.0], dtype="float64")})
    objs = pd.DataFrame({"k": [1, 2], "v": pd.array([310, 7], dtype="object")})
    fails = []
    if compare("int-vs-float", ints, flts) is None:
        fails.append("int64-vs-float64 with equal values was accepted")
    if compare("int-vs-object", ints, objs) is None:
        fails.append("int64-vs-object with equal values was accepted")
    if compare("self", ints, ints.copy()) is not None:
        fails.append("identical frames were rejected")
    near = pd.DataFrame({"v": [1.0 + 1e-13]})
    base = pd.DataFrame({"v": [1.0]})
    if compare("float-tol", base, near) is None:
        fails.append("1e-13 float drift was accepted (tolerance must be exact)")
    if fails:
        for f in fails:
            print(f"✗ selftest: {f}")
        sys.exit(1)
    print("✓ selftest: dtype-strict comparison behaves as required")
    sys.exit(0)


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
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
        bad = compare(name, spark_df, duck_df)
        if bad:
            print(f"✗ {name}: {bad}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(spark_df)} rows match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
