#!/usr/bin/env python3
"""Determinism probe: diff two Verify output trees (different CPUS runs).

Usage: determinism_diff.py DIR_A DIR_B

Reads every per-query parquet dir present in either tree and compares
row-by-row after stringification (the same tolerance-free view the
driver's hash gate takes). Any diff means a query lacks a total-order
sort or rounds nondeterministically; a dir present on one side only
means the two runs compiled different code — rerun both.
"""
import glob
import os
import sys

import pandas as pd


def load(d):
    # A query that threw inside Verify can leave an empty dir — report
    # it as a diffable empty frame instead of crashing the whole probe.
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return (pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            if files else pd.DataFrame())


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    dirs = lambda root: {os.path.basename(p) for p in glob.glob(os.path.join(root, "*"))
                         if os.path.isdir(p)}
    a, b = dirs(a_dir), dirs(b_dir)
    n_diff = 0
    for name in sorted(a ^ b):
        print(f"✗ {name}: present only in {'A' if name in a else 'B'} "
              "(runs compiled different code?)")
        n_diff += 1
    for name in sorted(a & b):
        da = load(os.path.join(a_dir, name)).astype(str)
        db = load(os.path.join(b_dir, name)).astype(str)
        if list(da.columns) != list(db.columns):
            print(f"✗ {name}: column mismatch {list(da.columns)} vs {list(db.columns)}")
            n_diff += 1
        elif not da.equals(db):
            print(f"✗ {name}: values differ")
            n_diff += 1
    print(f"{len(a & b)} compared, {n_diff} diffs")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
