#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps produced by `graft.Verify` and compares each against
its DuckDB oracle SQL (oracle_sql.json) on the same test tables — value-exact,
column-name-sorted, row-order-sensitive — so any mismatch the driver would
flag shows up here first. Dev tool only; not part of the engine.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"create view {name} as select * from read_parquet('{p}')")

# Full-set artifact preferred; .partial is what Verify writes under the
# SPARK_GRAFT_ONLY dev filter (it refuses the gate name for partial dumps).
_oracle_path = f"{out_dir}/oracle_sql.json"
if not os.path.exists(_oracle_path):
    _oracle_path = f"{out_dir}/oracle_sql.partial.json"
    print(f"NOTE: using PARTIAL oracle set {_oracle_path} (dev filter run)")
oracle = json.load(open(_oracle_path))
ok, bad, noracle = [], [], []
dump_dirs = sorted(glob.glob(f"{out_dir}/*/"))
found = {os.path.basename(d.rstrip("/")) for d in dump_dirs}
# A query that threw in Verify writes no dump dir; don't let it vanish green.
for name in sorted(set(oracle) - found):
    bad.append((name, "no parquet dump (query threw in Verify?)"))
for qdir in dump_dirs:
    name = os.path.basename(qdir.rstrip("/"))
    got = pd.read_parquet(qdir)
    if name not in oracle:
        noracle.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        bad.append((name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        bad.append((name, f"row count differs: spark={len(got)} oracle={len(exp)}"))
        continue
    mismatch = None
    for c in got.columns:
        a, b = got[c], exp[c]
        if str(a.dtype) != str(b.dtype):
            mismatch = f"col {c}: dtype spark={a.dtype} oracle={b.dtype}"
            # keep checking values too
        av, bv = a.values, b.values
        try:
            if a.dtype == object or b.dtype == object:
                # null-aware: astype(str) would equate real null with 'None'
                an, bn = pd.isna(pd.Series(av)), pd.isna(pd.Series(bv))
                eq_str = pd.Series(av).astype(str) == pd.Series(bv).astype(str)
                neq = ~((an & bn) | (~an & ~bn & eq_str))
            else:
                neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        except Exception as e:
            mismatch = (mismatch or "") + f"; col {c}: compare error {e}"
            continue
        if neq.any():
            i = int(np.argmax(neq))
            mismatch = (mismatch or "") + f"; col {c}: {int(neq.sum())} diffs, first row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    if mismatch:
        bad.append((name, mismatch.lstrip("; ")))
    else:
        ok.append(name)

print(f"== OK ({len(ok)}): {' '.join(ok)}")
# Every declared query carries an oracle (SURVEY §2.13) — a dump with no
# oracle SQL is a gate hole, not a pass, so it reddens the run too.
for name, rows in noracle:
    print(f"== NO-ORACLE (fails gate): {name} rows={rows}")
for name, why in bad:
    print(f"== FAIL: {name}: {why}")
sys.exit(1 if bad or noracle else 0)
