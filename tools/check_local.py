#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage:
  python3 tools/check_local.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"select * from read_parquet({files!r})").df()
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: exec error {str(e)[:300]}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                eq = (g.isna() & e.isna()) | np.isclose(
                    g.astype(float), e.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = eq.all()
                close = ((g.isna() & e.isna()) | np.isclose(
                    g.astype(float), e.astype(float), rtol=1e-9, atol=1e-12,
                    equal_nan=True)).all()
                if not exact:
                    bad.append((c, 'float-close' if close else 'float-differ',
                                _first_diff(g, e)))
            else:
                if g.dtype != e.dtype:
                    bad.append((c, f'dtype {g.dtype} vs {e.dtype}', None))
                    continue
                eq = (g.isna() & e.isna()) | (g == e)
                if not eq.all():
                    bad.append((c, 'differ', _first_diff(g, e)))
        if bad:
            print(f"FAIL {name}: {bad[:4]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def _first_diff(g, e):
    for i in range(len(g)):
        gv, ev = g.iloc[i], e.iloc[i]
        same = (pd.isna(gv) and pd.isna(ev)) or gv == ev
        if not same:
            return (i, gv, ev)
    return None

if __name__ == '__main__':
    main()
