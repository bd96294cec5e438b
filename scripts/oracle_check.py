#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: read our parquet result, run the
oracle SQL in DuckDB over the same source tables, sort columns by name,
and compare row-by-row for exact equality. Prints PASS/FAIL per query
with a diff sample on mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df


def cell_eq(a, b) -> bool:
    import decimal
    import struct

    import numpy as np
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        la = list(a) if a is not None else None
        lb = list(b) if b is not None else None
        if la is None or lb is None or len(la) != len(lb):
            return la is lb
        return all(cell_eq(x, y) for x, y in zip(la, lb))
    if pd.isna(a) or pd.isna(b):
        return bool(pd.isna(a)) and bool(pd.isna(b))
    # The driver's hash is representation-sensitive: a decimal.Decimal on
    # one side and a float on the other hash differently even when equal,
    # and floats must match BITWISE (no tolerance). Mirror that here.
    if isinstance(a, decimal.Decimal) != isinstance(b, decimal.Decimal):
        return False
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        return struct.pack("d", float(a)) == struct.pack("d", float(b))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or sorted(oracle)
    for name in only:
        sql = oracle[name]
        try:
            ours = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark dump ({e})")
            n_fail += 1
            continue
        try:
            theirs = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(ours.columns)} vs {list(theirs.columns)}")
            n_fail += 1
            continue
        if len(ours) != len(theirs):
            print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(ours)):
            for c in ours.columns:
                if not cell_eq(ours.at[i, c], theirs.at[i, c]):
                    bad = (i, c, ours.at[i, c], theirs.at[i, c])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            print("  spark:", ours.iloc[i].to_dict())
            print("  duck :", theirs.iloc[i].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ours)} rows)")
            n_pass += 1
    missing = [k for k in sorted(set(sys.argv[3:]) - set(oracle))] if sys.argv[3:] else []
    for m in missing:
        print(f"SKIP {m}: not in oracle_sql.json")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
