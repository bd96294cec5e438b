#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: read our parquet result, run the
oracle SQL in DuckDB over the same source tables, sort columns by name,
and compare row-by-row for exact equality. Prints PASS/FAIL per query
with a diff sample on mismatch.

Both sides are materialized at the ARROW level (pyarrow.parquet for the
Spark dump, con.execute(sql).arrow() for DuckDB) and their canonicalized
arrow schemas must match BEFORE any value compare. This catches the
r7 ship-red class — DuckDB SUM(BIGINT) silently widening to HUGEINT →
decimal128(38,0) against Spark's int64, or int32-vs-int64 day columns —
which fetchdf() used to flatten to float64/int64 before the "bitwise"
cell compare could ever see it. Canonicalization only strips
representation noise the driver's hash also ignores (large_string vs
string); integer width, decimal-ness, float-vs-int, and timestamp
unit/tz differences are hard FAILs.
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def canon_type(t: "pa.DataType") -> str:
    """Canonical type string: strips large_* noise, keeps width.

    Timestamp tz is PRESERVED: the house convention (Dets.tsOut) emits
    TIMESTAMP_NTZ precisely so parquet stores naive µs like DuckDB — a
    tz-aware Spark dump is itself a hash divergence, not noise."""
    if pa.types.is_timestamp(t):
        tz = f", tz={t.tz}" if t.tz else ""
        return f"timestamp[{t.unit}{tz}]"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(
            f"{t.field(i).name}: {canon_type(t.field(i).type)}"
            for i in range(t.num_fields))
        return f"struct<{inner}>"
    return str(t)


def schema_diff(ours: "pa.Table", theirs: "pa.Table"):
    """Return [(col, spark_type, duck_type)] for canonical-type mismatches."""
    bad = []
    for name in ours.schema.names:
        a = canon_type(ours.schema.field(name).type)
        b = canon_type(theirs.schema.field(name).type)
        if a != b:
            bad.append((name, a, b))
    return bad

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


def selftest():
    """Regression-test the checker itself against the r7 ship-red class:
    pre-fix q159 emitted DuckDB decimal128(38,0) `cents` against Spark
    int64 — fetchdf() flattened it before the value compare could see
    it. The arrow-schema gate must FAIL that pair, and the analogous
    int32-vs-int64 / tz-vs-naive pairs."""
    cases = [
        ("hugeint-leak", pa.int64(), pa.decimal128(38, 0), True),
        ("int-width", pa.int32(), pa.int64(), True),
        ("tz-leak", pa.timestamp("us", tz="UTC"), pa.timestamp("us"), True),
        ("large-string-noise", pa.string(), pa.large_string(), False),
        ("same", pa.int64(), pa.int64(), False),
    ]
    bad = 0
    for name, ta, tb, want_fail in cases:
        a = pa.table({"c": pa.array([], type=ta)})
        b = pa.table({"c": pa.array([], type=tb)})
        got_fail = bool(schema_diff(a, b))
        ok = got_fail == want_fail
        print(f"{'PASS' if ok else 'FAIL'} selftest {name}: "
              f"diff={'yes' if got_fail else 'no'} want "
              f"{'yes' if want_fail else 'no'}")
        bad += 0 if ok else 1
    print(f"== selftest {len(cases) - bad} pass / {bad} fail ==")
    sys.exit(1 if bad else 0)


def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
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
            ours_at = pq.read_table(f"{out_dir}/{name}")
            ours_at = ours_at.select(sorted(ours_at.schema.names))
        except Exception as e:
            print(f"FAIL {name}: no spark dump ({e})")
            n_fail += 1
            continue
        try:
            theirs_at = con.execute(sql).arrow()
            theirs_at = theirs_at.select(sorted(theirs_at.schema.names))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(ours_at.schema.names) != list(theirs_at.schema.names):
            print(f"FAIL {name}: columns {ours_at.schema.names} vs "
                  f"{theirs_at.schema.names}")
            n_fail += 1
            continue
        sbad = schema_diff(ours_at, theirs_at)
        if sbad:
            for col_, a, b in sbad:
                print(f"FAIL {name}: arrow type col {col_}: "
                      f"spark={a} duckdb={b}")
            n_fail += 1
            continue
        ours = norm(ours_at.to_pandas())
        theirs = norm(theirs_at.to_pandas())
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
