#!/usr/bin/env python3
"""Time DuckDB executing every oracle SQL against a scale-factor dir.

Usage: python3 scripts/bench_oracle.py <sfDir> <verifyOutDir>
Prints one JSON line mirroring graft.Bench's format, for Spark-vs-DuckDB
single-node throughput comparison on identical semantics.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception:
            times[name] = -1.0
    total = sum(v for v in times.values() if v > 0)
    print(json.dumps({"metric": "total", "value": round(total, 3),
                      "unit": "sec", "queries": times, "sf": sf_dir,
                      "engine": f"duckdb-{duckdb.__version__}"}))


if __name__ == "__main__":
    main()
