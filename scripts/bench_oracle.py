#!/usr/bin/env python3
"""Time DuckDB executing every oracle SQL against a scale-factor dir.

Usage: python3 scripts/bench_oracle.py <sfDir> <verifyOutDir> [timeoutSec]

Prints one JSON line mirroring graft.Bench's format, for Spark-vs-DuckDB
single-node throughput comparison on identical semantics, and writes the
same object to DUCKDB_BENCH.json next to the cwd (the committed artifact
the verdict's bench_vs_baseline anchors on — r12 item 3: the 0.19x ratio
had been extrapolated from round-1/2 sweeps over only 65-95 queries).

Per-query TIMEOUT, no silent caps: a watchdog thread calls
Connection.interrupt() after `timeoutSec` (default 60 s); the query is
then reported in `skipped` with reason "timeout" and its elapsed wall
time, NOT dropped — `value` is the covered subtotal, `n_covered` /
`n_skipped` make the coverage explicit. The quadratic/recursive oracle
replays (pairwise-join reconstructions of O(n) Spark kernels) are the
expected members of the skip list at sf0.1.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    skipped = {}
    for name in sorted(oracle):
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            el = round(time.time() - t0, 3)
            reason = "timeout" if el >= timeout - 0.5 else f"error: {e}"[:200]
            skipped[name] = {"reason": reason, "elapsed_sec": el}
        finally:
            timer.cancel()
        sys.stderr.write(f"{name}: {times.get(name, skipped.get(name))}\n")
        sys.stderr.flush()
    total = sum(times.values())
    obj = {"metric": "total_covered", "value": round(total, 3),
           "unit": "sec", "n_covered": len(times), "n_skipped": len(skipped),
           "timeout_sec": timeout, "queries": times, "skipped": skipped,
           "sf": sf_dir, "engine": f"duckdb-{duckdb.__version__}"}
    with open("DUCKDB_BENCH.json", "w") as f:
        json.dump(obj, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in obj.items() if k != "queries"}))


if __name__ == "__main__":
    main()
