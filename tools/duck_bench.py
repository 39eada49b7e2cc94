#!/usr/bin/env python3
"""Time oracle SQL in DuckDB against a parquet scale dir.

Usage: duck_bench.py <sfDir> <oracle_sql.json> <query_name> [...]

Registers each table as a view over the parquet file/dir (the same names
Verify's oracle SQL expects), then runs each named query N times (default
4) and prints per-query min/median seconds as one JSON line. Driver-side
tooling only (duckdb is not a library dependency of the engine).
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
ROUNDS = 4


def main() -> None:
    sf_dir, oracle_path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{pat}')")
    out = {}
    for name in names:
        sql = oracle[name]
        times = []
        for _ in range(ROUNDS):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        out[name] = {
            "min": round(min(times), 3),
            "median": round(statistics.median(times), 3),
        }
        print(f"[duck] {name}: min={min(times):.3f}s rounds={[round(t,3) for t in times]}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "rounds": ROUNDS, "queries": out}))


if __name__ == "__main__":
    main()
