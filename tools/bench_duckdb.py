#!/usr/bin/env python3
"""Time oracle SQLs in DuckDB against the same parquet tables.

Usage: python3 tools/bench_duckdb.py <oracle_sql.json> <sf_dir> [passes]

Prints ONE JSON line: {"q_name": best_seconds, ...} (best of `passes`,
default 3 — the same reduction graft.Bench applies to its own Spark
timings, so neither engine gets a luckier reduction).

graft.Bench invokes this (when python3+duckdb are present) to measure
the single-node DuckDB baseline in the SAME session window as the
Spark numbers: BASELINE.md documents that both engines swing with
ambient load, and not together — a committed calm-window baseline
compared against a loaded-window Spark run misreads load as
regression. The committed files stay as the regression alarm; the
live pair is the honest same-window comparison.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    oracle = json.loads(Path(sys.argv[1]).read_text())
    sf_dir = Path(sys.argv[2])
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    timings = {}
    for name in sorted(oracle):
        sql = oracle[name]
        ts = []
        try:
            for _ in range(max(1, passes)):
                t0 = time.time()
                con.execute(sql).fetchall()
                ts.append(time.time() - t0)
        except Exception as e:  # noqa: BLE001 - a failing oracle isn't timed
            # visible on the Scala side's inherited stderr: a silently
            # shrinking comparison set would misread as a ratio shift
            print(f"bench_duckdb: skipping {name}: {e}", file=sys.stderr)
            continue
        timings[name] = round(min(ts), 4)
    print(json.dumps(timings, sort_keys=True))


if __name__ == "__main__":
    main()
