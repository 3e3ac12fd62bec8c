#!/usr/bin/env python3
"""Time oracle SQLs in DuckDB against the same parquet tables.

Usage:
  python3 tools/bench_duckdb.py <oracle_sql.json> <sf_dir> [passes]
  python3 tools/bench_duckdb.py --serve <sf_dir>

File mode prints ONE JSON line: {"q_name": best_seconds, ...} (best of
`passes`, default 3 — the same reduction graft.Bench applies to its
own Spark timings, so neither engine gets a luckier reduction).

Serve mode (what graft.Bench uses for the INTERLEAVED live pair)
reads one JSON request per stdin line — {"name": ..., "sql": ...,
"passes": N} — times it best-of-N, and answers with one JSON line
{"name": ..., "sec": S} (or {"name": ..., "err": "..."}), flushing
after each. The protocol is synchronous, so the two engines never
time concurrently; it exists so each query's DuckDB oracle is timed
SECONDS after its Spark run instead of at the end of a 25-minute
Spark marathon. BASELINE.md documents that both engines swing with
ambient load, and not together — a marathon-then-sweep pairing
misreads a drifting window as an engine ratio. The committed files
stay as the regression alarm; the interleaved live pair is the
honest same-instant comparison.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def best_of(con, sql, passes):
    ts = []
    for _ in range(max(1, passes)):
        t0 = time.time()
        con.execute(sql).fetchall()
        ts.append(time.time() - t0)
    return round(min(ts), 4)


def serve(sf_dir):
    con = connect(sf_dir)
    # readiness handshake: the Scala side waits for this line before
    # timing anything, so duckdb import + view setup is never charged
    # to the first query
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        name = req.get("name", "?")
        try:
            sec = best_of(con, req["sql"], int(req.get("passes", 3)))
            print(json.dumps({"name": name, "sec": sec}), flush=True)
        except Exception as e:  # noqa: BLE001 - a failing oracle isn't timed
            print(json.dumps({"name": name, "err": str(e)}), flush=True)


def main():
    if sys.argv[1] == "--serve":
        serve(sys.argv[2])
        return
    oracle = json.loads(Path(sys.argv[1]).read_text())
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = connect(sys.argv[2])
    timings = {}
    for name in sorted(oracle):
        try:
            timings[name] = best_of(con, oracle[name], passes)
        except Exception as e:  # noqa: BLE001 - a failing oracle isn't timed
            # visible on the Scala side's inherited stderr: a silently
            # shrinking comparison set would misread as a ratio shift
            print(f"bench_duckdb: skipping {name}: {e}", file=sys.stderr)
    print(json.dumps(timings, sort_keys=True))


if __name__ == "__main__":
    main()
