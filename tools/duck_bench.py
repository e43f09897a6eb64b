#!/usr/bin/env python3
"""Same-window DuckDB timing of the oracle workload.

Usage: python3 tools/duck_bench.py <verify_out_dir> <sf_dir> [runs]

Reads oracle_sql.json (as dumped by graft.Verify — late-bound oracles
already fingerprinted for sf_dir), registers the parquet tables as
views, and times each oracle min-of-N (default 2) after one warmup of
the whole set. Prints per-query seconds and the total, so a Spark
bench and this can be paired inside one container window (cross-window
DuckDB totals swing ~15% on identical SQL — only same-window pairings
are meaningful; PLANS.md round-8 audit)."""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    vout, sf = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sql = json.load(open(os.path.join(vout, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name, q in sql.items():  # warmup pass
        try:
            con.execute(q).fetchall()
        except Exception as e:
            print(f"[duck] warmup {name} failed: {e}", file=sys.stderr)
    out = {}
    for name, q in sql.items():
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(q).fetchall()
            except Exception:
                best = -1.0
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    total = sum(v for v in out.values() if v > 0)
    print(json.dumps({"total_sec": round(total, 2), "n": len(out),
                      "queries": out}))


if __name__ == "__main__":
    main()
