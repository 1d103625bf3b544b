#!/usr/bin/env python3
"""Pre-flight DuckDB-oracle cost budget (round-16, after the round-15
driver artifact arrived EMPTY).

The driver's correctness gate runs every `oracleSql` entry in DuckDB;
one pathological oracle (round 15: q374's per-pixel CTE + recursive
connected components — measured >15 min / ~45 GB for 500 documents) can
time out or OOM the whole checker and zero the round's artifact. An
oracle the driver can't afford is a gate that doesn't exist, so every
oracle must prove it fits a per-query budget BEFORE the dump ever
reaches the driver.

Usage:
  python3 tools/oracle_budget.py <sfDir> <oracle_sql.json> \
      [--budget-sec 30] [--budget-mb 2048] [--jobs 4] \
      [--out ORACLE_BUDGET.json] [--only q1,q2]
  python3 tools/oracle_budget.py --child <sfDir>   (internal; SQL on stdin)

Each oracle runs STANDALONE in its own subprocess (fresh DuckDB, the
sfDir parquet tables as views) so a runaway query is killed at the wall
budget instead of wedging the sweep, and peak RSS is the child's own
ru_maxrss. DuckDB's memory_limit is pinned to the memory budget so an
over-budget oracle fails loudly inside the child rather than OOMing the
host. Exit is non-zero if ANY oracle exceeds either budget (or errors),
and the JSON report is written for GateContractSpec to cross-check
against the gated query set.

Tooling only (duckdb is a driver-side utility, not a library dep).
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def child(sf_dir, budget_mb):
    import duckdb
    sql = sys.stdin.read()
    con = duckdb.connect()
    # The budget is enforced on the child's MEASURED peak RSS (below);
    # DuckDB's own memory_limit is only a 4x runaway backstop, because
    # its internal reservation accounting trips well before RSS does —
    # limit==budget OOM-failed seven oracles whose true peaks were
    # under the budget.
    con.execute(f"SET memory_limit='{4 * budget_mb}MB'")
    # temp spill off so memory pressure fails loudly instead of
    # becoming silent disk churn
    con.execute("SET temp_directory=''")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    wall = time.time() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(json.dumps({"wall_sec": round(wall, 3),
                      "peak_rss_mb": round(rss_mb, 1),
                      "n_rows": len(rows)}))


def run_one(name, sql, sf_dir, budget_sec, budget_mb):
    cmd = [sys.executable, os.path.abspath(__file__),
           "--child", sf_dir, "--budget-mb", str(budget_mb)]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, input=sql, capture_output=True,
                              text=True, timeout=budget_sec * 2)
    except subprocess.TimeoutExpired:
        return {"query": name, "status": "TIMEOUT",
                "wall_sec": round(time.time() - t0, 3)}
    if proc.returncode != 0:
        return {"query": name, "status": "ERROR",
                "wall_sec": round(time.time() - t0, 3),
                "error": (proc.stderr or "")[-400:]}
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    rec["query"] = name
    over = []
    if rec["wall_sec"] > budget_sec:
        over.append(f"wall {rec['wall_sec']}s > {budget_sec}s")
    if rec["peak_rss_mb"] > budget_mb:
        over.append(f"rss {rec['peak_rss_mb']}MB > {budget_mb}MB")
    rec["status"] = "OVER_BUDGET: " + "; ".join(over) if over else "OK"
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("oracle_json", nargs="?")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--budget-sec", type=float, default=30.0)
    ap.add_argument("--budget-mb", type=int, default=2048)
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--out", default="ORACLE_BUDGET.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if args.child:
        child(args.sf_dir, args.budget_mb)
        return
    with open(args.oracle_json) as f:
        oracles = json.load(f)
    if args.only:
        keep = set(args.only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
    items = sorted(oracles.items())
    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        results = list(ex.map(
            lambda kv: run_one(kv[0], kv[1], args.sf_dir,
                               args.budget_sec, args.budget_mb), items))
    results.sort(key=lambda r: -r.get("wall_sec", 0))
    bad = [r for r in results if r["status"] != "OK"]
    report = {
        "sf_dir": args.sf_dir,
        "budget_sec": args.budget_sec,
        "budget_mb": args.budget_mb,
        "n_queries": len(results),
        "n_over_budget": len(bad),
        "total_wall_sec": round(sum(r.get("wall_sec", 0)
                                    for r in results), 1),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    for r in results[:15]:
        print(f"{r.get('wall_sec', '?'):>8} s  "
              f"{r.get('peak_rss_mb', '?'):>8} MB  "
              f"{r['status']:<12} {r['query']}")
    print(f"== {len(results) - len(bad)}/{len(results)} oracles within "
          f"budget ({args.budget_sec}s / {args.budget_mb}MB); "
          f"report -> {args.out} ==")
    if bad:
        for r in bad:
            print(f"FAIL {r['query']}: {r['status']}"
                  + (f" :: {r.get('error', '')}" if "error" in r else ""))
        sys.exit(1)


if __name__ == "__main__":
    main()
