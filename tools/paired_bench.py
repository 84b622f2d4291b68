#!/usr/bin/env python3
"""Same-window paired DuckDB timing for the whole oracle suite.

The VM's load swings totals 30%+ between windows, so a Spark/DuckDB ratio
claim is only honest when both engines run in the same window (BASELINE.md
round-2 note). Protocol: run graft.Bench, then IMMEDIATELY run this against
the same sf dir and the oracle_sql.json the last Verify dumped.

Usage: python3 tools/paired_bench.py <sfDir> <oracleSqlJson> [sparkBenchJson]
  e.g. python3 tools/paired_bench.py /root/testdata/sf0.1 /tmp/verify01/oracle_sql.json /tmp/bench_now.json

Prints one JSON line: per-query min-of-2 DuckDB seconds, the total, and —
when a Spark bench JSON is given — the paired ratio.

Multi-window mode (round-11 protocol): a single window's ratio chases VM
load — identical SQL swung 70→347 s across round-9/10 windows. This mode
runs N full Spark-then-DuckDB paired windows back to back and reports the
MEDIAN ratio plus each window's raw numbers, so round-over-round trend
claims rest on a load-robust statistic:

  python3 tools/paired_bench.py <sfDir> <oracleSqlJson> --windows 3
"""
import sys, os, json, time, subprocess, statistics
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark_bench(spark_json):
    """Parse graft.Bench's one-line JSON. Validates BEFORE the DuckDB pass
    so a malformed file fails in milliseconds, not after 25 minutes of
    oracle timing; tolerates trailing log text and derives n_queries
    (Bench's line carries value/queries but no count field)."""
    raw = open(spark_json).read()
    brace = raw.find("{")
    if brace < 0:
        sys.exit(f"paired_bench: {spark_json} contains no JSON object")
    spark, _ = json.JSONDecoder().raw_decode(raw[brace:])
    for key in ("value", "queries"):
        if key not in spark:
            sys.exit(f"paired_bench: {spark_json} lacks key '{key}' — "
                     "pass the one-line JSON graft.Bench prints")
    spark.setdefault("n_queries", len(spark["queries"]))
    return spark


def main(sf_dir, oracle_path, spark_json=None):
    spark = (load_spark_bench(spark_json)
             if spark_json and os.path.exists(spark_json) else None)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    times = {}
    errors = 0
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(2):  # min-of-2: absorbs one scheduler hiccup per query
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                errors += 1
                print(f"[paired] {name} oracle error: {e}", file=sys.stderr)
                best = None
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    out = {"engine": "duckdb", "sf": sf_dir, "total_sec": total,
           "n_queries": len(times), "errors": errors, "queries": times}
    if spark is not None:
        out["spark_total_sec"] = spark["value"]
        out["spark_n_queries"] = spark["n_queries"]
        # ratio over the queries BOTH engines ran, so registry growth or a
        # sketch-only query can't skew the comparison
        if spark.get("omitted_fastest", 0) > 0:
            # Bench's stdout line drops its fastest queries to fit the size
            # budget — the shared set is then biased toward Spark's SLOWEST
            # queries, making the ratio conservative (flag it, don't hide it)
            out_note = (f"spark breakdown omits its {spark['omitted_fastest']} "
                        "fastest queries; paired ratio covers the slow subset only")
            out["note"] = out_note
            print(f"[paired] WARNING: {out_note}", file=sys.stderr)
        shared = set(times) & set(spark.get("queries", {}))
        st = sum(spark["queries"][q] for q in shared)
        dt = sum(times[q] for q in shared)
        out["paired_shared_queries"] = len(shared)
        out["paired_ratio_spark_over_duck"] = round(st / dt, 3) if dt else None
    print(json.dumps(out))

if __name__ == "__main__":
    if not 3 <= len(sys.argv) <= 4:
        sys.exit("usage: python3 tools/paired_bench.py <sfDir> <oracleSqlJson> [sparkBenchJson]")
    if not os.path.isdir(sys.argv[1]):
        sys.exit(f"paired_bench: sfDir {sys.argv[1]} is not a directory")
    if not os.path.exists(sys.argv[2]):
        sys.exit(f"paired_bench: oracle json {sys.argv[2]} not found")
    main(*sys.argv[1:])
