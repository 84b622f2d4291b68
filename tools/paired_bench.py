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


def duckdb_suite(sf_dir, oracle):
    """One DuckDB pass over the oracle suite: per-query min-of-2 seconds."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = {}
    errors = 0
    for name, sql in sorted(oracle.items()):
        best = None
        for rep in range(2):  # min-of-2: absorbs one scheduler hiccup per query
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
            # a scheduler hiccup is a sub-second effect: repeating a
            # 60 s+ query to absorb one is all cost and no signal (the
            # iterated-Lloyd PQ oracle runs 450 s at sf0.1 — r11)
            if dt >= 60:
                break
        if best is not None:
            times[name] = round(best, 3)
    con.close()
    return times, errors


def run_windows(sf_dir, oracle_path, n_windows):
    """Round-11 protocol: N back-to-back paired windows (Spark Bench via
    sbt, then immediately the DuckDB suite), reporting the MEDIAN paired
    ratio plus every window's raw numbers."""
    oracle = json.load(open(oracle_path))
    windows = []
    for w in range(n_windows):
        print(f"[paired] window {w + 1}/{n_windows}: spark bench...",
              file=sys.stderr)
        bench_out = f"/tmp/paired_bench_w{w}.json"
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        detail = os.path.join(repo, "BENCH_DETAIL.json")
        t_before = os.path.getmtime(detail) if os.path.exists(detail) else 0
        r = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            capture_output=True, text=True, env=env, cwd=repo)
        # a nonzero sbt exit with a FRESH, parseable BENCH_DETAIL is a
        # post-measurement JVM death (e.g. an async executor-thread error
        # after main returned) — warn and keep the window rather than
        # discarding 9 minutes of paired measurement
        fresh = os.path.exists(detail) and os.path.getmtime(detail) > t_before
        if r.returncode != 0 and not fresh:
            sys.exit(f"paired_bench: sbt bench failed in window {w + 1}:\n"
                     + r.stdout[-2000:] + r.stderr[-2000:])
        if r.returncode != 0:
            print(f"[paired] WARNING: sbt exited {r.returncode} in window "
                  f"{w + 1} but BENCH_DETAIL.json is fresh — keeping it",
                  file=sys.stderr)
        # Bench writes the untruncated line to BENCH_DETAIL.json
        with open(bench_out, "w") as f:
            f.write(open(detail).read())
        spark = load_spark_bench(bench_out)
        print(f"[paired] window {w + 1}/{n_windows}: duckdb suite...",
              file=sys.stderr)
        times, errors = duckdb_suite(sf_dir, oracle)
        shared = set(times) & set(spark.get("queries", {}))
        st = sum(spark["queries"][q] for q in shared)
        dt = sum(times[q] for q in shared)
        windows.append({
            "spark_total_sec": round(st, 3), "duck_total_sec": round(dt, 3),
            "duck_errors": errors, "paired_shared_queries": len(shared),
            "ratio_spark_over_duck": round(st / dt, 3) if dt else None,
            "duck_queries": times, "spark_queries":
                {q: spark["queries"][q] for q in shared}})
    ratios = [w["ratio_spark_over_duck"] for w in windows
              if w["ratio_spark_over_duck"] is not None]
    out = {"engine": "paired-windows", "sf": sf_dir, "n_windows": n_windows,
           "median_ratio_spark_over_duck":
               round(statistics.median(ratios), 3) if ratios else None,
           "ratios": ratios, "windows": windows}
    print(json.dumps(out))


def main(sf_dir, oracle_path, spark_json=None):
    spark = (load_spark_bench(spark_json)
             if spark_json and os.path.exists(spark_json) else None)
    oracle = json.load(open(oracle_path))
    times, errors = duckdb_suite(sf_dir, oracle)
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
        sys.exit("usage: python3 tools/paired_bench.py <sfDir> <oracleSqlJson> "
                 "[sparkBenchJson | --windows N]")
    if not os.path.isdir(sys.argv[1]):
        sys.exit(f"paired_bench: sfDir {sys.argv[1]} is not a directory")
    if not os.path.exists(sys.argv[2]):
        sys.exit(f"paired_bench: oracle json {sys.argv[2]} not found")
    if len(sys.argv) == 4 and sys.argv[3].startswith("--windows"):
        arg = sys.argv[3].split("=", 1)
        n = int(arg[1]) if len(arg) == 2 else 3
        run_windows(sys.argv[1], sys.argv[2], n)
    else:
        main(*sys.argv[1:])
