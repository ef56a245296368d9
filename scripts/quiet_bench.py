"""GC-stable ledger harness (VERDICT r7 item 1): every query gets its
OWN fresh JVM, so a long sitting's heap pollution / periodic full-GC
cannot bleed one query's cost into another. The r7 ledger showed 2-4x
within-session swings on unchanged code (q10 11.9 <-> 39.8 s; the
SMJ-vs-SHJ A/B arms 10.6 <-> 63.8 s) — those swings are a property of
one long-lived 48 GB single-JVM session, not of the plans. Isolating
each query in a subprocess JVM trades ~10 s of startup (untimed — the
child warms the query once before timing) for per-query heap hygiene.

Modes:

  run  — ledger: each query in its own child JVM (warm + min-of-N),
         DuckDB paired in the parent (in-process, stable), ratio table.
         A stability probe runs the FIRST query in two separate JVMs
         and reports the cross-JVM min ratio — the <20% acceptance the
         r7 verdict asked for.

  ab   — config A/B: each child JVM interleaves both arms (A B B A) on
         one query with the configs applied via runtime conf; several
         child JVMs give cross-JVM minima per arm. Because both arms
         share each JVM and alternate, slow-box episodes hit both.

Usage:
  python scripts/quiet_bench.py run --sf-dir testdata_sf100 \
      --queries tpch_q3_shipping_priority,tpch_q10_returned_items
  python scripts/quiet_bench.py ab --sf-dir testdata_sf100 \
      --queries tpch_q3_shipping_priority \
      --conf spark.sql.join.preferSortMergeJoin=false --jvms 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

RESULT_TAG = "QUIET_BENCH_RESULT "


def _child_cmd(extra: list[str]) -> list[str]:
    return [sys.executable, os.path.abspath(__file__), *extra]


def _run_child(args: list[str], timeout: int = 1800) -> dict:
    proc = subprocess.run(
        _child_cmd(args),
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO_ROOT,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(RESULT_TAG):
            return json.loads(line[len(RESULT_TAG):])
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
    raise RuntimeError(f"child produced no result: {args}")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def child_run(sf_dir: str, query: str, reps: int) -> None:
    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"quiet:{query}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[query]
    _force(fn(spark, sf_dir))  # warm: page cache, codegen, AQE stats
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        samples.append(round(time.perf_counter() - t0, 3))
    print(RESULT_TAG + json.dumps({"query": query, "samples": samples}))
    spark.stop()


def child_ab(sf_dir: str, query: str, confs: dict[str, str], reps: int) -> None:
    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"quiet-ab:{query}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[query]
    baseline = {k: spark.conf.get(k, None) for k in confs}

    def set_arm(arm: str) -> None:
        for k, v in confs.items():
            if arm == "B":
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    def one(arm: str) -> float:
        set_arm(arm)
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        return round(time.perf_counter() - t0, 3)

    for arm in ("A", "B"):  # warm both arms' plans and the page cache
        one(arm)
    out: dict[str, list[float]] = {"A": [], "B": []}
    # A B B A per rep-pair: order effects cancel within the JVM
    pattern = ("A", "B", "B", "A") * ((reps + 1) // 2)
    for arm in pattern[: 2 * reps]:
        out[arm].append(one(arm))
    print(RESULT_TAG + json.dumps({"query": query, "arms": out}))
    spark.stop()


def parent_run(args) -> None:
    queries = args.queries.split(",")
    reps = args.reps

    # stability probe: same query, two fresh JVMs — the acceptance
    # metric for this harness (min-vs-min across JVMs < 20%)
    probe = queries[0]
    p1 = min(_run_child(["--child-run", args.sf_dir, probe, str(reps)])["samples"])
    p2 = min(_run_child(["--child-run", args.sf_dir, probe, str(reps)])["samples"])
    ratio = max(p1, p2) / min(p1, p2) if min(p1, p2) else float("inf")
    print(f"stability probe {probe}: {p1:.2f} vs {p2:.2f} s "
          f"(cross-JVM ratio {ratio:.2f}) "
          f"{'OK' if ratio < 1.2 else 'UNSTABLE SITTING'}", flush=True)

    spark_t: dict[str, float] = {probe: min(p1, p2)}
    spark_samples: dict[str, list[float]] = {probe: [p1, p2]}
    for name in queries[1:]:  # probe == queries[0], already measured twice
        res = _run_child(["--child-run", args.sf_dir, name, str(reps)])
        spark_t[name] = min(res["samples"])
        spark_samples[name] = res["samples"]
        print(f"spark  {name}: {spark_t[name]:.2f} s  {res['samples']}",
              flush=True)

    duck_t: dict[str, float] = {}
    if not args.no_duckdb:
        import duckdb

        import __spark_entry__ as entry_mod

        osql = entry_mod.oracle_sql()
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
            p = os.path.join(args.sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for name in queries:
            if name not in osql:
                continue
            sql = osql[name]
            con.execute(sql).fetchall()
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            duck_t[name] = round(statistics.median(samples), 3)
            print(f"duckdb {name}: {duck_t[name]:.2f} s", flush=True)

    print(json.dumps({"metric": "quiet_ledger_sec",
                      "value": round(sum(spark_t.values()), 3),
                      "queries": spark_t, "samples": spark_samples,
                      "duckdb": duck_t, "sf_dir": args.sf_dir,
                      "probe_ratio": round(ratio, 3)}))
    if duck_t:
        print(f"\n{'query':42s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
        for name in queries:
            if name in duck_t:
                r = spark_t[name] / duck_t[name]
                print(f"{name:42s} {spark_t[name]:8.2f} "
                      f"{duck_t[name]:8.2f} {r:7.2f}")


def parent_ab(args) -> None:
    confs = dict(kv.split("=", 1) for kv in args.conf)
    for query in args.queries.split(","):
        mins: dict[str, list[float]] = {"A": [], "B": []}
        for j in range(args.jvms):
            res = _run_child(
                ["--child-ab", args.sf_dir, query, json.dumps(confs),
                 str(args.reps)]
            )
            for arm in ("A", "B"):
                mins[arm].append(min(res["arms"][arm]))
            print(f"jvm{j} {query}: A={res['arms']['A']} "
                  f"B={res['arms']['B']}", flush=True)
        a, b = min(mins["A"]), min(mins["B"])
        print(json.dumps({"metric": "quiet_ab", "query": query,
                          "conf": confs, "A_min": a, "B_min": b,
                          "A_jvm_mins": mins["A"], "B_jvm_mins": mins["B"],
                          "speedup_B_over_A": round(a / b, 3) if b else None}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child-run":
        child_run(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--child-ab":
        child_ab(sys.argv[2], sys.argv[3], json.loads(sys.argv[4]),
                 int(sys.argv[5]))
        return
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    run_p = sub.add_parser("run")
    run_p.add_argument("--sf-dir", required=True)
    run_p.add_argument("--queries", required=True)
    run_p.add_argument("--reps", type=int, default=3)
    run_p.add_argument("--no-duckdb", action="store_true")
    ab_p = sub.add_parser("ab")
    ab_p.add_argument("--sf-dir", required=True)
    ab_p.add_argument("--queries", required=True,
                      help="comma-separated; one A/B per query")
    ab_p.add_argument("--conf", action="append", required=True,
                      help="key=value applied in arm B (repeatable)")
    ab_p.add_argument("--jvms", type=int, default=3)
    ab_p.add_argument("--reps", type=int, default=3,
                      help="per-arm timed runs per JVM")
    args = ap.parse_args()
    args.sf_dir = os.path.abspath(args.sf_dir)
    if args.mode == "run":
        parent_run(args)
    else:
        parent_ab(args)


if __name__ == "__main__":
    main()
