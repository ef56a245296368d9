"""The sf10 sitting (round-5 verdict item #5): run the strict-ledger
"floor-bound" queries — every query the >2x-at-sf1 reading flags —
against BOTH engines at sf10 (scripts/make_scale.py --n 100), so the
intercept argument ("Spark's fixed ~0.2-0.3 s scheduler/exchange floor
plus DuckDB's cache-resident in-process latency dominate sub-2-s
denominators; the ratio collapses once data outgrows the cache")
becomes a measurement instead of an extrapolation.

Spark: min-of-3 noop count() sinks after one warm run, one session.
DuckDB: median-of-3 fetchall after one warm run, 32 threads.
Prints one JSON line per engine + a ratio table.

    python scripts/bench_sf10.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf10")

# The 23 queries in VERDICT r5's strict >2x ledger, by registry name.
LEDGER = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
    "orders_top_customers",
    "orders_quality_checks",
    "orders_first_last_nth",
    "lineitem_window_rank",
    "lineitem_hll_distinct",
    "lineitem_regression_stats",
    "lineitem_grouping_sets",
    "events_windowed_counts",
    "events_gap_filled_hourly",
    "events_binned_percentiles",
    "events_transition_matrix",
    "events_ewma_anomaly",
    "events_hourly_top_users",
    "events_hourly_unique_users",
    "events_session_paths",
    "events_daily_type_unpivot",
    "customer_rfm_segments",
    "customer_abc_analysis",
]


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.io import TABLES
    from multi_report_etl_pipeline_spark.session import get_spark

    reg = entry_mod.queries()
    osql = entry_mod.oracle_sql()

    # The engine's own session factory — the first sf10 sitting built a
    # bare session here and so measured Spark's DEFAULT 10 MB broadcast
    # threshold: at sf10 the 14 MB customer build side fell back to full
    # shuffle joins in q3/q10/q5, which is exactly what get_spark's 64 MB
    # threshold exists to prevent. Benchmarks must run the shipped config.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="bench_sf10")
    spark.sparkContext.setLogLevel("ERROR")

    spark_t: dict[str, float] = {}
    for name in LEDGER:
        fn = reg[name]
        fn(spark, SF_DIR).count()  # warm (JIT, code cache, page cache)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        spark_t[name] = round(min(samples), 3)
        print(f"spark  {name}: {spark_t[name]:.2f} s", flush=True)
    spark.stop()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    duck_t: dict[str, float] = {}
    for name in LEDGER:
        sql = osql[name]
        con.execute(sql).fetchall()  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        duck_t[name] = round(statistics.median(samples), 3)
        print(f"duckdb {name}: {duck_t[name]:.2f} s", flush=True)

    print(json.dumps({"metric": "spark_sf10_ledger_sec",
                      "value": round(sum(spark_t.values()), 3),
                      "unit": "sec", "queries": spark_t, "sf": 10.0}))
    print(json.dumps({"metric": "duckdb_sf10_ledger_sec",
                      "value": round(sum(duck_t.values()), 3),
                      "unit": "sec", "queries": duck_t, "sf": 10.0}))
    print(f"\n{'query':42s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name in LEDGER:
        r = spark_t[name] / duck_t[name] if duck_t[name] else float("inf")
        print(f"{name:42s} {spark_t[name]:8.2f} {duck_t[name]:8.2f} {r:7.2f}")
    tot_r = sum(spark_t.values()) / sum(duck_t.values())
    print(f"{'TOTAL':42s} {sum(spark_t.values()):8.2f} "
          f"{sum(duck_t.values()):8.2f} {tot_r:7.2f}")


if __name__ == "__main__":
    main()
