"""The sf100 sitting: the join-heavy, data-proportional slice of the
ledger at ~16 GB of TPC-H tables (600M lineitem rows) — the scale
where NEITHER engine is floor-bound and shuffle strategy, not
scheduler intercept, decides the ratio.

Generate the fixture first (second-level scale-up, offsets x100 so
replica key spaces stay disjoint from sf10's own):

    python scripts/make_scale.py --src /root/repo/testdata_sf10 \
        --dst /root/repo/testdata_sf100 --n 10 --key-scale 100 \
        --tables region,nation,customer,supplier,part,orders,lineitem

Then:

    python scripts/bench_sf100.py [sf_dir]

Spark: min-of-3 noop sinks after one warm run, one session, local[32].
DuckDB: median-of-3 fetchall after one warm run, 32 threads. One
sitting — cross-sitting numbers on this VM swing 2-3x.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO_ROOT, "testdata_sf100"
)

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

# Only queries whose sf10 cost was data-proportional (not scheduler
# floor) and whose inputs are the TPC-H tables.
LEDGER = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
    "tpch_q21_suppliers_kept_waiting",
    "orders_top_customers",
    "lineitem_window_rank",
    "lineitem_grouping_sets",
    "customer_rfm_segments",
    "customer_abc_analysis",
    # round-7 partsupp batch at the 600M-row scale
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q20_potential_part_promotion",
]


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    reg, osql = entry_mod.queries(), entry_mod.oracle_sql()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="bench_sf100")
    spark.sparkContext.setLogLevel("ERROR")

    spark_t: dict[str, float] = {}
    for name in LEDGER:
        fn = reg[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark_t[name] = round(min(samples), 3)
        print(f"spark  {name}: {spark_t[name]:.2f} s", flush=True)
    spark.stop()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TPCH_TABLES:
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

    print(json.dumps({"metric": "spark_sf100_ledger_sec",
                      "value": round(sum(spark_t.values()), 3),
                      "unit": "sec", "queries": spark_t, "sf": 100.0}))
    print(json.dumps({"metric": "duckdb_sf100_ledger_sec",
                      "value": round(sum(duck_t.values()), 3),
                      "unit": "sec", "queries": duck_t, "sf": 100.0}))
    print(f"\n{'query':42s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name in LEDGER:
        r = spark_t[name] / duck_t[name] if duck_t[name] else float("inf")
        print(f"{name:42s} {spark_t[name]:8.2f} {duck_t[name]:8.2f} {r:7.2f}")
    tot_r = sum(spark_t.values()) / sum(duck_t.values())
    print(f"{'TOTAL':42s} {sum(spark_t.values()):8.2f} "
          f"{sum(duck_t.values()):8.2f} {tot_r:7.2f}")


if __name__ == "__main__":
    main()
