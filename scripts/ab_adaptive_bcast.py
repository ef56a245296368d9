"""A/B: spark.sql.adaptive.autoBroadcastJoinThreshold (the RUNTIME
broadcast-conversion bar) at sf10. Round-6 kept the STATIC threshold at
Spark's 10m default (static broadcasts are planned from FILE size and
regressed q7/rfm at 64m), but the adaptive threshold falls back to the
static one when unset — so AQE never converts a shuffle join whose
build side lands at 20-90 MB of ACTUAL runtime bytes (q3's
BUILDING-pruned orders, q10's quarter-filtered join sides). Raising
ONLY the adaptive bar keeps file-size planning at 10m while letting
runtime sizes trigger conversion — exactly the "AQE converts from
actual sizes" posture the session docstring claims.

Interleaved ABBA, min-of-3 per arm, one session, noop count sinks.

    python scripts/ab_adaptive_bcast.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf10")

QUERIES = [
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
    "tpch_q7_volume_shipping",
    "customer_rfm_segments",
    "tpch_q9_product_type_profit",
]
ARMS = {"default(=static 10m)": "10m", "adaptive 64m": "64m", "adaptive 128m": "128m"}
KEY = "spark.sql.adaptive.autoBroadcastJoinThreshold"


def main() -> None:
    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="ab_adaptive_bcast")
    spark.sparkContext.setLogLevel("ERROR")
    reg = entry_mod.queries()

    best: dict[tuple[str, str], float] = {}
    for name in QUERIES:
        fn = reg[name]
        fn(spark, SF_DIR).count()  # warm
        for rep in range(3):
            arm_order = list(ARMS) if rep % 2 == 0 else list(reversed(list(ARMS)))
            for arm in arm_order:
                spark.conf.set(KEY, ARMS[arm])
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                k = (name, arm)
                best[k] = min(best.get(k, 1e9), dt)
        spark.conf.unset(KEY)
        row = "  ".join(f"{arm}={best[(name, arm)]:.2f}s" for arm in ARMS)
        print(f"{name}: {row}", flush=True)
    print("---- totals (min-of-3 per query) ----")
    for arm in ARMS:
        tot = sum(best[(n, arm)] for n in QUERIES)
        print(f"{arm}: {tot:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
