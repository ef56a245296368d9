"""Interleaved single-session A/B of the two runtime-settable scan/join
knobs at sf10 — cross-sitting comparisons on this VM swing 3-4x on
unchanged code, so the two full-sitting runs that disagreed (41.8 s vs
94.1 s ledger totals) prove nothing about CONFIG. This script holds one
JVM, one page-cache state, and alternates configs per repetition:

  A: maxPartitionBytes=128m, autoBroadcast=10m   (Spark bare defaults)
  B: maxPartitionBytes=2m,   autoBroadcast=64m   (engine local default)
  C: maxPartitionBytes=32m,  autoBroadcast=64m   (candidate: coarse split)
  D: maxPartitionBytes=128m, autoBroadcast=64m   (candidate: default split)

Both knobs are runtime-settable; plans are rebuilt per run so each rep
re-derives scan splits and join strategy under the active config.

    python3 scripts/ab_sf10_conf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf10")

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
    "orders_top_customers",
    "orders_quality_checks",
    "orders_first_last_nth",
    "lineitem_grouping_sets",
    "customer_rfm_segments",
    "customer_abc_analysis",
]

# Round 2 of the A/B: broadcast threshold was a non-factor (AQE converts
# from runtime stats), the scan split was everything. Candidate E keeps
# maxPartitionBytes at Spark's 128m default and instead lowers
# openCostInBytes, so Spark's own bytesPerCore formula
# min(maxPartitionBytes, max(openCost, totalBytes/parallelism)) adapts
# the split to file size: sf10 lineitem (1.39 GB / 32 cores) -> ~43m
# splits; sf1 events (12 MB) -> 1m splits, recovering the parallelism
# that motivated the old 2m cap without its 700-task sf10 pathology.
CONFIGS = {
    "B": {"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
          "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
          "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
    "D": {"spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
          "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
          "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
    "E": {"spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
          "spark.sql.files.openCostInBytes": str(1024 * 1024),
          "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
}
REPS = 3


def main() -> None:
    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="ab_sf10_conf")
    spark.sparkContext.setLogLevel("ERROR")
    reg = entry_mod.queries()

    def run(name: str, conf: dict) -> float:
        for k, v in conf.items():
            spark.conf.set(k, v)
        df = reg[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    best: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for name in QUERIES:
        # warm page cache + JIT once per query under a neutral config
        run(name, CONFIGS["D"])
        samples: dict[str, list] = {c: [] for c in CONFIGS}
        for _ in range(REPS):
            for cname, conf in CONFIGS.items():  # interleave configs
                samples[cname].append(run(name, conf))
        for cname in CONFIGS:
            best[name][cname] = round(min(samples[cname]), 3)
        row = " ".join(f"{c}={best[name][c]:6.2f}" for c in CONFIGS)
        print(f"{name:36s} {row}", flush=True)

    print(f"\n{'query':36s} " + " ".join(f"{c:>8s}" for c in CONFIGS))
    tot = {c: 0.0 for c in CONFIGS}
    for name in QUERIES:
        print(f"{name:36s} " + " ".join(f"{best[name][c]:8.2f}" for c in CONFIGS))
        for c in CONFIGS:
            tot[c] += best[name][c]
    print(f"{'TOTAL':36s} " + " ".join(f"{tot[c]:8.2f}" for c in CONFIGS))
    spark.stop()


if __name__ == "__main__":
    main()
