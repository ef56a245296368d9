"""Interleaved single-session A/B: runtime bloom-filter join pruning
(semi-join reduction) at sf10.

Spark injects a bloom filter built from the selective (creation) side
of a shuffle join into the big (application) side's scan, pruning rows
BEFORE the shuffle — exactly the lever for the q10/q21 family where the
fact side shuffles millions of rows that the join then discards. The
feature is ON by default (spark.sql.optimizer.runtime.bloomFilter.
enabled) but dormant below a 10 GB application-side scan, so local
fixtures never see it; arm B lowers the application-side threshold to
64 MB (and raises the creation-side cap to 100 MB) so sf10 exercises
the same plan a 100 TB cluster run would get by default.

Injection is also gated by maxNumItems (4M) on the creation side:
q3's half-of-orders filter exceeds it, q10's one-quarter window and
q21's F-status orders fit. The probe column reports whether the bloom
actually injected under arm B, so timing deltas attribute honestly.

    python3 scripts/ab_bloom.py [sf_dir]
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
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_ship_mode_delay",
    "tpch_q18_large_volume_customers",
    "tpch_q21_suppliers_kept_waiting",
]

APP_KEY = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
CRE_KEY = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
CONFIGS = {
    "off": {APP_KEY: "10g", CRE_KEY: "10m"},   # Spark defaults: dormant here
    "on": {APP_KEY: "64m", CRE_KEY: "100m"},   # injects at sf10 scan sizes
}
REPS = 3


def main() -> None:
    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="ab_bloom")
    spark.sparkContext.setLogLevel("ERROR")
    reg = entry_mod.queries()

    def build(name: str, conf: dict):
        for k, v in conf.items():
            spark.conf.set(k, v)
        return reg[name](spark, SF_DIR)

    def run(name: str, conf: dict) -> float:
        df = build(name, conf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def injected(name: str) -> bool:
        df = build(name, CONFIGS["on"])
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return "might_contain" in plan

    rows = []
    for name in QUERIES:
        has_bloom = injected(name)
        run(name, CONFIGS["off"])  # warm cache + JIT
        samples: dict[str, list] = {c: [] for c in CONFIGS}
        for r in range(REPS):
            order = list(CONFIGS) if r % 2 == 0 else list(reversed(CONFIGS))
            for cname in order:  # ABBA interleave
                samples[cname].append(run(name, CONFIGS[cname]))
        best = {c: round(min(samples[c]), 3) for c in CONFIGS}
        rows.append((name, has_bloom, best))
        print(
            f"{name:36s} bloom={str(has_bloom):5s} "
            + " ".join(f"{c}={best[c]:6.2f}" for c in CONFIGS),
            flush=True,
        )

    print(f"\n{'query':36s} {'bloom':>5s} " + " ".join(f"{c:>8s}" for c in CONFIGS))
    tot = {c: 0.0 for c in CONFIGS}
    for name, has_bloom, best in rows:
        print(
            f"{name:36s} {str(has_bloom):>5s} "
            + " ".join(f"{best[c]:8.2f}" for c in CONFIGS)
        )
        for c in CONFIGS:
            tot[c] += best[c]
    print(f"{'TOTAL':36s} {'':5s} " + " ".join(f"{tot[c]:8.2f}" for c in CONFIGS))
    spark.stop()


if __name__ == "__main__":
    main()
