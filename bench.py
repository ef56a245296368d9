"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": <sf>}

Each query is forced with the noop sink (computes every column, no write
cost) after a warm-up of the shared input scans, so the timing reflects
the query plan, not JVM startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_report_etl_pipeline_spark.queries import all_queries
from multi_report_etl_pipeline_spark.session import get_spark

# Headline set: the three reference reports plus the heaviest extension
# operators. Names must exist in the query registry.
HEADLINE = [
    "report_mortgage_portfolio",
    "report_restructuring_pipeline",
    "report_commercial_promises",
    "clean_contacts_primary",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "orders_top_customers",
    "lineitem_window_rank",
    "events_windowed_counts",
    "events_sessionization",
    "docs_exact_dedup",
    "docs_minhash_near_dup",
    "docs_text_quality",
    "docs_language_id",
    "emb_cosine_topk",
    "emb_lsh_ann",
    "emb_ivf_topk",
    "events_asof_last_click",
    "docs_dedup_groups",
]


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm the JVM, codegen, and file listing: run the headline set once
    # at the smallest scale factor so first-query timings measure the
    # plan, not one-time JIT/codegen compilation (~2s on the first heavy
    # query otherwise). Standard steady-state benching; not timed.
    from multi_report_etl_pipeline_spark.io import read_table

    read_table(spark, sf_dir, "lineitem").count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in names:
            try:
                _force(registry[name].fn(spark, warm_dir))
            except Exception:  # noqa: BLE001 - warmup must never fail the bench
                pass

    timings: dict[str, float] = {}

    # Materialize the staging layer once (bucketed by account_id — the
    # reference's CREATE TABLE + CREATE INDEX physical design,
    # 01_staging_layer.sql:13-14). The reports and clean views then read
    # pre-hashed input and skip their window/join exchanges. The build
    # cost is timed and counted in the total.
    from multi_report_etl_pipeline_spark.queries.reference import materialize_staging

    t0 = time.perf_counter()
    materialize_staging(spark, sf_dir)
    timings["staging_materialize"] = round(time.perf_counter() - t0, 3)

    for name in names:
        df = registry[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        _force(df)
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
